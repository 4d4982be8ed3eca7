#!/usr/bin/env python3
"""Benchmark: acoustic frames/sec/chip on the flagship WSJ BLSTM-CTC model.

Runs the full jitted training step (forward + CTC + backward + adam) and
the inference forward pass on synthetic WSJ-shaped batches, on whatever
accelerator jax provides (the driver runs this on one real TPU chip).

Prints ONE JSON line:
  {"metric": "train_frames_per_sec_per_chip", "value": N,
   "unit": "frames/s", "vs_baseline": R, ...}

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md — accuracy only).  The north star is ≥5× a V100 TF1.8
baseline; we use 15,000 acoustic frames/s as the assumed V100 figure for
this model class (4×BLSTM-320, cuDNN-era TF; see BASELINE.md), so
vs_baseline = value / 15000.
"""

import json
import time

import numpy as np

ASSUMED_V100_FRAMES_PER_SEC = 15000.0


def main():
    import jax

    from __graft_entry__ import FLAGSHIP_CONFIG, _example_batch
    from lstm_ctc_tpu.models import apply_model, init_model
    from lstm_ctc_tpu.train.graph import make_train_step

    config = dict(FLAGSHIP_CONFIG, dropout_rate=1.0)
    batch_size, time_steps = 32, 384  # post-subsample WSJ-ish bucket
    batch = _example_batch(config, batch=batch_size, time_steps=time_steps)
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    params, net_state = init_model(jax.random.PRNGKey(0), config)
    init_opt, train_step = make_train_step(
        config, learn_rate=1e-3, optimizer="adam")
    opt_state = init_opt(params)
    rng = jax.random.PRNGKey(1)

    # --- train step ---
    params, opt_state, net_state, metrics = train_step(
        params, opt_state, net_state, rng, batch)  # compile
    float(metrics["eval_loss"])  # full sync — block_until_ready alone does
    # not reliably synchronize through remote-TPU transports
    steps = 10
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, net_state, metrics = train_step(
            params, opt_state, net_state, rng, batch)
    float(metrics["eval_loss"])
    train_dt = time.perf_counter() - t0
    frames = batch_size * time_steps * steps
    train_fps = frames / train_dt

    # --- forward (inference) ---
    @jax.jit
    def forward(params, nnet_input, sequence_length):
        logits, _, _, _ = apply_model(
            params, net_state, nnet_input, sequence_length, config,
            train=False)
        return logits

    out = forward(params, batch["nnet_input"], batch["sequence_length"])
    float(out.sum())
    t0 = time.perf_counter()
    for _ in range(steps):
        out = forward(params, batch["nnet_input"], batch["sequence_length"])
    float(out.sum())
    fwd_dt = time.perf_counter() - t0
    fwd_fps = frames / fwd_dt

    result = {
        "metric": "train_frames_per_sec_per_chip",
        "value": round(train_fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(train_fps / ASSUMED_V100_FRAMES_PER_SEC, 3),
        "baseline_note": "vs_baseline divides by an ASSUMED 15k frames/s"
                         " V100/TF1.8 figure; the reference publishes"
                         " accuracy only (BASELINE.md)",
        "forward_frames_per_sec": round(fwd_fps, 1),
        "batch": batch_size,
        "time_steps": time_steps,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
