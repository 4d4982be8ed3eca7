"""High-rank mixture-of-softmaxes output head (the ICASSP'19 "MoE" model).

Mirrors reference nnet/moe.py:29-72: a softmax gate over ``num_experts``
(with dropout on the gate probabilities) mixes per-expert logit vectors
``moe_temperature * tanh(xW + b)`` (with dropout on the expert logits);
the mixed result is used directly as CTC "logits".

TPU mapping: the expert projection is a single ``[B·T, 2P] × [2P, E·V]``
matmul — the dominant FLOP consumer of the whole model — which XLA tiles
straight onto the MXU; the gate mix is a batched contraction fused around it.
"""

from __future__ import annotations

import math
import os
from typing import Dict

import jax
import jax.numpy as jnp

from .cells import dropout, truncated_normal


def _fused_moe_mode(mesh, n_rows: int, batch_rows=None):
    """Fused Pallas expert mix vs the plain XLA mix.

    Returns ``None`` (XLA — GSPMD partitions it automatically),
    ``"direct"`` (single-device fused kernel), or ``"sharded"`` (fused
    kernel per-shard under shard_map over ``mesh``).  Mirrors
    blstm._fused_lstm_mode: a raw pallas_call inside a GSPMD jit over a
    multi-device mesh would be all-gathered (XLA cannot partition custom
    calls), so on meshes the kernel must run under shard_map — and when
    devices are present but no mesh was provided, the XLA path is kept.
    Force with LSTM_CTC_TPU_MOE_IMPL=fused|xla."""
    impl = os.environ.get("LSTM_CTC_TPU_MOE_IMPL", "auto")
    if impl == "xla":
        return None
    if impl != "fused":
        try:
            # positive TPU check (this repo's remote TPU registers as
            # "axon"); other accelerators get the portable XLA path
            if jax.default_backend() not in ("tpu", "axon"):
                return None
        except RuntimeError:
            return None
    if mesh is not None and mesh.devices.size > 1:
        # Divisibility is judged on the BATCH axis when the caller
        # passes it (x is [B·T, H] flattened b-major): sharding the
        # flat rows evenly when B doesn't divide the mesh would split
        # mid-batch-row, forcing GSPMD to reshard the batch-sharded
        # activations with extra collectives every step — exactly the
        # case blstm._fused_lstm_mode / ctc._mesh_shards fall back for.
        if (batch_rows if batch_rows is not None else n_rows) \
                % mesh.devices.size != 0:
            return None   # indivisible batch → replicated; keep XLA
        if n_rows % mesh.devices.size != 0:
            return None   # flat rows must split evenly for shard_map
        return "sharded"
    if impl != "fused" and jax.device_count() > 1:
        # devices present but no mesh provided: a raw custom call under
        # GSPMD would be all-gathered; keep the XLA mix
        return None
    return "direct"


def init_moe(rng, output_dim: int, num_targets: int, num_experts: int) -> Dict:
    k_prior, k_expert = jax.random.split(rng)
    stddev = 1.0 / math.sqrt(float(output_dim))
    return {
        "w_prior": truncated_normal(k_prior, (output_dim, num_experts), stddev),
        "b_prior": jnp.zeros((num_experts,), jnp.float32),
        "w_expert": truncated_normal(
            k_expert, (output_dim, num_targets * num_experts), stddev),
        "b_expert": jnp.zeros((num_targets * num_experts,), jnp.float32),
    }


def apply_moe(params: Dict,
              x: jnp.ndarray,
              num_experts: int,
              moe_temperature: float,
              keep_prob: float = 1.0,
              dropout_rng=None,
              compute_dtype=None,
              mesh=None,
              batch_rows=None) -> jnp.ndarray:
    """x: [N, output_dim] → mixed logits [N, num_targets].

    ``batch_rows``: the BATCH-axis extent B when ``x`` is a b-major
    flattening of [B, T, H] — mesh divisibility is judged on it (see
    _fused_moe_mode); None falls back to judging the flat N.

    ``compute_dtype``: operand precision for the fused expert tile
    (None = backend default: bf16 on TPU, f32 on CPU — same resolution
    as blstm._compute_dtype).  ``mesh``: when training data-parallel
    over a multi-device mesh the fused kernel must run per-shard under
    shard_map (see _fused_moe_mode) — callers thread ``config["mesh"]``
    through."""
    from ..ops.moe_pallas import (fused_eligible, moe_mix_fused,
                                  moe_mix_sharded)

    gate_logits = x @ params["w_prior"] + params["b_prior"]      # [N, E]
    gate = jax.nn.softmax(gate_logits, axis=-1)
    use_dropout = keep_prob < 1.0 and dropout_rng is not None
    if use_dropout:
        k_gate, k_expert = jax.random.split(dropout_rng)
        gate = dropout(k_gate, gate, keep_prob)

    num_targets = params["w_expert"].shape[1] // num_experts
    mode = _fused_moe_mode(mesh, x.shape[0], batch_rows) \
        if fused_eligible(x.shape[1], num_targets) else None
    if mode is not None:
        # gate (softmax + its dropout, tiny) stays in XLA above; only the
        # [N, E·V] expert tile is fused.  Expert dropout inside the kernel
        # is hash-based (same keep-prob semantics, different stream).
        backend = jax.default_backend()
        seed = jax.random.randint(
            k_expert, (1,), -2 ** 31, 2 ** 31 - 1,
            dtype=jnp.int32) if use_dropout else None
        kwargs = dict(
            keep_prob=keep_prob if use_dropout else 1.0,
            seed=seed,
            compute_dtype=compute_dtype or (
                jnp.float32 if backend == "cpu" else jnp.bfloat16),
            interpret=backend == "cpu")
        if mode == "sharded":
            return moe_mix_sharded(
                mesh, x, params["w_expert"], params["b_expert"], gate,
                num_experts, moe_temperature, **kwargs)
        return moe_mix_fused(
            x, params["w_expert"], params["b_expert"], gate,
            num_experts, moe_temperature, **kwargs)

    expert = moe_temperature * jnp.tanh(
        x @ params["w_expert"] + params["b_expert"])             # [N, E·V]
    expert = expert.reshape(x.shape[0], num_experts, -1)         # [N, E, V]
    if use_dropout:
        expert = dropout(k_expert, expert, keep_prob)
    return jnp.einsum("ne,nev->nv", gate, expert)
