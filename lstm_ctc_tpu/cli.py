"""Shared plumbing for the bin/ command-line tools."""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict

import jax
import numpy as np

# Respect JAX_PLATFORMS even when a site plugin force-registered another
# platform and overwrote the config (the env var is the user's word).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Persistent XLA compilation cache: the outer training loop launches one
# process per epoch (reference scripts/train.sh contract), so without this
# every epoch re-pays the full jit compile of the train/eval steps.
# The directory is partitioned by platform/plugin: sessions with a
# remote-compile TPU plugin active produce CPU AOT blobs targeting the
# *server's* machine features, which SIGILL if a pure-CPU run later loads
# them (the cache key does not cover host CPU features).
_cache_tag = os.environ.get("JAX_PLATFORMS") or "default"
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    # keep the plugin marker even when a platform is forced: the plugin
    # produces AOT blobs targeting the SERVER's machine features, which
    # must never share a directory with pure-host runs (SIGILL)
    _cache_tag += "-plugin"
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/lstm_ctc_tpu/jax-cache-"
                                      + _cache_tag.replace(",", "-"))))
if not os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"):
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from . import logging_util as log
from .data import BucketedBatcher, scan_label_lengths, scan_scp
from .models import init_model
from .parallel import get_mesh, shard_batch


def str2bool(v: str) -> bool:
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def log_invocation() -> None:
    log.info(" ".join(sys.argv))


def build_batcher(records_scp: str, config: Dict, batch_size: int,
                  need_labels: bool = True,
                  pack_factor: int = 1) -> BucketedBatcher:
    metas = scan_scp(records_scp)
    label_lengths = None
    if need_labels and metas and metas[0].has_label:
        label_lengths = scan_label_lengths(metas)
    # Packed batches lay slots out rank-major (longest-first per row);
    # the batcher asserts that invariant at assembly time.  The contract
    # is DECLARED by the code that owns the config↔producer pairing
    # (bin/nnet-train.py, bin/nnet-train-loop.py set
    # config["packed_slots_rank_major"]=True next to their batcher) so
    # train/graph.compute_losses may use the row-batched sharded gather
    # — deliberately NOT declared here: this helper must not mutate a
    # shared config that may later also see packed batches from an
    # arbitrary-layout producer (which need the layout-agnostic flat
    # gather).  The opt-in tiered CTC gather is likewise resolved where
    # the gather is built (train/graph.ctc_tiered_enabled), not here.
    return BucketedBatcher(
        metas,
        batch_size=batch_size,
        left_context=config.get("left_context", 0) or 0,
        right_context=config.get("right_context", 0) or 0,
        subsample=config.get("subsample", 0) or 0,
        label_lengths=label_lengths,
        pack_factor=pack_factor,
    )


def make_shard_fn():
    """Returns (shard_fn, mesh).  The shard/replicate decision is made
    per array in parallel.shard_batch (batches shard across the data
    mesh when the leading axis divides it; otherwise replicated)."""
    mesh = get_mesh()

    def shard_fn(batch):
        arrays = {
            "nnet_input": batch.nnet_input,
            "sequence_length": batch.sequence_length,
            "nnet_target": batch.nnet_target,
            "target_length": batch.target_length,
        }
        if getattr(batch, "reset_mask", None) is not None:
            arrays["reset_mask"] = batch.reset_mask
            arrays["utt_time_index"] = batch.utt_time_index
            arrays["utt_sequence_length"] = batch.utt_sequence_length
        return shard_batch(mesh, arrays)

    return shard_fn, mesh


def init_from_config(config: Dict):
    """Deterministic model init seeded from the config's ``seed`` key."""
    seed = int(config.get("seed", 777) or 777)
    return init_model(jax.random.PRNGKey(seed), config)


def check_objective_and_type(args, config: Dict) -> None:
    if args.objective != "ctc":
        log.fatal("unsupported objective: %s" % args.objective)
        sys.exit(1)
    nnet_type = config.get("nnet_type")
    if nnet_type not in ("blstm", "cudnnlstm", "lstm"):
        log.fatal("unsupported nnet_type: %s" % nnet_type)
        sys.exit(1)


# Error-message substrings that mark a *transient* accelerator-runtime
# failure (the axon remote-TPU tunnel surfaces chip contention and broken
# connections as opaque runtime errors).  Model-side failures (NaN loss,
# shape errors, OOM-on-HBM) never match these.
_TRANSIENT_BACKEND_MARKERS = (
    "FAILED_PRECONDITION",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "ABORTED",
    "remote_compile",
    "Connection reset",
    "Socket closed",
    "connection refused",
    "tpu_compile_helper",
)


def is_transient_backend_error(exc: BaseException) -> bool:
    msg = str(exc)
    if type(exc).__name__.endswith(("JaxRuntimeError",
                                    "XlaRuntimeError")):
        return any(m in msg for m in _TRANSIENT_BACKEND_MARKERS)
    # backend INITIALIZATION failures are raised by jax as plain
    # RuntimeError ("Unable to initialize backend 'axon': UNAVAILABLE
    # ..."), the exact signature of the remote service being down —
    # the outage mode retries exist for (observed 2026-08-17)
    if (isinstance(exc, RuntimeError)
            and "Unable to initialize backend" in msg):
        return any(m in msg for m in _TRANSIENT_BACKEND_MARKERS)
    return False


# Set once a CLI has emitted externally-visible output (a record written
# to a wspecifier — possibly a stdout/pipe already consumed downstream).
# run_with_backend_retry refuses to restart past this point: re-running
# main() would re-emit every record into the half-consumed stream,
# silently corrupting the archive while exiting 0.
_output_emitted = False


def note_output_emitted() -> None:
    """CLIs call this immediately before their first external write
    (streamed archive records).  Final-artifact writes that are atomic
    (``save_checkpoint``'s tmp+rename) need no fence — a retry before
    the rename leaves no partial artifact behind."""
    global _output_emitted
    _output_emitted = True


def run_with_backend_retry(fn, *, what: str = "job"):
    """Run ``fn()`` to completion, re-running it when the accelerator
    runtime fails transiently (chip contention / tunnel drops on the
    remote-TPU transport).

    The outer training scripts' NaN-retry (scripts/train_oplr.sh) only
    catches the in-band NaN contract; a backend crash otherwise kills
    the epoch and the whole run.  Each retry restarts ``fn`` from
    scratch.  That is only safe while the attempt has produced no
    externally-visible output: checkpoint saves are atomic (tmp+rename)
    and per-attempt metrics files are truncated on open, but the
    streaming CLIs (nnet-forward/nnet-decode) write archive records as
    they go — often into a stdout pipe a downstream consumer has
    already read.  Those CLIs mark the first record write via
    ``note_output_emitted``; once marked, a transient failure is
    re-raised instead of retried (the caller's job-level re-run,
    e.g. decode_ctc_lat.sh's per-job rerun, owns recovery there).
    Between attempts the jax backends are torn down
    (jax.extend.backend.clear_backends) — a FAILED_PRECONDITION
    frequently poisons the in-process runtime client, so an in-process
    retry off the old client can never recover (observed: chip
    contention wedged nnet-validate through two retries until the
    client was reset).  ``LSTM_CTC_TPU_BACKEND_RETRIES`` (default 3)
    bounds the retries; 0 disables.
    """
    import time

    global _output_emitted
    retries = int(os.environ.get("LSTM_CTC_TPU_BACKEND_RETRIES", "3"))
    attempt = 0
    while True:
        _output_emitted = False
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 - classified below
            if attempt >= retries or not is_transient_backend_error(exc):
                raise
            if _output_emitted:
                log.warning(
                    "transient backend error during %s AFTER output was "
                    "already streamed — a retry would re-emit records "
                    "into the consumed stream; failing hard instead."
                    % what)
                raise
            attempt += 1
            delay = 15.0 * attempt
            log.warning(
                "transient backend error during %s (attempt %d/%d, "
                "retrying in %.0fs): %s"
                % (what, attempt, retries, delay,
                   (str(exc).splitlines() or [""])[0][:300]))
            time.sleep(delay)
            # a FAILED_PRECONDITION often means the in-process runtime
            # client is poisoned (e.g. the chip was held by another
            # process); tear the backends down so the retry
            # re-initializes a fresh client instead of re-raising off
            # the dead one.  Compiled-computation caches tied to the old
            # client are re-built by the retry's fresh trace.
            try:
                import jax.extend.backend
                jax.extend.backend.clear_backends()
            except Exception as reset_exc:  # pragma: no cover
                log.warning(
                    "backend reset failed (continuing): %s"
                    % (str(reset_exc).splitlines() or [""])[0][:200])
