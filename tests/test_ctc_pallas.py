"""Pallas CTC kernels (interpret mode on CPU) vs the lax.scan path."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lstm_ctc_tpu.ops import ctc


def make_case(seed, B=3, T=70, V=6, U=5):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, T, V).astype(np.float32)
    seq_len = rng.randint(T // 2, T + 1, B).astype(np.int32)
    seq_len[0] = T
    labels = np.full((B, U), -1, np.int32)
    label_len = np.zeros((B,), np.int32)
    for b in range(B):
        u = rng.randint(1, U + 1)
        labels[b, :u] = rng.randint(0, V - 1, u)
        label_len[b] = u
    labels[2, :] = -1     # empty-label row
    label_len[2] = 0
    seq_len[1] = 0        # dummy padding row (zero-length sequence)
    return (jnp.asarray(logits), jnp.asarray(seq_len), jnp.asarray(labels),
            jnp.asarray(label_len))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_matches_scan_values_and_grads(seed, monkeypatch):
    args = make_case(seed)

    monkeypatch.setenv("LSTM_CTC_TPU_CTC_IMPL", "scan")
    ref_loss = np.asarray(ctc.ctc_loss(*args))
    ref_grad = np.asarray(jax.grad(
        lambda lg: jnp.sum(ctc.ctc_loss(lg, *args[1:])))(args[0]))

    monkeypatch.setenv("LSTM_CTC_TPU_CTC_IMPL", "pallas")
    got_loss = np.asarray(ctc.ctc_loss(*args))
    got_grad = np.asarray(jax.grad(
        lambda lg: jnp.sum(ctc.ctc_loss(lg, *args[1:])))(args[0]))

    np.testing.assert_allclose(got_loss, ref_loss, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_grad, ref_grad, atol=1e-5)


def test_pallas_batch_tiling(monkeypatch):
    """Batch-tiled kernels (grid over B) match the scan path, including a
    batch size that is not a multiple of the batch block."""
    from lstm_ctc_tpu.ops import ctc_pallas
    args = make_case(7, B=11, T=40, V=6, U=5)
    monkeypatch.setenv("LSTM_CTC_TPU_CTC_IMPL", "scan")
    ref_loss = np.asarray(ctc.ctc_loss(*args))
    ref_grad = np.asarray(jax.grad(
        lambda lg: jnp.sum(ctc.ctc_loss(lg, *args[1:])))(args[0]))

    # force batch tiling with a 4-row block (11 → pads to 12, 3 b-blocks)
    monkeypatch.setenv("LSTM_CTC_TPU_CTC_IMPL", "pallas")
    monkeypatch.setattr(ctc, "_pallas_blocks",
                        lambda batch, ext_len, **kw: (4, 16))
    got_loss = np.asarray(ctc.ctc_loss(*args))
    got_grad = np.asarray(jax.grad(
        lambda lg: jnp.sum(ctc.ctc_loss(lg, *args[1:])))(args[0]))

    np.testing.assert_allclose(got_loss, ref_loss, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_grad, ref_grad, atol=1e-5)


def test_pallas_blocks_large_batch():
    """B=128 WSJ-shaped lattices must stay on the Pallas path by tiling
    the batch instead of falling back to the scan (VERDICT r1 item 3)."""
    blocks = ctc._pallas_blocks(128, 2 * 120 + 1)
    assert blocks is not None
    batch_block, time_block = blocks
    assert batch_block >= 8 and time_block >= 8


def test_pallas_time_block_boundary(monkeypatch):
    """T not a multiple of the kernel's TIME_BLOCK pads correctly."""
    from lstm_ctc_tpu.ops.ctc_pallas import TIME_BLOCK
    args = make_case(5, T=TIME_BLOCK + 7)
    monkeypatch.setenv("LSTM_CTC_TPU_CTC_IMPL", "scan")
    ref = np.asarray(ctc.ctc_loss(*args))
    monkeypatch.setenv("LSTM_CTC_TPU_CTC_IMPL", "pallas")
    got = np.asarray(ctc.ctc_loss(*args))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
