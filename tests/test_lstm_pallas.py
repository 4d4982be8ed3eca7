"""Fused Pallas BLSTM whole-sequence kernel vs the XLA dual scan.

Values AND gradients (inputs, recurrent/projection/peephole weights,
through the input-projection to wx/bias) must match the lax.scan
reference for masked variable-length batches.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lstm_ctc_tpu.models.cells import bilstm_dual_scan, init_lstm_cell
from lstm_ctc_tpu.ops.lstm_pallas import bilstm_dual_scan_fused

FORGET_BIAS = 5.0


def make_case(seed, batch=4, time_steps=37, dim=12, units=16, proj=8,
              peepholes=True):
    rng = np.random.RandomState(seed)
    fw = init_lstm_cell(jax.random.PRNGKey(seed), dim, units,
                        num_proj=proj, use_peepholes=peepholes)
    bw = init_lstm_cell(jax.random.PRNGKey(seed + 100), dim, units,
                        num_proj=proj, use_peepholes=peepholes)
    x = jnp.asarray(rng.randn(batch, time_steps, dim).astype(np.float32))
    seq_len = jnp.asarray(
        rng.randint(time_steps // 2, time_steps + 1, batch), jnp.int32)
    from lstm_ctc_tpu.models.cells import reverse_sequence
    x_rev = reverse_sequence(x, seq_len)
    return fw, bw, x, x_rev, seq_len


@pytest.mark.parametrize("seed,peep,proj", [(0, True, 8), (1, False, 8),
                                            (2, True, None)])
def test_fused_matches_scan_outputs(seed, peep, proj):
    fw, bw, x, x_rev, seq_len = make_case(seed, peepholes=peep, proj=proj)
    ref = bilstm_dual_scan(fw, bw, x, x_rev, seq_len, FORGET_BIAS)
    got = bilstm_dual_scan_fused(fw, bw, x, x_rev, seq_len, FORGET_BIAS,
                                 time_block=8, interpret=True)
    for g, r, name in [(got[0], ref[0], "fw_out"),
                       (got[1], ref[1], "bw_out"),
                       (got[2][0][0], ref[2][0][0], "fw_c"),
                       (got[2][0][1], ref[2][0][1], "fw_h"),
                       (got[2][1][0], ref[2][1][0], "bw_c"),
                       (got[2][1][1], ref[2][1][1], "bw_h")]:
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("store_dtype,rtol,atol_scale", [
    # f32 remat states: bit-level agreement with the scan autodiff
    ("float32", 2e-4, 2e-5),
    # bf16 remat states + dgates stream (the shipped default): the
    # recomputed gate activations carry bf16 rounding and the weight
    # grads sum T*B bf16 dgates (with cancellation), so agreement is
    # ~bf16-precision relative to each leaf's gradient SCALE — atol is
    # atol_scale * max|ref| per leaf
    ("bfloat16", 8e-2, 3e-3),
])
def test_fused_matches_scan_grads(store_dtype, rtol, atol_scale):
    fw, bw, x, x_rev, seq_len = make_case(3)

    def loss(fn, fw, bw, x):
        from lstm_ctc_tpu.models.cells import reverse_sequence
        x_rev = reverse_sequence(x, seq_len)
        fw_out, bw_out, (fs, bs) = fn(fw, bw, x, x_rev, seq_len,
                                      FORGET_BIAS)
        return (jnp.sum(jnp.sin(fw_out)) + jnp.sum(jnp.cos(bw_out))
                + jnp.sum(fs[0] * 0.1) + jnp.sum(bs[1] * 0.2))

    ref_grads = jax.grad(
        lambda fw, bw, x: loss(bilstm_dual_scan, fw, bw, x),
        argnums=(0, 1, 2))(fw, bw, x)
    got_grads = jax.grad(
        lambda fw, bw, x: loss(
            lambda *a, **k: bilstm_dual_scan_fused(
                *a, time_block=8, store_dtype=store_dtype,
                interpret=True, **k), fw, bw, x),
        argnums=(0, 1, 2))(fw, bw, x)

    flat_ref, tree_ref = jax.tree_util.tree_flatten_with_path(ref_grads)
    flat_got, _ = jax.tree_util.tree_flatten_with_path(got_grads)
    for (path, r), (_, g) in zip(flat_ref, flat_got):
        r = np.asarray(r)
        atol = atol_scale * max(np.max(np.abs(r)), 1.0)
        np.testing.assert_allclose(
            np.asarray(g), r, rtol=rtol, atol=atol, err_msg=str(path))


def test_fused_masking_zeroes_padding():
    fw, bw, x, x_rev, seq_len = make_case(4, batch=3, time_steps=20)
    seq_len = jnp.asarray([20, 11, 0], jnp.int32)
    from lstm_ctc_tpu.models.cells import reverse_sequence
    x_rev = reverse_sequence(x, seq_len)
    fw_out, bw_out, _ = bilstm_dual_scan_fused(
        fw, bw, x, x_rev, seq_len, FORGET_BIAS, time_block=8,
        interpret=True)
    assert np.all(np.asarray(fw_out)[1, 11:] == 0.0)
    assert np.all(np.asarray(fw_out)[2] == 0.0)
    assert np.all(np.asarray(bw_out)[1, 11:] == 0.0)


@pytest.mark.parametrize("peep,proj", [(True, 8), (False, None)])
def test_unidirectional_fused_matches_scan(peep, proj):
    from lstm_ctc_tpu.models.cells import lstm_scan
    from lstm_ctc_tpu.ops.lstm_pallas import lstm_scan_fused

    rng = np.random.RandomState(11)
    cell = init_lstm_cell(jax.random.PRNGKey(5), 12, 16, num_proj=proj,
                          use_peepholes=peep)
    x = jnp.asarray(rng.randn(6, 23, 12).astype(np.float32))
    seq_len = jnp.asarray([23, 20, 11, 1, 0, 17], jnp.int32)

    ref_out, (ref_c, ref_h) = lstm_scan(cell, x, seq_len, forget_bias=1.0)
    got_out, (got_c, got_h) = lstm_scan_fused(
        cell, x, seq_len, forget_bias=1.0, time_block=8,
        store_dtype="float32", interpret=True)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h),
                               rtol=1e-5, atol=1e-5)


def test_unidirectional_fused_grads():
    from lstm_ctc_tpu.models.cells import lstm_scan
    from lstm_ctc_tpu.ops.lstm_pallas import lstm_scan_fused

    rng = np.random.RandomState(12)
    cell = init_lstm_cell(jax.random.PRNGKey(6), 10, 16, num_proj=8,
                          use_peepholes=True)
    x = jnp.asarray(rng.randn(4, 19, 10).astype(np.float32))
    seq_len = jnp.asarray([19, 15, 8, 19], jnp.int32)

    def loss(fn, cell, x):
        out, (c, h) = fn(cell, x, seq_len, forget_bias=1.0)
        return (jnp.sum(jnp.sin(out)) + jnp.sum(c * 0.1)
                + jnp.sum(h * 0.2))

    ref = jax.grad(lambda c, x: loss(lstm_scan, c, x),
                   argnums=(0, 1))(cell, x)
    got = jax.grad(lambda c, x: loss(
        lambda *a, **k: lstm_scan_fused(
            *a, time_block=8, store_dtype="float32", interpret=True,
            **k), c, x), argnums=(0, 1))(cell, x)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(ref)
    flat_got, _ = jax.tree_util.tree_flatten_with_path(got)
    for (path, r), (_, g) in zip(flat_ref, flat_got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=str(path))


def test_fold_dx_matches_scan_grads(monkeypatch):
    """LSTM_CTC_TPU_LSTM_FOLD_DX=1 (input-side backward folded into the
    kernel: dxt emitted, wx/bias grads VMEM-accumulated) must match the
    scan autodiff — values and every gradient leaf including wx/bias."""
    monkeypatch.setenv("LSTM_CTC_TPU_LSTM_FOLD_DX", "1")
    # lane-aligned input dim so the fold variant actually engages
    fw, bw, x, x_rev, seq_len = make_case(6, dim=128)

    def loss(fn, fw, bw, x):
        from lstm_ctc_tpu.models.cells import reverse_sequence
        x_rev = reverse_sequence(x, seq_len)
        fw_out, bw_out, (fs, bs) = fn(fw, bw, x, x_rev, seq_len,
                                      FORGET_BIAS)
        return (jnp.sum(jnp.sin(fw_out)) + jnp.sum(jnp.cos(bw_out))
                + jnp.sum(fs[0] * 0.1) + jnp.sum(bs[1] * 0.2))

    ref = jax.grad(
        lambda fw, bw, x: loss(bilstm_dual_scan, fw, bw, x),
        argnums=(0, 1, 2))(fw, bw, x)
    got = jax.grad(
        lambda fw, bw, x: loss(
            lambda *a, **k: bilstm_dual_scan_fused(
                *a, time_block=8, store_dtype="float32",
                interpret=True, **k), fw, bw, x),
        argnums=(0, 1, 2))(fw, bw, x)

    flat_ref, _ = jax.tree_util.tree_flatten_with_path(ref)
    flat_got, _ = jax.tree_util.tree_flatten_with_path(got)
    for (path, r), (_, g) in zip(flat_ref, flat_got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=str(path))


def test_fold_dx_packed_matches_scan(monkeypatch):
    """Fold variant under packed rows (reset masks): loss gradients must
    match the scan path exactly (f32 stores)."""
    from lstm_ctc_tpu.models.cells import reverse_segments

    monkeypatch.setenv("LSTM_CTC_TPU_LSTM_FOLD_DX", "1")
    rng = np.random.RandomState(8)
    B, T, D = 2, 16, 128
    fw = init_lstm_cell(jax.random.PRNGKey(21), D, 16, num_proj=8,
                        use_peepholes=True)
    bw = init_lstm_cell(jax.random.PRNGKey(22), D, 16, num_proj=8,
                        use_peepholes=True)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    seq = jnp.asarray([12, 16], jnp.int32)
    reset = np.zeros((B, T), np.float32)
    reset[0, [0, 7]] = 1.0
    reset[1, [0, 9]] = 1.0
    reset = jnp.asarray(reset)

    def loss(fn, fw, bw, x):
        x_rev = reverse_segments(x, seq, reset)
        fw_out, bw_out, _ = fn(fw, bw, x, x_rev, seq, FORGET_BIAS,
                               reset_mask=reset)
        return jnp.sum(jnp.sin(fw_out)) + jnp.sum(jnp.cos(bw_out))

    l_ref, g_ref = jax.value_and_grad(
        lambda p: loss(bilstm_dual_scan, p, bw, x))(fw)
    l_got, g_got = jax.value_and_grad(
        lambda p: loss(
            lambda *a, **k: bilstm_dual_scan_fused(
                *a, time_block=8, store_dtype="float32",
                interpret=True, **k), p, bw, x))(fw)
    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-5)
    for (path, r), (_, g) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_got)[0]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=str(path))


def test_unroll_env_participates_in_kernel_cache_key(monkeypatch):
    """Changing LSTM_CTC_TPU_KERNEL_UNROLL mid-process must rebuild the
    fused kernel (new lru_cache entry), not silently reuse one built
    with the old factor — and the unrolled kernel must stay
    semantics-preserving."""
    from lstm_ctc_tpu.ops import lstm_pallas

    fw, bw, x, x_rev, seq_len = make_case(7)
    # the factory cache is process-global and shared across tests —
    # reset it so the entry counting is order-independent
    lstm_pallas._make_fused.cache_clear()
    monkeypatch.setenv("LSTM_CTC_TPU_KERNEL_UNROLL", "1")
    got1 = bilstm_dual_scan_fused(fw, bw, x, x_rev, seq_len, FORGET_BIAS,
                                  time_block=8, store_dtype="float32",
                                  interpret=True)
    size1 = lstm_pallas._make_fused.cache_info().currsize
    assert size1 == 1
    monkeypatch.setenv("LSTM_CTC_TPU_KERNEL_UNROLL", "4")
    got4 = bilstm_dual_scan_fused(fw, bw, x, x_rev, seq_len, FORGET_BIAS,
                                  time_block=8, store_dtype="float32",
                                  interpret=True)
    assert lstm_pallas._make_fused.cache_info().currsize == 2, \
        "unroll change did not produce a fresh kernel cache entry"
    for a, b in zip(jax.tree_util.tree_leaves(got1),
                    jax.tree_util.tree_leaves(got4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
