"""Fused Pallas MoE expert mix (interpret mode on CPU) vs the XLA path.

Covers: value + gradient parity at keep_prob=1 against the plain-XLA
einsum head, value + gradient parity at keep_prob<1 against a pure-JAX
reference that reproduces the kernel's hash-based dropout mask, expert
counts that need padding to the expert block, and end-to-end dispatch
through ``apply_moe``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lstm_ctc_tpu.models import moe as moe_mod
from lstm_ctc_tpu.models.moe import apply_moe, init_moe
from lstm_ctc_tpu.ops.moe_pallas import (
    expert_block_size, fused_eligible, moe_mix_fused, moe_mix_reference)


def make_case(seed, n=20, d=48, e=5, v=7):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    params = init_moe(jax.random.PRNGKey(seed), d, v, e)
    gate = jax.nn.softmax(
        jnp.asarray(rng.randn(n, e).astype(np.float32)), axis=-1)
    return jnp.asarray(x), params, gate


def xla_mix(x, w, b, gate, e, tau):
    expert = tau * jnp.tanh(x @ w + b)
    return jnp.einsum("ne,nev->nv", gate, expert.reshape(x.shape[0], e, -1))


@pytest.mark.parametrize("e,v", [(5, 7), (8, 16), (3, 72)])
def test_fused_matches_xla_no_dropout(e, v):
    x, params, gate = make_case(0, e=e, v=v)
    tau = 10.0
    w, b = params["w_expert"], params["b_expert"]

    ref = xla_mix(x, w, b, gate, e, tau)
    got = moe_mix_fused(x, w, b, gate, e, tau, compute_dtype=jnp.float32,
                        n_block=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_grads_match_xla_no_dropout():
    x, params, gate = make_case(1)
    tau = 10.0
    w, b = params["w_expert"], params["b_expert"]

    def loss_ref(x, w, b, gate):
        return jnp.sum(jnp.sin(xla_mix(x, w, b, gate, 5, tau)))

    def loss_fused(x, w, b, gate):
        out = moe_mix_fused(x, w, b, gate, 5, tau,
                            compute_dtype=jnp.float32, n_block=8,
                            interpret=True)
        return jnp.sum(jnp.sin(out))

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, b, gate)
    got_grads = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, b, gate)
    for got, ref, name in zip(got_grads, ref_grads,
                              ["x", "w_expert", "b_expert", "gate"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5,
            err_msg="grad mismatch for %s" % name)


def test_fused_grads_wgrad_kernel_variant(monkeypatch):
    """LSTM_CTC_TPU_MOE_WGRAD=kernel (the opt-in in-kernel wgrad
    accumulator) must produce the same gradients as the default
    emitted-dz backward."""
    monkeypatch.setenv("LSTM_CTC_TPU_MOE_WGRAD", "kernel")
    x, params, gate = make_case(1)
    tau = 10.0
    w, b = params["w_expert"], params["b_expert"]

    def loss_ref(x, w, b, gate):
        return jnp.sum(jnp.sin(xla_mix(x, w, b, gate, 5, tau)))

    def loss_fused(x, w, b, gate):
        out = moe_mix_fused(x, w, b, gate, 5, tau,
                            compute_dtype=jnp.float32, n_block=8,
                            interpret=True)
        return jnp.sum(jnp.sin(out))

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, b, gate)
    got_grads = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, b, gate)
    for got, ref, name in zip(got_grads, ref_grads,
                              ["x", "w_expert", "b_expert", "gate"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5,
            err_msg="grad mismatch for %s" % name)


def test_fused_dropout_matches_hash_reference():
    """kp<1: kernel vs the pure-JAX mirror of its hash mask — values AND
    all four gradients."""
    x, params, gate = make_case(2)
    tau, kp, seed = 10.0, 0.8, jnp.asarray([12345], jnp.int32)
    w, b = params["w_expert"], params["b_expert"]
    kwargs = dict(num_experts=5, moe_temperature=tau, keep_prob=kp,
                  seed=seed, n_block=8)

    ref = moe_mix_reference(x, w, b, gate, **kwargs)
    got = moe_mix_fused(x, w, b, gate, compute_dtype=jnp.float32,
                        interpret=True, **kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn, x, w, b, gate):
        return jnp.sum(jnp.sin(fn(x, w, b, gate, **kwargs)))

    ref_grads = jax.grad(
        lambda *a: loss(moe_mix_reference, *a), argnums=(0, 1, 2, 3))(
            x, w, b, gate)
    got_grads = jax.grad(
        lambda *a: loss(lambda *b_, **k: moe_mix_fused(
            *b_, compute_dtype=jnp.float32, interpret=True, **k), *a),
        argnums=(0, 1, 2, 3))(x, w, b, gate)
    for got, ref, name in zip(got_grads, ref_grads,
                              ["x", "w_expert", "b_expert", "gate"]):
        # f32 accumulation-order differences (matmul fold vs einsum)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-3, atol=5e-5,
            err_msg="grad mismatch for %s" % name)


def test_hash_uniform_statistics():
    """The counter-based hash behind the in-kernel dropout: uniform mean,
    keep-rate ≈ keep_prob, deterministic per seed, decorrelated across
    seeds and across tile offsets."""
    from lstm_ctc_tpu.ops.moe_pallas import hash_uniform
    seed = jnp.asarray(42, jnp.int32)
    u = np.asarray(hash_uniform(seed, 0, 0, 512, 512))
    assert abs(u.mean() - 0.5) < 0.01
    assert u.min() >= 0.0 and u.max() < 1.0
    for kp in (0.5, 0.7, 0.9):
        assert abs((u < kp).mean() - kp) < 0.01
    # deterministic
    u2 = np.asarray(hash_uniform(seed, 0, 0, 512, 512))
    np.testing.assert_array_equal(u, u2)
    # different seed → different stream
    u3 = np.asarray(hash_uniform(jnp.asarray(43, jnp.int32), 0, 0, 512, 512))
    assert abs(np.corrcoef(u.ravel(), u3.ravel())[0, 1]) < 0.02
    # tile offsets reproduce the same global values (fwd/bwd block match)
    tile = np.asarray(hash_uniform(seed, 128, 256, 64, 64))
    np.testing.assert_array_equal(tile, u[128:192, 256:320])


def test_eligibility_and_block_size():
    assert expert_block_size(72) == 16       # 16·72 = 1152 = 9·128
    assert expert_block_size(128) == 1
    assert expert_block_size(71) == 128
    assert fused_eligible(640, 72)
    assert not fused_eligible(640, 71)       # Eb·V = 9088 > cap


def test_apply_moe_dispatch(monkeypatch):
    """apply_moe with the fused path forced (interpret on CPU) matches the
    XLA path when there is no dropout."""
    x, params_only, _ = make_case(4)
    params = init_moe(jax.random.PRNGKey(7), 48, 7, 5)

    monkeypatch.setenv("LSTM_CTC_TPU_MOE_IMPL", "xla")
    ref = apply_moe(params, x, 5, 10.0)
    monkeypatch.setenv("LSTM_CTC_TPU_MOE_IMPL", "fused")
    got = apply_moe(params, x, 5, 10.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_moe_nblock_env_knob(monkeypatch):
    """LSTM_CTC_TPU_MOE_NBLOCK retiles the fused kernel's row grid
    without changing results (no-dropout path is tile-invariant)."""
    x, _, _ = make_case(9)
    params = init_moe(jax.random.PRNGKey(11), 48, 7, 5)
    monkeypatch.setenv("LSTM_CTC_TPU_MOE_IMPL", "fused")
    base = apply_moe(params, x, 5, 10.0)
    monkeypatch.setenv("LSTM_CTC_TPU_MOE_NBLOCK", "64")
    retiled = apply_moe(params, x, 5, 10.0)
    np.testing.assert_allclose(np.asarray(retiled), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_apply_moe_fused_dropout_trains(monkeypatch):
    """Fused path with dropout active: finite loss and grads through a
    training-style objective."""
    monkeypatch.setenv("LSTM_CTC_TPU_MOE_IMPL", "fused")
    x, _, _ = make_case(5)
    params = init_moe(jax.random.PRNGKey(8), 48, 7, 5)

    def loss(params):
        out = apply_moe(params, x, 5, 10.0, keep_prob=0.9,
                        dropout_rng=jax.random.PRNGKey(0))
        return jnp.sum(out ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_fused_grads_wgrad_twokernel_variant(monkeypatch):
    """LSTM_CTC_TPU_MOE_WGRAD=twokernel (dx/dgate pass + e-major wgrad
    pass, no dz stream) must produce the same gradients as the default
    emitted-dz backward."""
    monkeypatch.setenv("LSTM_CTC_TPU_MOE_WGRAD", "twokernel")
    x, params, gate = make_case(1)
    tau = 10.0
    w, b = params["w_expert"], params["b_expert"]

    def loss_ref(x, w, b, gate):
        return jnp.sum(jnp.sin(xla_mix(x, w, b, gate, 5, tau)))

    def loss_fused(x, w, b, gate):
        out = moe_mix_fused(x, w, b, gate, 5, tau,
                            compute_dtype=jnp.float32, n_block=8,
                            interpret=True)
        return jnp.sum(jnp.sin(out))

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, b, gate)
    got_grads = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, b, gate)
    for got, ref, name in zip(got_grads, ref_grads,
                              ["x", "w_expert", "b_expert", "gate"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5,
            err_msg="grad mismatch for %s" % name)


def test_fused_grads_wgrad_twokernel_with_dropout(monkeypatch):
    """The twokernel wgrad pass regenerates the SAME hash mask on its
    e-major grid (global tile ids, not program ids) — dropout gradients
    must match the default backward's."""
    x, params, gate = make_case(3)
    tau, kp = 10.0, 0.75
    w, b = params["w_expert"], params["b_expert"]
    seed = jnp.asarray([777], jnp.int32)

    def loss(x, w, b, gate):
        out = moe_mix_fused(x, w, b, gate, 5, tau, keep_prob=kp,
                            seed=seed, compute_dtype=jnp.float32,
                            n_block=8, interpret=True)
        return jnp.sum(jnp.sin(out))

    monkeypatch.setenv("LSTM_CTC_TPU_MOE_WGRAD", "xla")
    ref_grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, w, b, gate)
    monkeypatch.setenv("LSTM_CTC_TPU_MOE_WGRAD", "twokernel")
    got_grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, w, b, gate)
    for got, ref, name in zip(got_grads, ref_grads,
                              ["x", "w_expert", "b_expert", "gate"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5,
            err_msg="grad mismatch for %s" % name)


def test_fused_w_resident_matches_streamed(monkeypatch):
    """LSTM_CTC_TPU_MOE_WRES=1 (VMEM-resident expert weights + R
    constant, sliced per expert block with a dynamic pl.ds) must be
    numerically identical to the streamed-block layout — values and all
    four gradients, with and without expert dropout, across wgrad
    modes."""
    rs = np.random.RandomState(11)
    n, d, e, v = 48, 16, 5, 12
    x = jnp.asarray(rs.randn(n, d), jnp.float32)
    w = jnp.asarray(rs.randn(d, e * v) * 0.3, jnp.float32)
    b = jnp.asarray(rs.randn(e * v) * 0.1, jnp.float32)
    gate = jax.nn.softmax(jnp.asarray(rs.randn(n, e), jnp.float32))
    cot = jnp.asarray(rs.randn(n, v), jnp.float32)

    def loss(*o, **kw):
        return jnp.sum(moe_mix_fused(*o, e, 10.0,
                                     compute_dtype=jnp.float32,
                                     interpret=True, **kw) * cot)

    for kw in ({}, {"keep_prob": 0.7, "seed": jnp.asarray([9])}):
        for wgrad in ("xla", "twokernel", "kernel"):
            monkeypatch.setenv("LSTM_CTC_TPU_MOE_WGRAD", wgrad)
            monkeypatch.delenv("LSTM_CTC_TPU_MOE_WRES", raising=False)
            want_v = moe_mix_fused(x, w, b, gate, e, 10.0,
                                   compute_dtype=jnp.float32,
                                   interpret=True, **kw)
            want_g = jax.grad(lambda *o: loss(*o, **kw),
                              argnums=(0, 1, 2, 3))(x, w, b, gate)
            monkeypatch.setenv("LSTM_CTC_TPU_MOE_WRES", "1")
            got_v = moe_mix_fused(x, w, b, gate, e, 10.0,
                                  compute_dtype=jnp.float32,
                                  interpret=True, **kw)
            got_g = jax.grad(lambda *o: loss(*o, **kw),
                             argnums=(0, 1, 2, 3))(x, w, b, gate)
            np.testing.assert_allclose(np.asarray(got_v),
                                       np.asarray(want_v),
                                       rtol=1e-6, atol=1e-6)
            for a, bb in zip(got_g, want_g):
                np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                           rtol=1e-6, atol=1e-6)
