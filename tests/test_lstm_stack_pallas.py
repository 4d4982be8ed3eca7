"""Wavefront whole-stack kernel (ops/lstm_stack_pallas) vs the XLA scan
composition — values, gradients, final states, ragged lengths.

Runs the Pallas kernels in interpret mode (CPU); f32 store/compute for
bit-comparable parity, mirroring tests/test_lstm_pallas.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lstm_ctc_tpu.models.cells import init_lstm_cell, lstm_scan
from lstm_ctc_tpu.ops.lstm_stack_pallas import (lstm_stack_fused,
                                                stack_eligible)

B, T, H = 4, 20, 16
D0 = 24


def make_stack(num_layers, num_proj, use_peepholes, seed=0):
    rng = jax.random.PRNGKey(seed)
    params = []
    d = D0
    out_dim = num_proj or H
    for _ in range(num_layers):
        rng, k = jax.random.split(rng)
        params.append(init_lstm_cell(k, d, H, num_proj,
                                     use_peepholes=use_peepholes))
        d = out_dim
    return params


def ref_stack(params_list, x, seq_len, residual_flags):
    """The models/lstm.py per-layer composition (scan path)."""
    out = x
    for p, res in zip(params_list, residual_flags):
        y, state = lstm_scan(p, out, seq_len, forget_bias=1.0)
        out = y + out if res else y
    return out


def run_fused(params_list, x, seq_len, residual_flags):
    return lstm_stack_fused(params_list, x, seq_len, 1.0,
                            residual_flags=tuple(residual_flags),
                            compute_dtype=None, store_dtype="float32",
                            time_block=8, interpret=True)


@pytest.mark.parametrize("num_proj,peep,resid", [
    (None, False, False),     # cudnnlstm family
    (12, True, True),         # lstm family (proj + peepholes + residual)
])
def test_stack_forward_matches_scan(num_proj, peep, resid):
    params = make_stack(3, num_proj, peep)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, T, D0), jnp.float32)
    seq = jnp.asarray([T, T - 3, 5, 1], jnp.int32)
    flags = [False] + [resid, resid]
    want = ref_stack(params, x, seq, flags)
    got, states = run_fused(params, x, seq, flags)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    assert len(states) == 3


def test_stack_final_states_match_scan():
    params = make_stack(2, 12, True)
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(B, T, D0), jnp.float32)
    seq = jnp.asarray([T, 7, T - 1, 3], jnp.int32)
    flags = [False, True]
    _, states = run_fused(params, x, seq, flags)
    # reference: run layer by layer, collecting scan final states
    out = x
    for idx, (p, res) in enumerate(zip(params, flags)):
        y, (c_f, h_f) = lstm_scan(p, out, seq, forget_bias=1.0)
        np.testing.assert_allclose(np.asarray(states[idx][0]),
                                   np.asarray(c_f), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(states[idx][1]),
                                   np.asarray(h_f), rtol=2e-5, atol=2e-5)
        out = y + out if res else y


@pytest.mark.parametrize("num_proj,peep,resid", [
    (None, False, False),
    (12, True, True),
])
def test_stack_grads_match_scan(num_proj, peep, resid):
    params = make_stack(3, num_proj, peep, seed=2)
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(B, T, D0), jnp.float32)
    seq = jnp.asarray([T, T - 5, 9, 2], jnp.int32)
    flags = [False, resid, resid]

    def loss_ref(params, x):
        return jnp.sum(jnp.sin(ref_stack(params, x, seq, flags)))

    def loss_fused(params, x):
        out, _ = run_fused(params, x, seq, flags)
        return jnp.sum(jnp.sin(out))

    ref_g = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    got_g = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(got_g[1]),
                               np.asarray(ref_g[1]),
                               rtol=5e-5, atol=5e-5, err_msg="dx")
    for l, (gp, rp) in enumerate(zip(got_g[0], ref_g[0])):
        for name in rp:
            np.testing.assert_allclose(
                np.asarray(gp[name]), np.asarray(rp[name]),
                rtol=5e-5, atol=5e-5,
                err_msg="layer %d grad %s" % (l, name))


def test_stack_eligibility_rules():
    ok = make_stack(3, 12, True)
    assert stack_eligible(ok)
    assert not stack_eligible(ok[:1])          # single layer
    # layer-0 residual config: input dim == output dim
    rng = jax.random.PRNGKey(3)
    p0 = init_lstm_cell(rng, 12, H, 12, use_peepholes=True)
    assert not stack_eligible([p0] + ok[1:])


def test_model_dispatch_uses_stack(monkeypatch):
    """apply_cudnnlstm must route through the wavefront kernel when the
    fused mode is forced, and match the scan path exactly."""
    from lstm_ctc_tpu.models.lstm import apply_cudnnlstm, init_cudnnlstm

    config = {"nnet_type": "cudnnlstm", "input_dim": D0,
              "left_context": 0, "right_context": 0, "subsample": 0,
              "num_layers": 3, "num_neurons": H, "num_projects": None,
              "num_targets": 10, "use_peepholes": False}
    params = init_cudnnlstm(jax.random.PRNGKey(0), config)
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(B, T, D0), jnp.float32)
    seq = jnp.asarray([T, 11, 6, 2], jnp.int32)

    monkeypatch.setenv("LSTM_CTC_TPU_LSTM_IMPL", "scan")
    want, _, _ = apply_cudnnlstm(params, x, seq, config)

    calls = {}
    import lstm_ctc_tpu.ops.lstm_stack_pallas as sp
    orig = sp.lstm_stack_fused

    def spy(*a, **kw):
        calls["hit"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(sp, "lstm_stack_fused", spy)
    monkeypatch.setenv("LSTM_CTC_TPU_LSTM_IMPL", "pallas")
    monkeypatch.setenv("LSTM_CTC_TPU_STORE_DTYPE", "float32")
    got, _, _ = apply_cudnnlstm(params, x, seq, config)
    assert calls.get("hit"), "wavefront kernel was not dispatched"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_stack_chunked_continuation_matches_one_shot():
    """Streaming contract: running two chunks with carried (c, h) per
    layer must equal the one-shot run — the wavefront ring buffer
    refills during each chunk's fill steps, so cross-chunk state is
    exactly the per-layer (c, h)."""
    params = make_stack(3, 12, True, seed=5)
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(B, T, D0), jnp.float32)
    seq_full = jnp.full((B,), T, jnp.int32)
    flags = [False, True, True]
    want, want_states = run_fused(params, x, seq_full, flags)

    half = T // 2
    seq_half = jnp.full((B,), half, jnp.int32)
    out1, st1 = lstm_stack_fused(
        params, x[:, :half], seq_half, 1.0, residual_flags=tuple(flags),
        compute_dtype=None, store_dtype="float32", time_block=8,
        interpret=True)
    out2, st2 = lstm_stack_fused(
        params, x[:, half:], seq_half, 1.0, residual_flags=tuple(flags),
        compute_dtype=None, store_dtype="float32", time_block=8,
        interpret=True, initial_states=st1)
    got = jnp.concatenate([out1, out2], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    for (ca, ha), (cb, hb) in zip(st2, want_states):
        np.testing.assert_allclose(np.asarray(ca), np.asarray(cb),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(ha), np.asarray(hb),
                                   rtol=2e-5, atol=2e-5)


def test_stack_initial_state_gradients():
    """d(initial states) must match autodiff through the scan
    composition with an explicit initial_state on layer 0."""
    params = make_stack(2, None, False, seed=6)
    rs = np.random.RandomState(6)
    x = jnp.asarray(rs.randn(B, T, D0), jnp.float32)
    seq = jnp.asarray([T, T - 2, 4, 1], jnp.int32)
    flags = [False, False]
    c0 = jnp.asarray(rs.randn(B, H) * 0.1, jnp.float32)
    h0 = jnp.asarray(rs.randn(B, H) * 0.1, jnp.float32)
    zc = jnp.zeros((B, H), jnp.float32)

    def loss_ref(c0, h0):
        out = x
        states = [(c0, h0), (zc, zc)]
        for p, st in zip(params, states):
            out, _ = lstm_scan(p, out, seq, forget_bias=1.0,
                               initial_state=st)
        return jnp.sum(jnp.sin(out))

    def loss_fused(c0, h0):
        out, _ = lstm_stack_fused(
            params, x, seq, 1.0, residual_flags=tuple(flags),
            compute_dtype=None, store_dtype="float32", time_block=8,
            interpret=True, initial_states=[(c0, h0), (zc, zc)])
        return jnp.sum(jnp.sin(out))

    ref_g = jax.grad(loss_ref, argnums=(0, 1))(c0, h0)
    got_g = jax.grad(loss_fused, argnums=(0, 1))(c0, h0)
    np.testing.assert_allclose(np.asarray(got_g[0]), np.asarray(ref_g[0]),
                               rtol=5e-5, atol=5e-5, err_msg="dc0")
    np.testing.assert_allclose(np.asarray(got_g[1]), np.asarray(ref_g[1]),
                               rtol=5e-5, atol=5e-5, err_msg="dh0")


def test_model_dispatch_lstm_family(monkeypatch):
    """apply_lstm (peepholes + projection + residual, no BN/dropout)
    must route through the wavefront kernel and match the scan path."""
    from lstm_ctc_tpu.models import apply_model, init_model

    config = {"nnet_type": "lstm", "input_dim": D0,
              "left_context": 0, "right_context": 0, "subsample": 0,
              "num_layers": 3, "num_neurons": H, "num_projects": 12,
              "num_targets": 10, "use_peepholes": True,
              "dropout_rate": 1.0, "num_experts": 0}
    params, state = init_model(jax.random.PRNGKey(7), config)
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(B, T, D0), jnp.float32)
    seq = jnp.asarray([T, 13, 8, 2], jnp.int32)

    monkeypatch.setenv("LSTM_CTC_TPU_LSTM_IMPL", "scan")
    want, _, _, _ = apply_model(params, state, x, seq, config)

    calls = {}
    import lstm_ctc_tpu.ops.lstm_stack_pallas as sp
    orig = sp.lstm_stack_fused

    def spy(*a, **kw):
        calls["hit"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(sp, "lstm_stack_fused", spy)
    monkeypatch.setenv("LSTM_CTC_TPU_LSTM_IMPL", "pallas")
    monkeypatch.setenv("LSTM_CTC_TPU_STORE_DTYPE", "float32")
    got, _, _, _ = apply_model(params, state, x, seq, config)
    assert calls.get("hit"), "wavefront kernel was not dispatched"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_stack_dropout_matches_hash_reference():
    """keep_prob < 1: the in-kernel hash dropout must equal a pure-JAX
    mirror of the same counter-based mask applied to the scan
    composition — values and gradients."""
    from lstm_ctc_tpu.ops.moe_pallas import hash_uniform

    num_layers, kp = 3, 0.8
    params = make_stack(num_layers, 12, True, seed=8)
    rs = np.random.RandomState(8)
    x = jnp.asarray(rs.randn(B, T, D0), jnp.float32)
    seq = jnp.asarray([T, T - 4, 7, 2], jnp.int32)
    flags = (False, True, True)
    seed = jnp.asarray([12345], jnp.int32)
    out_dim = 12
    lb = num_layers * B
    s_steps = T + num_layers - 1
    tb = 8
    padded_s = -(-s_steps // tb) * tb

    # the kernel's mask, regenerated outside: M[s] over [LB, P]
    masks = jnp.stack([
        (hash_uniform(seed[0], s * lb, 0, lb, out_dim) < kp)
        .astype(jnp.float32) / kp
        for s in range(padded_s)])                       # [S, LB, P]

    def ref(params, x):
        out = x
        for l, (p, r) in enumerate(zip(params, flags)):
            y, _ = lstm_scan(p, out, seq, forget_bias=1.0)
            chain = y + out if r else y
            # layer l at time t was masked at wavefront step s = t + l
            msel = jnp.stack([masks[t + l, l * B:(l + 1) * B]
                              for t in range(T)], axis=1)  # [B, T, P]
            out = chain * msel
        return out

    def fused(params, x):
        out, _ = lstm_stack_fused(
            params, x, seq, 1.0, residual_flags=flags,
            compute_dtype=None, store_dtype="float32", time_block=tb,
            interpret=True, keep_prob=kp, seed=seed)
        return out

    want = ref(params, x)
    got = fused(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    ref_g = jax.grad(lambda p, x: jnp.sum(jnp.sin(ref(p, x))),
                     argnums=(0, 1))(params, x)
    got_g = jax.grad(lambda p, x: jnp.sum(jnp.sin(fused(p, x))),
                     argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(got_g[1]), np.asarray(ref_g[1]),
                               rtol=5e-5, atol=5e-5, err_msg="dx")
    for l, (gp, rp) in enumerate(zip(got_g[0], ref_g[0])):
        for name in rp:
            np.testing.assert_allclose(
                np.asarray(gp[name]), np.asarray(rp[name]),
                rtol=5e-5, atol=5e-5,
                err_msg="layer %d grad %s" % (l, name))


def test_stack_eval_bn_affine_matches_per_layer(monkeypatch):
    """Eval-mode batch norm folds into the wavefront kernel as per-layer
    chain affines (models/lstm._bn_affine): apply_model(train=False) on
    an lstm+bn config must match the per-layer scan+BN path exactly, and
    must actually dispatch the stack kernel."""
    from lstm_ctc_tpu.models import apply_model, init_model

    monkeypatch.setenv("LSTM_CTC_TPU_LSTM_IMPL", "pallas")
    monkeypatch.setenv("LSTM_CTC_TPU_STORE_DTYPE", "float32")
    config = {
        "nnet_type": "lstm", "input_dim": 12, "left_context": 0,
        "right_context": 0, "subsample": 0, "num_layers": 3,
        "num_neurons": 16, "num_projects": 8, "num_targets": 10,
        "use_peepholes": True, "use_bn": True, "dropout_rate": 0.9,
        "num_experts": 0, "moe_temp": 10.0,
    }
    params, state = init_model(jax.random.PRNGKey(3), config)
    # non-trivial running moments so the affine is not the identity
    rs = np.random.RandomState(7)
    for bn in list(state["bn"]) + [state["bn_in"]]:
        dim = bn["mean"].shape[0]
        bn["mean"] = jnp.asarray(rs.randn(dim) * 0.3, jnp.float32)
        bn["var"] = jnp.asarray(0.5 + rs.rand(dim), jnp.float32)
    for bn in list(params["bn"]) + [params["bn_in"]]:
        dim = bn["scale"].shape[0]
        bn["scale"] = jnp.asarray(0.5 + rs.rand(dim), jnp.float32)
        bn["offset"] = jnp.asarray(rs.randn(dim) * 0.2, jnp.float32)
    x = jnp.asarray(rs.randn(4, 12, 12), jnp.float32)
    seq = jnp.asarray([12, 9, 4, 1], jnp.int32)

    import lstm_ctc_tpu.ops.lstm_stack_pallas as sp
    orig = sp.lstm_stack_fused
    calls = {}

    def spy(*a, **kw):
        calls["affine"] = kw.get("affine")
        return orig(*a, **kw)

    monkeypatch.setattr(sp, "lstm_stack_fused", spy)
    got, _, _, got_state = apply_model(params, state, x, seq, config,
                                       train=False)
    assert calls.get("affine") is not None, \
        "stack kernel was not dispatched with the BN affine"

    monkeypatch.setenv("LSTM_CTC_TPU_LSTM_STACK", "0")
    want, _, _, want_state = apply_model(params, state, x, seq, config,
                                         train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # eval must not move the running moments on either path
    for a, b in zip(got_state["bn"], want_state["bn"]):
        np.testing.assert_array_equal(np.asarray(a["mean"]),
                                      np.asarray(b["mean"]))


def _two_device_mesh():
    from jax.sharding import Mesh
    devs = jax.devices("cpu")
    if len(devs) < 2:
        import pytest
        pytest.skip("needs >=2 virtual devices")
    return Mesh(np.asarray(devs[:2]), ("data",))


def test_sharded_stack_affine_matches_fused():
    """The sharded wrapper with the eval-BN affine must equal the
    single-device fused kernel on the concatenated batch."""
    from lstm_ctc_tpu.ops.lstm_stack_pallas import lstm_stack_sharded

    mesh = _two_device_mesh()
    params = make_stack(3, 12, True)
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(B, T, D0), jnp.float32)
    seq = jnp.asarray([T, T - 2, 7, 3], jnp.int32)
    flags = (False, True, True)
    affine = [(jnp.asarray(0.5 + rs.rand(12), jnp.float32),
               jnp.asarray(rs.randn(12) * 0.2, jnp.float32))
              for _ in range(3)]

    want, want_states = lstm_stack_fused(
        params, x, seq, 1.0, residual_flags=flags,
        store_dtype="float32", time_block=8, interpret=True,
        affine=affine)
    got, got_states = lstm_stack_sharded(
        mesh, params, x, seq, 1.0, residual_flags=flags,
        store_dtype="float32", time_block=8, interpret=True,
        affine=affine)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    for (gc, gh), (wc, wh) in zip(got_states, want_states):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(wc),
                                   rtol=1e-6, atol=1e-6)


def test_sharded_stack_dropout_decorrelates_shards():
    """Identical data on both shards: with in-kernel dropout the two
    shard outputs must DIFFER (per-shard seed offset via axis_index) —
    the hash counter indexes local rows and would otherwise repeat the
    same mask on every shard.  With keep_prob=1 the halves agree,
    proving the data really is identical."""
    from lstm_ctc_tpu.ops.lstm_stack_pallas import lstm_stack_sharded

    mesh = _two_device_mesh()
    params = make_stack(3, 12, True)
    rs = np.random.RandomState(5)
    half = np.asarray(rs.randn(2, T, D0), np.float32)
    x = jnp.asarray(np.concatenate([half, half], axis=0))  # [4, T, D]
    seq = jnp.full((4,), T, jnp.int32)
    flags = (False, True, True)

    clean, _ = lstm_stack_sharded(
        mesh, params, x, seq, 1.0, residual_flags=flags,
        store_dtype="float32", time_block=8, interpret=True)
    np.testing.assert_allclose(np.asarray(clean[:2]),
                               np.asarray(clean[2:]),
                               rtol=1e-6, atol=1e-6)

    dropped, _ = lstm_stack_sharded(
        mesh, params, x, seq, 1.0, residual_flags=flags,
        store_dtype="float32", time_block=8, interpret=True,
        keep_prob=0.5, seed=jnp.asarray([123], jnp.int32))
    assert not np.allclose(np.asarray(dropped[:2]),
                           np.asarray(dropped[2:]), atol=1e-6), \
        "shards produced identical dropout masks"


def test_affine_stack_gradient_raises_descriptive_error():
    """The eval-mode-BN (affine) wavefront kernel is forward-only;
    differentiating through it must raise a descriptive
    NotImplementedError, not an obscure Mosaic transpose error."""
    params = make_stack(2, 12, False)
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(B, T, D0), jnp.float32)
    seq = jnp.asarray([T] * B, jnp.int32)
    affine = [(jnp.ones((12,), jnp.float32),
               jnp.zeros((12,), jnp.float32)) for _ in range(2)]

    def loss(x):
        out, _ = lstm_stack_fused(
            params, x, seq, 1.0, residual_flags=(False, True),
            store_dtype="float32", time_block=8, interpret=True,
            affine=affine)
        return jnp.sum(out)

    with pytest.raises(NotImplementedError, match="forward-only"):
        jax.grad(loss)(x)
