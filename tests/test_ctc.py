"""CTC loss tests: brute-force enumeration, optax cross-check, gradients,
infeasibility semantics, and the decode/edit-distance utilities."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from lstm_ctc_tpu.ops import ctc_loss, edit_distance_batch, greedy_decode
from lstm_ctc_tpu.ops.decode import (
    beam_search_decode,
    collapse_ctc,
    dense_targets_to_lists,
    edit_distance,
)


def brute_force_ctc(log_probs, labels, blank):
    """-log P(labels) by enumerating every alignment path.  log_probs [T,V]."""
    T, V = log_probs.shape
    total = -np.inf
    for path in itertools.product(range(V), repeat=T):
        if collapse_ctc(path, blank) == list(labels):
            lp = sum(log_probs[t, path[t]] for t in range(T))
            total = np.logaddexp(total, lp)
    return -total


@pytest.mark.parametrize("labels", [[0], [1, 0], [0, 0], [2, 1, 2]])
def test_ctc_matches_brute_force(labels):
    rng = np.random.RandomState(len(labels))
    T, V = 5, 4
    blank = V - 1
    logits = rng.randn(1, T, V).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[0])))
    expected = brute_force_ctc(log_probs, labels, blank)
    padded = np.full((1, 4), -1, np.int32)
    padded[0, :len(labels)] = labels
    loss = ctc_loss(jnp.asarray(logits), jnp.array([T]), jnp.asarray(padded))
    np.testing.assert_allclose(float(loss[0]), expected, rtol=1e-5)


def test_ctc_matches_optax_batch():
    rng = np.random.RandomState(0)
    B, T, V, U = 4, 12, 7, 5
    blank = V - 1
    logits = rng.randn(B, T, V).astype(np.float32)
    seq_len = np.array([12, 9, 7, 12], np.int32)
    label_len = np.array([5, 3, 1, 4], np.int32)
    labels = np.full((B, U), -1, np.int32)
    for b in range(B):
        labels[b, :label_len[b]] = rng.randint(0, V - 1, label_len[b])

    ours = ctc_loss(jnp.asarray(logits), jnp.asarray(seq_len),
                    jnp.asarray(labels))

    logit_pad = (np.arange(T)[None, :] >= seq_len[:, None]).astype(np.float32)
    label_pad = (np.arange(U)[None, :] >= label_len[:, None]).astype(np.float32)
    ref = optax.ctc_loss(jnp.asarray(logits), jnp.asarray(logit_pad),
                         jnp.asarray(np.maximum(labels, 0)),
                         jnp.asarray(label_pad), blank_id=blank)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4)


def test_ctc_gradients_match_optax():
    rng = np.random.RandomState(1)
    B, T, V, U = 2, 8, 5, 3
    logits = rng.randn(B, T, V).astype(np.float32)
    seq_len = np.array([8, 6], np.int32)
    labels = np.array([[0, 1, 2], [3, 0, -1]], np.int32)
    label_len = np.array([3, 2], np.int32)

    grad_ours = jax.grad(
        lambda lg: jnp.sum(ctc_loss(lg, jnp.asarray(seq_len),
                                    jnp.asarray(labels))))(jnp.asarray(logits))
    logit_pad = (np.arange(T)[None, :] >= seq_len[:, None]).astype(np.float32)
    label_pad = (np.arange(U)[None, :] >= label_len[:, None]).astype(np.float32)
    grad_ref = jax.grad(
        lambda lg: jnp.sum(optax.ctc_loss(
            lg, jnp.asarray(logit_pad), jnp.asarray(np.maximum(labels, 0)),
            jnp.asarray(label_pad), blank_id=V - 1)))(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(grad_ours), np.asarray(grad_ref),
                               atol=1e-4)
    # no gradient on padded frames
    assert np.allclose(np.asarray(grad_ours)[1, 6:], 0.0)


def test_ctc_infeasible_zero_loss_and_grad():
    rng = np.random.RandomState(2)
    logits = rng.randn(2, 3, 5).astype(np.float32)
    # row 0: more labels (4) than frames (3) → TF's
    # ignore_longer_outputs_than_inputs → 0; row 1 feasible
    labels = np.array([[0, 1, 2, 3], [1, -1, -1, -1]], np.int32)
    seq_len = jnp.array([3, 3])
    loss = ctc_loss(jnp.asarray(logits), seq_len, jnp.asarray(labels))
    assert float(loss[0]) == 0.0
    assert float(loss[1]) > 0.0
    grads = jax.grad(lambda lg: jnp.sum(
        ctc_loss(lg, seq_len, jnp.asarray(labels))))(jnp.asarray(logits))
    assert np.allclose(np.asarray(grads)[0], 0.0)
    assert not np.allclose(np.asarray(grads)[1], 0.0)


def test_ctc_dummy_rows_are_neutral():
    """Padding rows (seq_len 0, all labels -1) contribute nothing."""
    rng = np.random.RandomState(3)
    logits = rng.randn(3, 6, 4).astype(np.float32)
    labels = np.array([[0, 1], [2, -1], [-1, -1]], np.int32)
    seq_len = jnp.array([6, 5, 0])
    loss = ctc_loss(jnp.asarray(logits), seq_len, jnp.asarray(labels))
    assert float(loss[2]) == 0.0
    grads = jax.grad(lambda lg: jnp.sum(
        ctc_loss(lg, seq_len, jnp.asarray(labels))))(jnp.asarray(logits))
    assert np.allclose(np.asarray(grads)[2], 0.0)


def test_ctc_perfect_prediction_low_loss():
    """Training-style sanity: logits peaked on a valid alignment give a
    near-zero loss."""
    V, blank = 4, 3
    path = [0, 0, blank, 1, 1, blank, 2]
    logits = np.full((1, len(path), V), -20.0, np.float32)
    for t, c in enumerate(path):
        logits[0, t, c] = 20.0
    labels = np.array([[0, 1, 2]], np.int32)
    loss = ctc_loss(jnp.asarray(logits), jnp.array([len(path)]),
                    jnp.asarray(labels))
    assert float(loss[0]) < 1e-3


def test_greedy_decode_and_eval():
    V, blank = 4, 3
    path0 = [0, 0, blank, 1, blank, blank, 2]
    logits = np.full((2, 7, V), -5.0, np.float32)
    for t, c in enumerate(path0):
        logits[0, t, c] = 5.0
    logits[1, :, blank] = 5.0  # row 1 decodes to empty
    hyps = greedy_decode(logits, np.array([7, 7]))
    assert hyps[0] == [0, 1, 2]
    assert hyps[1] == []
    refs = dense_targets_to_lists(np.array([[0, 1, 2], [0, -1, -1]]))
    assert edit_distance_batch(hyps, refs) == 0 + 1


def test_edit_distance():
    assert edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert edit_distance([1, 2, 3], [1, 3]) == 1
    assert edit_distance([], [1, 2]) == 2
    assert edit_distance([1, 2], []) == 2
    assert edit_distance([1, 2, 3], [4, 5, 6]) == 3


def test_beam_search_agrees_with_greedy_on_peaked_input():
    V, blank = 5, 4
    path = [0, blank, 1, 1, blank, 2, 3]
    log_probs = np.full((len(path), V), -10.0, np.float32)
    for t, c in enumerate(path):
        log_probs[t, c] = 0.0
    hyp = beam_search_decode(log_probs, beam_width=4)[0]
    assert hyp == [0, 1, 2, 3]


def test_beam_search_sums_paths():
    """Beam search should prefer a label whose probability mass is split
    across alignments over a greedy-dominant blank path."""
    # classic example: two frames, P(a)=0.4,P(blank)=0.6 each frame
    # greedy gives blank-blank → empty; but P(empty)=0.36 < P([a])=0.64-0.16…
    log_probs = np.log(np.array([[0.4, 0.6], [0.4, 0.6]], np.float32))
    # class 1 is blank
    hyp = beam_search_decode(log_probs, beam_width=4, blank_id=1)[0]
    # P([0]) = 0.4*0.6 + 0.6*0.4 + 0.4*0.4 = 0.64 > P([]) = 0.36
    assert hyp == [0]


def test_ctc_loss_empty_label_batch():
    """A zero-column label matrix (every reference empty) is the
    all-blank path: loss = -sum_t log P(blank); grads flow."""
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 6, 5), jnp.float32)
    seq_len = jnp.asarray([6, 4], jnp.int32)
    labels = jnp.zeros((2, 0), jnp.int32)
    loss = ctc_loss(logits, seq_len, labels)
    lp = jax.nn.log_softmax(np.asarray(logits), axis=2)
    want0 = -lp[0, :6, 4].sum()
    want1 = -lp[1, :4, 4].sum()
    np.testing.assert_allclose(np.asarray(loss), [want0, want1],
                               rtol=1e-5)
    g = jax.grad(lambda lg: ctc_loss(lg, seq_len, labels).sum())(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_ctc_grad_dtype_matches_primal():
    """grad(ctc_loss) must return the primal dtype (custom_vjp aval
    check fails otherwise) — exercised with bf16 logits."""
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(2, 8, 5), jnp.bfloat16)
    seq_len = jnp.asarray([8, 6], jnp.int32)
    labels = jnp.asarray([[1, 2, -1], [0, -1, -1]], jnp.int32)

    def loss_fn(lg):
        return ctc_loss(lg.astype(jnp.bfloat16), seq_len, labels) \
            .astype(jnp.float32).sum()

    g = jax.grad(lambda lg: loss_fn(lg))(logits.astype(jnp.float32))
    assert np.isfinite(np.asarray(g)).all()


def test_fill_blank_path_handles_repeats():
    from lstm_ctc_tpu.ops.nbest import fill_blank_path

    def collapse(path, blank):
        out = []
        prev = blank
        for p in path:
            if p != blank and p != prev:
                out.append(p)
            prev = p
        return out

    # the review's repro: [1,2,2] fits 4 frames as e.g. [1,2,0,2]
    path = fill_blank_path([1, 2, 2], 4, blank_id=0)
    assert len(path) == 4
    assert collapse(path, 0) == [1, 2, 2]
    # many shapes round-trip through CTC collapse
    rng = np.random.RandomState(2)
    for _ in range(50):
        u = rng.randint(1, 8)
        labs = list(rng.randint(1, 4, u))
        repeats = sum(1 for i in range(1, u) if labs[i] == labs[i - 1])
        frames = u + repeats + rng.randint(0, 6)
        path = fill_blank_path(labs, frames, blank_id=0)
        assert len(path) == frames
        assert collapse(path, 0) == labs
    # infeasible still raises
    with pytest.raises(ValueError):
        fill_blank_path([1, 1, 1], 4, blank_id=0)
