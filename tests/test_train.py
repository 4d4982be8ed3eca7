"""Training-layer tests: loss semantics, clipping, checkpoint roundtrip,
and a synthetic end-to-end training run that must reach near-zero loss."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lstm_ctc_tpu.data.pipeline import Batch
from lstm_ctc_tpu.models import init_model
from lstm_ctc_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from lstm_ctc_tpu.train.graph import (
    _clip_by_global_norm,
    _l2_loss,
    compute_losses,
    make_eval_step,
    make_train_step,
)

CONFIG = {
    "nnet_type": "blstm",
    "input_dim": 8,
    "left_context": 0,
    "right_context": 0,
    "subsample": 0,
    "num_layers": 1,
    "num_neurons": 24,
    "num_projects": 12,
    "num_targets": 6,
    "use_peepholes": True,
    "dropout_rate": 1.0,
    "num_experts": 0,
    "moe_temp": 10.0,
}


def make_batch(rng, batch=4, time=12, dim=8, targets=5, num_classes=6):
    feats = rng.randn(batch, time, dim).astype(np.float32)
    seq_len = np.full((batch,), time, np.int32)
    labels = np.full((batch, targets), -1, np.int32)
    tgt_len = np.zeros((batch,), np.int32)
    for b in range(batch):
        u = rng.randint(1, targets)
        labels[b, :u] = rng.randint(0, num_classes - 1, u)
        tgt_len[b] = u
    return {
        "nnet_input": jnp.asarray(feats),
        "sequence_length": jnp.asarray(seq_len),
        "nnet_target": jnp.asarray(labels),
        "target_length": jnp.asarray(tgt_len),
    }


def test_size_counts_real_labels_only():
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    params, state = init_model(jax.random.PRNGKey(0), CONFIG)
    metrics, _, _ = compute_losses(params, state, batch, CONFIG, train=False)
    expected = int((np.asarray(batch["nnet_target"]) >= 0).sum())
    assert int(metrics["size"]) == expected
    assert float(metrics["eval_loss"]) > 0


def test_clip_by_global_norm():
    grads = {"a": jnp.full((3,), 4.0), "b": jnp.full((4,), 3.0)}
    # global norm = sqrt(3*16 + 4*9) = sqrt(84)
    clipped, norm = _clip_by_global_norm(grads, 5.0)
    expected_scale = 5.0 / np.sqrt(84.0)
    np.testing.assert_allclose(float(norm), np.sqrt(84.0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(clipped["a"]),
                               4.0 * expected_scale, rtol=1e-6)
    # no-op when under the limit
    small = {"a": jnp.ones((2,))}
    unclipped, _ = _clip_by_global_norm(small, 5.0)
    np.testing.assert_allclose(np.asarray(unclipped["a"]), 1.0, rtol=1e-6)


def test_l2_excludes_cell_bias_only():
    params = {
        "fwd": [{"wx": jnp.ones((2, 2)), "bias": jnp.ones((4,))}],
        "head": {"w": jnp.ones((2, 2)), "b": jnp.ones((2,))},
    }
    # wx: 0.5*4 = 2 ; head w: 2 ; head b (NOT named bias): 0.5*2 = 1
    np.testing.assert_allclose(float(_l2_loss(params)), 5.0, rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    params, state = init_model(jax.random.PRNGKey(3), CONFIG)
    path = str(tmp_path / "nnet.0")
    save_checkpoint(path, params, state, extra={"iter": 0})
    template, t_state = init_model(jax.random.PRNGKey(99), CONFIG)
    loaded, loaded_state, extra = load_checkpoint(path, template, t_state)
    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(loaded)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert int(extra["iter"]) == 0


def test_checkpoint_shape_mismatch_detected(tmp_path):
    params, state = init_model(jax.random.PRNGKey(3), CONFIG)
    path = str(tmp_path / "nnet.0")
    save_checkpoint(path, params, state)
    bad_config = dict(CONFIG, num_neurons=32)
    template, t_state = init_model(jax.random.PRNGKey(0), bad_config)
    with pytest.raises(ValueError):
        load_checkpoint(path, template, t_state)


def test_training_reduces_loss_to_near_zero():
    """The first end-to-end slice: overfit 8 synthetic utterances."""
    rng = np.random.RandomState(42)
    batch = make_batch(rng, batch=8, time=20)
    params, net_state = init_model(jax.random.PRNGKey(0), CONFIG)
    init_opt, train_step = make_train_step(
        CONFIG, learn_rate=5e-3, optimizer="adam")
    opt_state = init_opt(params)
    key = jax.random.PRNGKey(1)
    first_loss = None
    for step in range(300):
        key, sub = jax.random.split(key)
        params, opt_state, net_state, metrics = train_step(
            params, opt_state, net_state, sub, batch)
        per_label = float(metrics["eval_loss"]) / int(metrics["size"])
        if first_loss is None:
            first_loss = per_label
        if per_label < 0.05:
            break
    assert first_loss > 1.0
    assert per_label < 0.05, "did not converge: %.3f" % per_label

    # greedy decode should now reproduce the labels
    eval_step = make_eval_step(CONFIG, with_logits=True)
    metrics, logits = eval_step(params, net_state, batch)
    from lstm_ctc_tpu.ops import greedy_decode
    from lstm_ctc_tpu.ops.decode import dense_targets_to_lists
    hyps = greedy_decode(np.asarray(logits),
                         np.asarray(batch["sequence_length"]))
    refs = dense_targets_to_lists(np.asarray(batch["nnet_target"]))
    assert hyps == refs


def test_moe_treatment_model_trains():
    """The mixture-of-softmaxes head (the ICASSP'19 treatment model) must
    train to near-zero loss, including with its dropout active."""
    config = dict(CONFIG, num_experts=4, moe_temp=10.0, dropout_rate=0.9)
    rng = np.random.RandomState(42)
    batch = make_batch(rng, batch=8, time=20)
    params, net_state = init_model(jax.random.PRNGKey(0), config)
    init_opt, train_step = make_train_step(
        config, learn_rate=5e-3, optimizer="adam")
    opt_state = init_opt(params)
    key = jax.random.PRNGKey(1)
    per_label = None
    for _ in range(250):
        key, sub = jax.random.split(key)
        params, opt_state, net_state, metrics = train_step(
            params, opt_state, net_state, sub, batch)
        per_label = float(metrics["eval_loss"]) / int(metrics["size"])
        if per_label < 0.05:
            break
    assert per_label < 0.05, "MoE model did not converge: %.3f" % per_label
