"""Streaming inference must match the offline forward pass exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lstm_ctc_tpu.data.pipeline import splice_frames, subsample_frames
from lstm_ctc_tpu.models import apply_model, init_model
from lstm_ctc_tpu.models.streaming import StreamingSession

BASE_CONFIG = {
    "nnet_type": "lstm",
    "input_dim": 6,
    "left_context": 0,
    "right_context": 0,
    "subsample": 0,
    "num_layers": 2,
    "num_neurons": 16,
    "num_projects": 16,
    "num_targets": 7,
    "use_peepholes": True,
    "dropout_rate": 1.0,
    "num_experts": 0,
}


def offline_logits(params, state, config, raw):
    feats = splice_frames(raw, config["left_context"],
                          config["right_context"])
    feats = subsample_frames(feats, config["subsample"])
    logits, _, _, _ = apply_model(
        params, state, jnp.asarray(feats[None]),
        jnp.array([feats.shape[0]]), config, train=False)
    return np.asarray(logits)[0]


@pytest.mark.parametrize("config_update,chunk,feed", [
    ({}, 16, 13),
    ({"left_context": 1, "right_context": 1}, 8, 7),
    ({"left_context": 1, "right_context": 1, "subsample": 2}, 8, 5),
    ({"nnet_type": "cudnnlstm"}, 16, 9),
    ({"num_experts": 3}, 16, 11),
])
def test_streaming_matches_offline(config_update, chunk, feed):
    config = dict(BASE_CONFIG, **config_update)
    params, state = init_model(jax.random.PRNGKey(0), config)
    raw = np.random.RandomState(1).randn(57, 6).astype(np.float32)

    ref = offline_logits(params, state, config, raw)

    session = StreamingSession(params, state, config, chunk_size=chunk)
    chunks = []
    for start in range(0, raw.shape[0], feed):
        chunks.append(session.process(raw[start:start + feed]))
    chunks.append(session.process(None, flush=True))
    got = np.concatenate(chunks, axis=0)

    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_streaming_rejects_blstm():
    config = dict(BASE_CONFIG, nnet_type="blstm")
    params, state = init_model(jax.random.PRNGKey(0), config)
    with pytest.raises(ValueError):
        StreamingSession(params, state, config)
