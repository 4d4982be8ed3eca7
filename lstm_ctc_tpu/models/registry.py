"""Model registry: nnet_type → (init, apply) with a uniform signature.

Mirrors the reference's dispatch (nnet/graph.py:25-35) over the same three
``nnet_type`` values: ``blstm``, ``lstm``, ``cudnnlstm``.

Uniform surface:
    params, state = init_model(rng, config)
    logits, encoder, reg_losses, new_state = apply_model(
        params, state, nnet_input, sequence_length, config,
        train=..., dropout_rng=...)

``state`` carries non-trainable variables (batch-norm running moments); it
is empty for models without them.
"""

from __future__ import annotations

from typing import Dict, Tuple

from . import blstm as _blstm
from . import lstm as _lstm


def _init_blstm(rng, config):
    return _blstm.init_blstm(rng, config), {}


def _apply_blstm(params, state, nnet_input, sequence_length, config,
                 train=False, dropout_rng=None, reset_mask=None):
    logits, encoder, reg = _blstm.apply_blstm(
        params, nnet_input, sequence_length, config, train, dropout_rng,
        reset_mask=reset_mask)
    return logits, encoder, reg, state


def _init_lstm(rng, config):
    return _lstm.init_lstm(rng, config)


def _apply_lstm(params, state, nnet_input, sequence_length, config,
                train=False, dropout_rng=None, reset_mask=None):
    if reset_mask is not None:
        raise NotImplementedError(
            "pack_factor (packed rows) is only supported for nnet_type "
            "blstm")
    logits, encoder, reg, new_state = _lstm.apply_lstm(
        params, state, nnet_input, sequence_length, config, train,
        dropout_rng)
    return logits, encoder, reg, new_state


def _init_cudnnlstm(rng, config):
    return _lstm.init_cudnnlstm(rng, config), {}


def _apply_cudnnlstm(params, state, nnet_input, sequence_length, config,
                     train=False, dropout_rng=None, reset_mask=None):
    if reset_mask is not None:
        raise NotImplementedError(
            "pack_factor (packed rows) is only supported for nnet_type "
            "blstm")
    logits, encoder, reg = _lstm.apply_cudnnlstm(
        params, nnet_input, sequence_length, config, train, dropout_rng)
    return logits, encoder, reg, state


_REGISTRY = {
    "blstm": (_init_blstm, _apply_blstm),
    "lstm": (_init_lstm, _apply_lstm),
    "cudnnlstm": (_init_cudnnlstm, _apply_cudnnlstm),
}


def get_model(nnet_type: str):
    if nnet_type not in _REGISTRY:
        raise ValueError("unsupported nnet_type: %s (choose from %s)"
                         % (nnet_type, sorted(_REGISTRY)))
    return _REGISTRY[nnet_type]


def init_model(rng, config: Dict) -> Tuple[Dict, Dict]:
    init_fn, _ = get_model(config["nnet_type"])
    return init_fn(rng, config)


def apply_model(params, state, nnet_input, sequence_length, config,
                train=False, dropout_rng=None, reset_mask=None):
    _, apply_fn = get_model(config["nnet_type"])
    return apply_fn(params, state, nnet_input, sequence_length, config,
                    train=train, dropout_rng=dropout_rng,
                    reset_mask=reset_mask)
