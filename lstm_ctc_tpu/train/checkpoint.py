"""Checkpointing: params (+ model state) to a single flat .npz-style file.

The reference checkpoints *trainable variables only* with tf.train.Saver —
optimizer slots are rebuilt from scratch by every per-epoch process
(reference bin/nnet-train.py:83-95; optimizer state is never persisted,
SURVEY §5).  We keep that contract (checkpoints stay epoch-portable and
small) and optionally persist optimizer state too when asked.

File format: numpy .npz where each entry key is the '/'-joined pytree path.
Restore rebuilds values into a template pytree of identical structure (from
``init_model``), so structure mismatches fail loudly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def flatten_tree(tree) -> Dict[str, np.ndarray]:
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    flat = {}
    for path, leaf in leaves:
        key = _path_str(path)
        assert key not in flat, "duplicate checkpoint key %s" % key
        flat[key] = np.asarray(leaf)
    return flat


def unflatten_into(template, flat: Dict[str, np.ndarray]):
    """Fill a template pytree with stored arrays, validating shapes."""
    paths_and_leaves = jax.tree_util.tree_leaves_with_path(template)
    treedef = jax.tree_util.tree_structure(template)
    new_leaves = []
    for path, leaf in paths_and_leaves:
        key = _path_str(path)
        if key not in flat:
            raise KeyError("checkpoint missing parameter %r" % key)
        value = flat[key]
        if tuple(np.shape(leaf)) != tuple(value.shape):
            raise ValueError(
                "checkpoint shape mismatch for %r: %s vs %s"
                % (key, np.shape(leaf), value.shape))
        new_leaves.append(value)
    extra = set(flat) - {_path_str(p) for p, _ in paths_and_leaves}
    if extra:
        raise KeyError("checkpoint has unexpected parameters: %s"
                       % sorted(extra)[:5])
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_checkpoint(path: str, params, net_state=None, extra=None) -> None:
    arrays = {"params/" + k: v for k, v in flatten_tree(params).items()}
    if net_state:
        arrays.update({"state/" + k: v
                       for k, v in flatten_tree(net_state).items()})
    if extra:
        arrays.update({"extra/" + k: np.asarray(v)
                       for k, v in extra.items()})
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, params_template,
                    state_template=None) -> Tuple[Any, Any, Dict]:
    with np.load(path, allow_pickle=False) as data:
        stored = {k: data[k] for k in data.files}
    params_flat = {k[len("params/"):]: v for k, v in stored.items()
                   if k.startswith("params/")}
    state_flat = {k[len("state/"):]: v for k, v in stored.items()
                  if k.startswith("state/")}
    extra = {k[len("extra/"):]: v for k, v in stored.items()
             if k.startswith("extra/")}
    params = unflatten_into(params_template, params_flat)
    net_state = state_template
    if state_template is not None and state_flat:
        net_state = unflatten_into(state_template, state_flat)
    return params, net_state, extra
