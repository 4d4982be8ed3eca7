"""CTC loss — log-space forward DP over the 2U+1 label lattice.

Functional mirror of ``tf.nn.ctc_loss(..., ignore_longer_outputs_than_
inputs=True)`` as used by the reference (nnet/graph.py:109-116):

  * logits are batch-major ``[B, T, V]`` and are softmax-normalized
    internally;
  * blank is the LAST class index (the toolkit's label convention: labels
    are shifted down by one at data prep and blank occupies index V-1,
    reference egs/wsj/run_wsj_phn.sh:129-139);
  * per-sequence loss = -log p(labels | logits); the caller sums over the
    batch (graph.py:115-116);
  * infeasible pairs — more labels than frames — get zero loss and zero
    gradient (the ``ignore_longer_outputs_than_inputs`` flag, graph.py:113).
    We extend the same zeroing to pairs infeasible due to repeated labels
    (U + #repeats > T), which TF leaves as ±inf; data prep filters these
    (reference bin/convert-to-tfrecords.py:78-83) so the distinction never
    arises on real data, and finite-out is the robust choice under jit.

The DP is a ``lax.scan`` over time; each step is a vectorized band update
over ``[B, S=2U+1]`` — elementwise VPU work on TPU.  Gradients flow through
the scan via autodiff (equivalent to the beta recursion by reverse-mode).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _extended_labels(labels: jnp.ndarray, blank_id: int):
    """labels [B, U] (pad -1) → extended lattice [B, 2U+1] with blanks
    interleaved, plus per-position validity given label lengths."""
    batch, max_u = labels.shape
    ext_len = 2 * max_u + 1
    safe = jnp.maximum(labels, 0)
    ext = jnp.full((batch, ext_len), blank_id, dtype=labels.dtype)
    ext = ext.at[:, 1::2].set(safe)
    return ext


def ctc_loss(logits: jnp.ndarray,
             sequence_length: jnp.ndarray,
             labels: jnp.ndarray,
             label_length: Optional[jnp.ndarray] = None,
             blank_id: Optional[int] = None) -> jnp.ndarray:
    """Returns the per-sequence negative log-likelihood, shape [B]."""
    batch, max_t, num_classes = logits.shape
    if blank_id is None:
        blank_id = num_classes - 1
    if label_length is None:
        label_length = jnp.sum((labels >= 0).astype(jnp.int32), axis=1)
    max_u = labels.shape[1]
    ext_len = 2 * max_u + 1

    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ext = _extended_labels(labels, blank_id)                    # [B, S]

    s_range = jnp.arange(ext_len)[None, :]                      # [1, S]
    valid_s = s_range < (2 * label_length[:, None] + 1)         # [B, S]

    # skip transition allowed at odd s when label differs from two back
    ext_prev2 = jnp.concatenate(
        [jnp.full((batch, 2), -1, dtype=ext.dtype), ext[:, :-2]], axis=1)
    can_skip = (s_range % 2 == 1) & (ext != ext_prev2)          # [B, S]
    can_skip = can_skip & (s_range >= 2)

    # alpha_0: positions 0 (leading blank) and 1 (first label)
    init_mask = (s_range == 0) | ((s_range == 1) & (label_length[:, None] > 0))
    first_lp = jnp.take_along_axis(log_probs[:, 0, :], ext, axis=1)
    alpha0 = jnp.where(init_mask & valid_s, first_lp, NEG_INF)

    neg_inf = jnp.float32(NEG_INF)

    def shift_right(x, amount):
        return jnp.concatenate(
            [jnp.full((batch, amount), neg_inf), x[:, :-amount]], axis=1)

    time_mask = jnp.arange(max_t)[:, None] < sequence_length[None, :]  # [T,B]
    lp_t = jnp.moveaxis(log_probs, 1, 0)                       # [T, B, V]

    def step(alpha, inputs):
        lp, alive = inputs                                      # [B,V], [B]
        stay = alpha
        diag = shift_right(alpha, 1)
        skip = jnp.where(can_skip, shift_right(alpha, 2), neg_inf)
        stacked = jnp.stack([stay, diag, skip], axis=0)
        m = jnp.max(stacked, axis=0)
        summed = m + jnp.log(
            jnp.sum(jnp.exp(stacked - m[None]), axis=0))
        summed = jnp.where(m <= neg_inf * 0.5, neg_inf, summed)
        lp_ext = jnp.take_along_axis(lp, ext, axis=1)
        new_alpha = jnp.where(valid_s, summed + lp_ext, neg_inf)
        new_alpha = jnp.maximum(new_alpha, neg_inf)
        new_alpha = jnp.where(alive[:, None], new_alpha, alpha)
        return new_alpha, None

    alpha_final, _ = jax.lax.scan(step, alpha0, (lp_t[1:], time_mask[1:]))
    # sequences of length 0 keep alpha0; handled by feasibility mask below
    alpha_final = jnp.where((sequence_length > 0)[:, None], alpha_final,
                            alpha0)

    end = 2 * label_length                                      # [B]
    last_blank = jnp.take_along_axis(alpha_final, end[:, None], axis=1)[:, 0]
    last_label = jnp.take_along_axis(
        alpha_final, jnp.maximum(end - 1, 0)[:, None], axis=1)[:, 0]
    last_label = jnp.where(label_length > 0, last_label, neg_inf)
    m = jnp.maximum(last_blank, last_label)
    log_lik = m + jnp.log(jnp.exp(last_blank - m) + jnp.exp(last_label - m))
    log_lik = jnp.where(m <= neg_inf * 0.5, neg_inf, log_lik)

    loss = -log_lik
    # ignore_longer_outputs_than_inputs + general infeasibility → 0 loss.
    # The constant 0.0 branch of the where also kills the gradient for
    # infeasible rows, matching TF's zero-gradient behavior.
    feasible = (label_length <= sequence_length) \
        & (sequence_length > 0) & (log_lik > neg_inf * 0.5)
    return jnp.where(feasible, loss, 0.0)
