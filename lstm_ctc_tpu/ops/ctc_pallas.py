"""Pallas TPU kernels for the CTC forward/backward DP.

The XLA ``lax.scan`` versions in ops/ctc.py spend most of their time on
per-step loop overhead: each step is a tiny banded [B, 2U+1] update (pure
VPU work, microseconds of math).  These kernels run the *entire* time loop
inside one Pallas program with every buffer resident in VMEM, processing
time in blocks carried through scratch across a sequential grid — the
same recurrence, no per-step dispatch.

Used by ops/ctc.py when the lattice fits the VMEM budget (typical acoustic
shapes); the scan implementation remains the fallback and the reference
for the parity tests.  Interpret mode makes the kernels testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# time steps per grid step: amortizes grid overhead, bounds VMEM blocks
TIME_BLOCK = 64


def _log3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))
    return jnp.where(m <= NEG_INF * 0.5, NEG_INF, out)


def _shift_right(x, amount):
    pad = jnp.full(x.shape[:-1] + (amount,), NEG_INF, x.dtype)
    return jnp.concatenate([pad, x[..., :-amount]], axis=-1)


def _shift_left(x, amount):
    pad = jnp.full(x.shape[:-1] + (amount,), NEG_INF, x.dtype)
    return jnp.concatenate([x[..., amount:], pad], axis=-1)


def _alpha_kernel(lp_ref, mask_ref, valid_ref, skip_ref, init_ref,
                  alpha_out_ref, carry_ref):
    """One (batch block, time block) tile of the alpha recursion.

    Grid is (batch blocks, time blocks) with time innermost: each batch
    block runs its full time recursion sequentially with the carry in
    scratch, re-initialized when the time index wraps to 0."""
    blk = pl.program_id(1)

    @pl.when(blk == 0)
    def _():
        carry_ref[:] = init_ref[:]

    valid = valid_ref[:] > 0.5
    can_skip = skip_ref[:] > 0.5

    def body(tt, alpha):
        # global step index: blk*time_block + tt; step 0 is the init row
        is_first = jnp.logical_and(blk == 0, tt == 0)
        summed = _log3(alpha, _shift_right(alpha, 1),
                       jnp.where(can_skip, _shift_right(alpha, 2),
                                 NEG_INF))
        new_alpha = jnp.where(valid, summed + lp_ref[tt], NEG_INF)
        alive = mask_ref[tt] > 0.5                   # [B, 1]
        new_alpha = jnp.where(alive, new_alpha, alpha)
        new_alpha = jnp.where(is_first, alpha, new_alpha)
        alpha_out_ref[tt] = new_alpha
        return new_alpha

    carry_ref[:] = jax.lax.fori_loop(0, lp_ref.shape[0], body, carry_ref[:])


def _beta_kernel(lp_ref, mask_ref, islast_ref, valid_ref, skipfrom_ref,
                 final_ref, beta_out_ref, carry_ref):
    """One (batch block, time block) tile of the beta recursion over
    time-reversed inputs; same grid layout as ``_alpha_kernel``."""
    blk = pl.program_id(1)

    @pl.when(blk == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref, NEG_INF)

    valid = valid_ref[:] > 0.5
    skip_from = skipfrom_ref[:] > 0.5
    final_mask = final_ref[:] > 0.5

    def body(tt, beta):
        lp = lp_ref[tt]
        init = jnp.where(jnp.logical_and(final_mask, valid), lp, NEG_INF)
        moved = _log3(beta, _shift_left(beta, 1),
                      jnp.where(skip_from, _shift_left(beta, 2), NEG_INF))
        new_beta = jnp.where(valid, moved + lp, NEG_INF)
        is_last = islast_ref[tt] > 0.5               # [B, 1]
        new_beta = jnp.where(is_last, init, new_beta)
        alive = mask_ref[tt] > 0.5
        new_beta = jnp.where(alive, new_beta, beta)
        beta_out_ref[tt] = new_beta
        return new_beta

    carry_ref[:] = jax.lax.fori_loop(0, lp_ref.shape[0], body, carry_ref[:])


def _pad_axis(x, padded, axis):
    pad = padded - x.shape[axis]
    if pad == 0:
        return x
    shape = list(x.shape)
    shape[axis] = pad
    return jnp.concatenate([x, jnp.zeros(shape, x.dtype)], axis=axis)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "time_block",
                                    "batch_block"))
def alpha_pallas(lp_ext, time_mask, valid, can_skip, alpha0,
                 interpret=False, time_block=TIME_BLOCK,
                 batch_block=None):
    """lp_ext [T,B,S], time_mask [T,B], valid/can_skip [B,S], alpha0 [B,S]
    → alpha_all [T,B,S] (alpha at every step; row 0 == alpha0).

    ``batch_block`` tiles the batch axis so large-B lattices still fit
    VMEM; padded rows carry valid=0 and are sliced away."""
    max_t, batch, ext_len = lp_ext.shape
    if batch_block is None or batch_block > batch:
        batch_block = batch
    padded_t = -(-max_t // time_block) * time_block
    padded_b = -(-batch // batch_block) * batch_block
    lp = _pad_axis(_pad_axis(lp_ext, padded_t, 0), padded_b, 1)
    mask = _pad_axis(_pad_axis(time_mask.astype(jnp.float32), padded_t, 0),
                     padded_b, 1)[..., None]
    valid_f = _pad_axis(valid.astype(jnp.float32), padded_b, 0)
    skip_f = _pad_axis(can_skip.astype(jnp.float32), padded_b, 0)
    alpha0_p = _pad_axis(alpha0, padded_b, 0)
    out = pl.pallas_call(
        _alpha_kernel,
        grid=(padded_b // batch_block, padded_t // time_block),
        in_specs=[
            pl.BlockSpec((time_block, batch_block, ext_len),
                         lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((time_block, batch_block, 1),
                         lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_block, ext_len), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_block, ext_len), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_block, ext_len), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((time_block, batch_block, ext_len),
                               lambda b, t: (t, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded_t, padded_b, ext_len),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((batch_block, ext_len), jnp.float32)],
        interpret=interpret,
    )(lp, mask, valid_f, skip_f, alpha0_p)
    return out[:max_t, :batch]


@functools.partial(jax.jit,
                   static_argnames=("interpret", "time_block",
                                    "batch_block"))
def beta_pallas(lp_ext, time_mask, is_last, valid, skip_from, final_mask,
                interpret=False, time_block=TIME_BLOCK,
                batch_block=None):
    """Reverse-time beta' recursion (emission included); returns
    beta_all [T,B,S] in forward time order."""
    max_t, batch, ext_len = lp_ext.shape
    if batch_block is None or batch_block > batch:
        batch_block = batch
    padded_t = -(-max_t // time_block) * time_block
    padded_b = -(-batch // batch_block) * batch_block
    # reverse time, pad at the (now trailing) start
    lp = _pad_axis(_pad_axis(lp_ext[::-1], padded_t, 0), padded_b, 1)
    mask = _pad_axis(
        _pad_axis(time_mask[::-1].astype(jnp.float32), padded_t, 0),
        padded_b, 1)[..., None]
    last = _pad_axis(
        _pad_axis(is_last[::-1].astype(jnp.float32), padded_t, 0),
        padded_b, 1)[..., None]
    valid_f = _pad_axis(valid.astype(jnp.float32), padded_b, 0)
    skipf_f = _pad_axis(skip_from.astype(jnp.float32), padded_b, 0)
    final_f = _pad_axis(final_mask.astype(jnp.float32), padded_b, 0)
    out = pl.pallas_call(
        _beta_kernel,
        grid=(padded_b // batch_block, padded_t // time_block),
        in_specs=[
            pl.BlockSpec((time_block, batch_block, ext_len),
                         lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((time_block, batch_block, 1),
                         lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((time_block, batch_block, 1),
                         lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_block, ext_len), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_block, ext_len), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_block, ext_len), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((time_block, batch_block, ext_len),
                               lambda b, t: (t, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded_t, padded_b, ext_len),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((batch_block, ext_len), jnp.float32)],
        interpret=interpret,
    )(lp, mask, last, valid_f, skipf_f, final_f)
    return out[:max_t, :batch][::-1]
