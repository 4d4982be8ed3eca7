"""Fused Pallas TPU kernel for the mixture-of-softmaxes expert mix.

The XLA path of the MoE head (reference nnet/moe.py:29-72 semantics;
models/moe.py here) materializes the ``[N, E·V]`` expert-logit tensor in
HBM three times per training step (forward write, backward read, plus the
gate-mix einsum that XLA lowers to an MXU-hostile M=1 batched matmul).
For the flagship WSJ config that tensor is ~85 MB — the single largest
known perf item of round 1 (docs/BENCHMARKS.md: MoE head ≈ 4 ms/step).

This kernel keeps the expert block entirely in VMEM:

  out[n, v] = sum_e gate[n, e] * drop(tau * tanh(x[n] @ W_e + b_e))[v]

computed over a (row blocks, expert blocks) grid; per grid step one
``[Nb, D] x [D, Eb·V]`` MXU matmul produces the expert tile, tanh + the
dropout mask + the gate weighting happen on the VPU, and a second small
matmul folds the tile into the ``[Nb, V]`` accumulator — only the mixed
logits ever reach HBM.

Expert segments are handled without lane-dim reshapes via two constant
0/1 matrices: ``R [Eb, Eb·V]`` repeats each gate column across its
expert's V-segment, ``S [Eb·V, V]`` folds segments onto output classes
(~11% extra MXU work for the flagship shape — far cheaper than the HBM
round trips it replaces).

The gate itself (softmax + gate dropout, tiny ``[N, E]``) stays in XLA so
its backward comes from autodiff; the kernel's custom VJP covers x,
w_expert, b_expert and the gate input.  Expert dropout uses a
counter-based hash (murmur3 finalizer) seeded per element from a scalar —
bitwise-identical between the forward and backward kernels, on TPU and in
interpret mode (``pltpu.prng_*`` has no CPU interpret lowering), and
reproducible in pure JAX for the parity tests.

Matmuls run in ``compute_dtype`` (bfloat16 on TPU) with float32
accumulation; x is loaded in float32 and cast in-kernel so its gradient
stays float32.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BLOCK = 256          # rows per grid step (small inputs)
N_BLOCK_BIG = 512      # rows per grid step once the row count amortizes
                       # it (fewer revisits of the weight stream; the
                       # on-chip A/B measured 512 ≥ 256 at flagship
                       # shapes and 512 composes with WRES for the best
                       # point — docs/BENCHMARKS.md round 5)


def _env_n_block(n_rows: int) -> int:
    """Row-block size: LSTM_CTC_TPU_MOE_NBLOCK overrides; otherwise
    N_BLOCK_BIG when the input has enough rows to fill several blocks
    AND rounding up to the bigger block adds no meaningful padding
    rows over the N_BLOCK default (≤ ~3% of the input); N_BLOCK
    otherwise (small inputs — batch-1 streaming / tiny tests — and
    mid-size row counts that sit awkwardly between 512 multiples,
    where the big block would burn up to 256 extra padding rows).
    The env knob is the A/B lever for scripts/ab_train_step.py.
    Must keep Np % n_block == 0 reachable via padding, so any
    positive multiple of 8 is legal."""
    import os
    env = os.environ.get("LSTM_CTC_TPU_MOE_NBLOCK", "")
    if not env:
        if n_rows >= 4 * N_BLOCK_BIG:
            extra_pad = (-n_rows % N_BLOCK_BIG) - (-n_rows % N_BLOCK)
            if extra_pad <= n_rows // 32:
                return N_BLOCK_BIG
        return N_BLOCK
    # floor to a multiple of 8 — a non-8-aligned row block fails Mosaic
    # lowering at runtime (e.g. NBLOCK=100 → 96)
    return max(8, int(env) // 8 * 8)


MAX_COLS_BLOCK = 4096  # Eb·V ceiling (VMEM guard)


def hash_uniform(seed, row0, col0, nrows, ncols):
    """Deterministic counter-based uniforms in [0, 1): murmur3 finalizer
    over (global row, global col, seed).  Pure jnp — identical inside
    Pallas kernels (TPU or interpret) and in plain XLA."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, (nrows, ncols), 0) \
        + jnp.uint32(row0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, (nrows, ncols), 1) \
        + jnp.uint32(col0)
    x = (rows * jnp.uint32(0x9E3779B1)
         + cols * jnp.uint32(0x85EBCA77)
         + seed.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return (x >> 9).astype(jnp.float32) * jnp.float32(1.0 / (1 << 23))


def expert_block_size(num_targets: int) -> int:
    """Smallest expert-block width whose column count Eb·V is a multiple
    of the 128-lane tile (keeps every block MXU-aligned)."""
    return 128 // math.gcd(num_targets, 128)


def fused_eligible(input_dim: int, num_targets: int) -> bool:
    eb = expert_block_size(num_targets)
    return eb * num_targets <= MAX_COLS_BLOCK and input_dim <= 4096


def _segment_matrices(ep: int, eb: int, v: int):
    """R [Ep, Ep·V] gate-repeat and S [Eb·V, V] fold constants.

    R is consumed in ``[Ep, Eb·V]`` column blocks: block e has ones only
    in rows [e·Eb, (e+1)·Eb), so ``gate_full @ R_block`` both repeats the
    block's gate columns across their V-segments and masks out every
    other expert — no sub-128-lane gate blocks needed (Mosaic requires
    the minor block dim to be 128-divisible or full)."""
    cols = np.arange(ep * v)
    r = (cols[None, :] // v == np.arange(ep)[:, None]).astype(np.float32)
    cols_b = np.arange(eb * v)
    s = (cols_b[:, None] % v == np.arange(v)[None, :]).astype(np.float32)
    # plain numpy, NOT jnp: the factory below is lru_cached and may first
    # run inside a jit trace — jnp ops there would bake leaked tracers
    # into the cached closure
    return r, s


@functools.lru_cache(maxsize=64)
def _make_fused(input_dim: int, num_targets: int, num_experts_padded: int,
                tau: float, keep_prob: float, compute_dtype_name: str,
                n_block: int, interpret: bool,
                wgrad_mode: str = "xla", w_resident: bool = False):
    """Builds the custom-VJP fused mix for one static configuration.

    Operates on PADDED arrays: x [Np, D] (Np % n_block == 0), w [D, Ep·V],
    b [1, Ep·V], gate [Np, Ep] (Ep % Eb == 0), seed [1] int32.  Padding /
    unpadding lives outside the VJP boundary so its adjoints come free.

    ``w_resident``: keep the full [D, Ep·V] expert weights (and the R
    gate-repeat constant) VMEM-RESIDENT via constant index maps instead
    of streaming a [D, Cb] column block per grid step.  With the
    default n-outer grid every row block re-fetches the ENTIRE weight
    matrix (flagship: ~6.6 MB bf16 × 48 row blocks ≈ 0.3 GB per
    direction, fwd + bwd ≈ 0.8 ms of pure HBM at v5e bandwidth) — the
    bulk of the MoE head's measured gap above its analytic floor.
    Kernels then slice their expert block with a dynamic pl.ds.
    Gated on the weight bytes fitting comfortably in VMEM
    (moe_mix_fused)."""
    d = input_dim
    v = num_targets
    ep = num_experts_padded
    eb = expert_block_size(v)
    cb = eb * v
    cp = ep * v
    cdt = jnp.dtype(compute_dtype_name)
    dropout = keep_prob < 1.0
    inv_kp = 1.0 / keep_prob

    if w_resident:
        def _wblk(w_ref, eblk):
            return w_ref[:, pl.ds(eblk * cb, cb)]
        _rblk = _wblk
    else:
        def _wblk(w_ref, eblk):
            return w_ref[:]
        _rblk = _wblk

    def _mask(seed, nblk, eblk):
        u = hash_uniform(seed[0], nblk * n_block, eblk * cb, n_block, cb)
        return (u < keep_prob).astype(jnp.float32) * inv_kp

    def _expert_tile(x_ref, w_ref, b_ref, seed_ref, nblk, eblk):
        """a' [Nb, Cb] = dropped tau*tanh(x @ W_blk + b_blk), plus th."""
        z = jax.lax.dot_general(
            x_ref[:].astype(cdt), _wblk(w_ref, eblk),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b_ref[:]
        th = jnp.tanh(z)
        a = tau * th
        if dropout:
            a = a * _mask(seed_ref, nblk, eblk)
        return a, th

    def _fwd_body(seed_ref, x_ref, w_ref, b_ref, gate_ref, r_ref, s_ref,
                  out_ref, th_ref=None):
        eblk = pl.program_id(1)

        @pl.when(eblk == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        a, th = _expert_tile(x_ref, w_ref, b_ref, seed_ref,
                             pl.program_id(0), eblk)
        if th_ref is not None:
            # stash tanh activations so the backward kernel skips the
            # expert-matmul recompute (bf16 HBM round-trip ≪ matmul)
            th_ref[:] = th.astype(th_ref.dtype)
        grep = jax.lax.dot_general(          # [Nb, Ep] @ [Ep, Cb] R-block
            gate_ref[:].astype(cdt), _rblk(r_ref, eblk),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] += jax.lax.dot_general(   # fold segments → classes
            (a * grep).astype(cdt), s_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def _fwd_kernel(seed_ref, x_ref, w_ref, b_ref, gate_ref, r_ref, s_ref,
                    out_ref):
        _fwd_body(seed_ref, x_ref, w_ref, b_ref, gate_ref, r_ref, s_ref,
                  out_ref)

    def _fwd_kernel_res(seed_ref, x_ref, w_ref, b_ref, gate_ref, r_ref,
                        s_ref, out_ref, th_ref):
        _fwd_body(seed_ref, x_ref, w_ref, b_ref, gate_ref, r_ref, s_ref,
                  out_ref, th_ref)

    def _dz_core(seed_ref, th_ref, gate_ref, gout_ref, r_ref, s_ref,
                 nblk, eblk):
        """Pure dz recompute for the GLOBAL tile (nblk, eblk) — grid-
        order agnostic (callers pass their own program-id mapping so the
        dropout hash mask lands on the same global offsets)."""
        th = th_ref[:].astype(jnp.float32)
        a = tau * th
        if dropout:
            a = a * _mask(seed_ref, nblk, eblk)
        # q[n, c] = gout[n, class(c)]  (broadcast into segments)
        q = jax.lax.dot_general(
            gout_ref[:].astype(cdt), s_ref[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        grep = jax.lax.dot_general(
            gate_ref[:].astype(cdt), _rblk(r_ref, eblk),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dz = grep * q * (tau * (1.0 - th * th))
        if dropout:
            dz = dz * _mask(seed_ref, nblk, eblk)
        return dz, q, a

    def _bwd_dz(seed_ref, th_ref, w_ref, gate_ref, gout_ref, r_ref, s_ref,
                dx_ref, dgate_ref):
        """Shared backward math → dz for this (nblk, eblk) tile; also
        accumulates dx and dgate in place."""
        nblk = pl.program_id(0)
        eblk = pl.program_id(1)

        @pl.when(eblk == 0)
        def _():
            dx_ref[:] = jnp.zeros_like(dx_ref)
            dgate_ref[:] = jnp.zeros_like(dgate_ref)

        dz, q, a = _dz_core(seed_ref, th_ref, gate_ref, gout_ref,
                            r_ref, s_ref, nblk, eblk)
        # dgate[n, e] += sum_{c in segment e} q * a'  (the R block zeroes
        # every expert outside this e-block, so += lands only there)
        dgate_ref[:] += jax.lax.dot_general(
            (q * a).astype(cdt), _rblk(r_ref, eblk),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx_ref[:] += jax.lax.dot_general(    # [Nb, Cb] @ [D, Cb]^T
            dz.astype(cdt), _wblk(w_ref, eblk),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dz

    def _bwd_kernel(seed_ref, th_ref, w_ref, gate_ref, gout_ref,
                    r_ref, s_ref, dx_ref, dgate_ref, dz_ref):
        # default backward: emit the dz stream; wgrad is one XLA matmul
        # over it outside the kernel.  MEASURED ~23 ms/step faster than
        # the in-kernel accumulator variant below on v5e (flagship head
        # shapes): the [D, Ep·V] resident dw buffer serializes the grid
        # on a read-modify-write carry, killing the DMA/compute overlap.
        dz = _bwd_dz(seed_ref, th_ref, w_ref, gate_ref, gout_ref,
                     r_ref, s_ref, dx_ref, dgate_ref)
        dz_ref[:] = dz.astype(dz_ref.dtype)

    def _bwd_kernel_noemit(seed_ref, th_ref, w_ref, gate_ref, gout_ref,
                           r_ref, s_ref, dx_ref, dgate_ref):
        # twokernel variant, pass 1: dx + dgate only; no dz stream at
        # all (pass 2 recomputes dz with an e-major grid for the wgrad)
        _bwd_dz(seed_ref, th_ref, w_ref, gate_ref, gout_ref,
                r_ref, s_ref, dx_ref, dgate_ref)

    def _wgrad_kernel(seed_ref, x_ref, th_ref, gate_ref, gout_ref,
                      r_ref, s_ref, dw_ref, db_ref):
        # twokernel variant, pass 2: grid (e, n) with n INNERMOST, so
        # the (0, e)-indexed dw/db blocks see CONSECUTIVE revisits and
        # accumulate in VMEM without the whole-grid read-modify-write
        # carry that sank the single-kernel accumulator (see below)
        eblk = pl.program_id(0)
        nblk = pl.program_id(1)

        @pl.when(nblk == 0)
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)
            db_ref[:] = jnp.zeros_like(db_ref)

        dz, _, _ = _dz_core(seed_ref, th_ref, gate_ref, gout_ref,
                            r_ref, s_ref, nblk, eblk)
        dzc = dz.astype(cdt)
        dw_ref[:] += jax.lax.dot_general(
            x_ref[:].astype(cdt), dzc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db_ref[:] += jnp.sum(dz, axis=0, keepdims=True)

    def _bwd_kernel_wgrad(seed_ref, x_ref, th_ref, w_ref, gate_ref,
                          gout_ref, r_ref, s_ref, dx_ref, dgate_ref,
                          dw_ref, db_ref):
        # opt-in variant (LSTM_CTC_TPU_MOE_WGRAD=kernel): fold wgrad into
        # the kernel via a VMEM-resident accumulator.  Saves the dz HBM
        # round-trip on paper but measures far slower (see above) —
        # kept for future Mosaic revisions / offline tuning only.
        nblk = pl.program_id(0)
        eblk = pl.program_id(1)

        @pl.when((nblk == 0) & (eblk == 0))
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)
            db_ref[:] = jnp.zeros_like(db_ref)

        dz = _bwd_dz(seed_ref, th_ref, w_ref, gate_ref, gout_ref,
                     r_ref, s_ref, dx_ref, dgate_ref)
        dzc = dz.astype(cdt)
        dw_ref[:, pl.ds(eblk * cb, cb)] += jax.lax.dot_general(
            x_ref[:].astype(cdt), dzc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db_ref[:, pl.ds(eblk * cb, cb)] += jnp.sum(
            dz, axis=0, keepdims=True)

    r_mat, s_mat = _segment_matrices(ep, eb, v)
    r_mat = r_mat.astype(cdt)          # numpy cast (ml_dtypes bfloat16)
    s_mat = s_mat.astype(cdt)

    def _w_spec(stream_map):
        if w_resident:
            return pl.BlockSpec((d, cp), lambda *g: (0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((d, cb), stream_map,
                            memory_space=pltpu.VMEM)

    def _r_spec(stream_map):
        if w_resident:
            return pl.BlockSpec((ep, cp), lambda *g: (0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((ep, cb), stream_map,
                            memory_space=pltpu.VMEM)

    # resident w (bf16) + R + generous stream double-buffers; the
    # streamed layout keeps the (smaller) defaults
    _res_params = pltpu.CompilerParams(
        vmem_limit_bytes=64 * 1024 * 1024) if w_resident else None

    def _pallas_fwd(x, w, b, gate, seed, with_residuals):
        np_ = x.shape[0]
        grid = (np_ // n_block, ep // eb)
        out_specs = pl.BlockSpec((n_block, v), lambda n, e: (n, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((np_, v), jnp.float32)
        if with_residuals:
            out_specs = [out_specs,
                         pl.BlockSpec((n_block, cb), lambda n, e: (n, e),
                                      memory_space=pltpu.VMEM)]
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((np_, cp), cdt)]
        return pl.pallas_call(
            _fwd_kernel_res if with_residuals else _fwd_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((n_block, d), lambda n, e: (n, 0),
                             memory_space=pltpu.VMEM),
                _w_spec(lambda n, e: (0, e)),
                pl.BlockSpec((1, cb), lambda n, e: (0, e),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_block, ep), lambda n, e: (n, 0),
                             memory_space=pltpu.VMEM),
                _r_spec(lambda n, e: (0, e)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=_res_params,
            interpret=interpret,
        )(seed, x, w, b, gate, r_mat, s_mat)

    def _pallas_bwd(th, w, gate, seed, gout):
        np_ = th.shape[0]
        grid = (np_ // n_block, ep // eb)
        return pl.pallas_call(
            _bwd_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((n_block, cb), lambda n, e: (n, e),
                             memory_space=pltpu.VMEM),
                _w_spec(lambda n, e: (0, e)),
                pl.BlockSpec((n_block, ep), lambda n, e: (n, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_block, v), lambda n, e: (n, 0),
                             memory_space=pltpu.VMEM),
                _r_spec(lambda n, e: (0, e)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((n_block, d), lambda n, e: (n, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_block, ep), lambda n, e: (n, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_block, cb), lambda n, e: (n, e),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((np_, d), jnp.float32),
                jax.ShapeDtypeStruct((np_, ep), jnp.float32),
                jax.ShapeDtypeStruct((np_, cp), cdt),
            ],
            # the backward holds the same resident w + R as the forward
            # (plus its own streams), so it needs the same raised budget
            compiler_params=_res_params,
            interpret=interpret,
        )(seed, th, w, gate, gout, r_mat, s_mat)

    def _pallas_bwd_wgrad(x, th, w, gate, seed, gout):
        np_ = th.shape[0]
        grid = (np_ // n_block, ep // eb)
        return pl.pallas_call(
            _bwd_kernel_wgrad,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((n_block, d), lambda n, e: (n, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_block, cb), lambda n, e: (n, e),
                             memory_space=pltpu.VMEM),
                _w_spec(lambda n, e: (0, e)),
                pl.BlockSpec((n_block, ep), lambda n, e: (n, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_block, v), lambda n, e: (n, 0),
                             memory_space=pltpu.VMEM),
                _r_spec(lambda n, e: (0, e)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((n_block, d), lambda n, e: (n, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_block, ep), lambda n, e: (n, 0),
                             memory_space=pltpu.VMEM),
                # constant index maps: dw/db stay resident in VMEM for
                # the whole grid and flush once
                pl.BlockSpec((d, cp), lambda n, e: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cp), lambda n, e: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((np_, d), jnp.float32),
                jax.ShapeDtypeStruct((np_, ep), jnp.float32),
                jax.ShapeDtypeStruct((d, cp), jnp.float32),
                jax.ShapeDtypeStruct((1, cp), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                # the resident [D, Ep·V] f32 dw buffer (~15 MB flagship)
                # plus double-buffered streams exceed the 16 MB default;
                # +32 MB headroom when w/R are also VMEM-resident
                vmem_limit_bytes=(112 if w_resident else 80)
                * 1024 * 1024),
            interpret=interpret,
        )(seed, x, th, w, gate, gout, r_mat, s_mat)

    def _pallas_bwd_noemit(th, w, gate, seed, gout):
        np_ = th.shape[0]
        grid = (np_ // n_block, ep // eb)
        return pl.pallas_call(
            _bwd_kernel_noemit,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((n_block, cb), lambda n, e: (n, e),
                             memory_space=pltpu.VMEM),
                _w_spec(lambda n, e: (0, e)),
                pl.BlockSpec((n_block, ep), lambda n, e: (n, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_block, v), lambda n, e: (n, 0),
                             memory_space=pltpu.VMEM),
                _r_spec(lambda n, e: (0, e)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((n_block, d), lambda n, e: (n, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_block, ep), lambda n, e: (n, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((np_, d), jnp.float32),
                jax.ShapeDtypeStruct((np_, ep), jnp.float32),
            ],
            compiler_params=_res_params,   # resident w + R, as in fwd
            interpret=interpret,
        )(seed, th, w, gate, gout, r_mat, s_mat)

    def _pallas_wgrad(x, th, gate, seed, gout):
        np_ = th.shape[0]
        # e OUTER, n INNER: the (0, e)-indexed dw/db output blocks see
        # consecutive revisits over n, so Mosaic accumulates them in
        # VMEM and flushes once per e block — no whole-grid carry
        grid = (ep // eb, np_ // n_block)
        return pl.pallas_call(
            _wgrad_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((n_block, d), lambda e, n: (n, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_block, cb), lambda e, n: (n, e),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_block, ep), lambda e, n: (n, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_block, v), lambda e, n: (n, 0),
                             memory_space=pltpu.VMEM),
                _r_spec(lambda e, n: (0, e)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((d, cb), lambda e, n: (0, e),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cb), lambda e, n: (0, e),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((d, cp), jnp.float32),
                jax.ShapeDtypeStruct((1, cp), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(seed, x, th, gate, gout, r_mat, s_mat)

    @jax.custom_vjp
    def fused(x, w, b, gate, seed):
        return _pallas_fwd(x, w, b, gate, seed, with_residuals=False)

    def fused_fwd(x, w, b, gate, seed):
        out, th = _pallas_fwd(x, w, b, gate, seed, with_residuals=True)
        return out, (x, w, gate, seed, th)

    def fused_bwd(res, gout):
        x, w, gate, seed, th = res
        if wgrad_mode == "kernel":
            dx, dgate, dw, db = _pallas_bwd_wgrad(x, th, w, gate, seed,
                                                  gout)
        elif wgrad_mode == "twokernel":
            dx, dgate = _pallas_bwd_noemit(th, w, gate, seed, gout)
            dw, db = _pallas_wgrad(x, th, gate, seed, gout)
        else:
            dx, dgate, dz = _pallas_bwd(th, w, gate, seed, gout)
            # weight/bias grads: plain MXU matmul over the emitted dz —
            # measured cheaper in XLA than the in-kernel accumulator
            dw = jax.lax.dot_general(
                x.astype(cdt), dz, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db = jnp.sum(dz.astype(jnp.float32), axis=0, keepdims=True)
        return dx, dw.astype(w.dtype), db, dgate, None

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def moe_mix_fused(x: jnp.ndarray,
                  w_expert: jnp.ndarray,
                  b_expert: jnp.ndarray,
                  gate: jnp.ndarray,
                  num_experts: int,
                  moe_temperature: float,
                  keep_prob: float = 1.0,
                  seed=None,
                  compute_dtype=jnp.bfloat16,
                  n_block=None,
                  interpret: bool = False) -> jnp.ndarray:
    """Mixed logits [N, V] = sum_e gate[:, e] * drop(tau tanh(x W_e + b_e)).

    x [N, D] float32, w_expert [D, E·V], b_expert [E·V], gate [N, E]
    (already softmaxed and gate-dropped).  ``seed`` (int32 scalar/[1])
    drives the expert-logit dropout when keep_prob < 1.

    ``LSTM_CTC_TPU_MOE_WGRAD`` selects the weight-gradient path:
    unset/"xla" = emitted-dz + one XLA matmul (shipped default);
    "twokernel" = a second Pallas pass with an e-major grid that
    recomputes dz and accumulates dw/db in VMEM (legal consecutive
    revisits — no dz stream at all); "kernel" = the single-kernel
    whole-grid accumulator (measured far slower; kept for reference).
    """
    import os
    wgrad_mode = os.environ.get("LSTM_CTC_TPU_MOE_WGRAD", "xla") or "xla"
    if wgrad_mode not in ("xla", "kernel", "twokernel"):
        wgrad_mode = "xla"
    n, d = x.shape
    if n_block is None:
        n_block = _env_n_block(n)
    v = w_expert.shape[1] // num_experts
    eb = expert_block_size(v)
    ep = -(-num_experts // eb) * eb
    np_rows = -(-n // n_block) * n_block
    # VMEM-resident expert weights (LSTM_CTC_TPU_MOE_WRES, see
    # _make_fused): eliminates the per-row-block re-stream of the full
    # [D, Ep·V] weights.  SHIPPED DEFAULT ON since the on-chip A/B
    # (wres + n_block 512 wins every interleaved rep at flagship
    # shapes, docs/BENCHMARKS.md round 5); set the env to 0 for the
    # streamed-block layout.  Auto-gated on the resident bytes (w in
    # compute dtype + the R constant) fitting well under the VMEM
    # budget alongside the streamed blocks.
    res_bytes = (d + ep) * ep * v * jnp.dtype(compute_dtype).itemsize
    w_resident = (os.environ.get("LSTM_CTC_TPU_MOE_WRES", "1") == "1"
                  and res_bytes <= 32 * 1024 * 1024)

    w = w_expert.reshape(d, num_experts, v)
    w = jnp.pad(w, ((0, 0), (0, ep - num_experts), (0, 0)))
    w = w.reshape(d, ep * v).astype(compute_dtype)
    b = b_expert.reshape(1, num_experts, v)
    b = jnp.pad(b, ((0, 0), (0, ep - num_experts), (0, 0)))
    b = b.reshape(1, ep * v).astype(jnp.float32)
    gate_p = jnp.pad(gate.astype(jnp.float32),
                     ((0, np_rows - n), (0, ep - num_experts)))
    x_p = jnp.pad(x.astype(jnp.float32), ((0, np_rows - n), (0, 0)))
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape((1,))

    fused = _make_fused(d, v, ep, float(moe_temperature), float(keep_prob),
                        jnp.dtype(compute_dtype).name, n_block,
                        bool(interpret), wgrad_mode, w_resident)
    out = fused(x_p, w, b, gate_p, seed)
    return out[:n]


def moe_mix_sharded(mesh,
                    x: jnp.ndarray,
                    w_expert: jnp.ndarray,
                    b_expert: jnp.ndarray,
                    gate: jnp.ndarray,
                    num_experts: int,
                    moe_temperature: float,
                    keep_prob: float = 1.0,
                    seed=None,
                    compute_dtype=jnp.bfloat16,
                    n_block=None,
                    interpret: bool = False) -> jnp.ndarray:
    """Data-parallel wrapper: the fused expert-mix kernel runs per-shard
    under ``shard_map`` over the row axis of ``x``/``gate`` with the
    expert weights replicated.

    GSPMD cannot partition a custom call: a raw ``pallas_call`` inside a
    jit over a multi-device mesh would be ALL-GATHERED onto every device
    — for the flagship model that is the dominant matmul of the whole
    network, so replication forfeits DP scaling exactly where it matters
    (same rationale as lstm_pallas.bilstm_dual_scan_sharded).
    shard_map's transpose psums the weight cotangents across the mesh,
    which is the DP gradient all-reduce.

    Requires ``x.shape[0] % mesh.size == 0`` (callers fall back to the
    plain XLA mix otherwise — GSPMD partitions that fine).  When
    keep_prob < 1, each shard offsets the dropout seed by its mesh
    position: the kernel's hash counter indexes LOCAL rows, which repeat
    per shard and would otherwise produce identical masks everywhere.
    """
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    dp, rep = P(axis), P()
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))

    def per_shard(xs, w, b, gs, sd):
        if keep_prob < 1.0:
            sd = sd + jax.lax.axis_index(axis).astype(jnp.int32) * 7919
        return moe_mix_fused(
            xs, w, b, gs, num_experts, moe_temperature,
            keep_prob=keep_prob, seed=sd, compute_dtype=compute_dtype,
            n_block=n_block, interpret=interpret)

    return jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(dp, rep, rep, dp, rep),
        out_specs=dp,
        check_vma=False,
    )(x, w_expert, b_expert, gate, seed)


def moe_mix_reference(x, w_expert, b_expert, gate, num_experts,
                      moe_temperature, keep_prob=1.0, seed=None,
                      n_block: int = N_BLOCK):
    """Pure-JAX mirror of the fused kernel INCLUDING its hash-based expert
    dropout (same padded global indices) — the test oracle for kp < 1."""
    n, d = x.shape
    v = w_expert.shape[1] // num_experts
    eb = expert_block_size(v)
    ep = -(-num_experts // eb) * eb
    np_rows = -(-n // n_block) * n_block

    w = w_expert.reshape(d, num_experts, v)
    w = jnp.pad(w, ((0, 0), (0, ep - num_experts), (0, 0)))
    w = w.reshape(d, ep * v)
    b = b_expert.reshape(num_experts, v)
    b = jnp.pad(b, ((0, ep - num_experts), (0, 0))).reshape(ep * v)
    gate_p = jnp.pad(gate, ((0, 0), (0, ep - num_experts)))

    a = moe_temperature * jnp.tanh(x @ w + b[None, :])     # [N, Ep·V]
    if keep_prob < 1.0:
        seed = jnp.asarray(seed, jnp.int32).reshape((1,))
        u = hash_uniform(seed[0], 0, 0, np_rows, ep * v)[:n]
        a = a * (u < keep_prob).astype(jnp.float32) / keep_prob
    a = a.reshape(n, ep, v)
    return jnp.einsum("ne,nev->nv", gate_p, a)
