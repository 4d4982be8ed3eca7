"""Pallas TPU whole-sequence kernel for the dual-direction LSTM scan.

The XLA ``lax.scan`` path (models/cells.py bilstm_dual_scan) pays ~8 µs
of per-step overhead around ~2 µs of MXU work at acoustic batch sizes —
the dominant cost of the whole model (4 layer-pairs × T sequential
steps).  This kernel runs the entire time loop inside one Pallas program
with the recurrent weights resident in VMEM: gates_x (the precomputed
input projection) streams through in time blocks, the carried (c, h)
live in scratch, and each step issues two recurrent matmuls plus the
gate math with no per-step dispatch.

Semantics mirror the TF1 LSTMCell stack exactly (peepholes, runtime
forget-gate bias, TF gate order i, j, f, o, projection, dynamic_rnn
masking — reference nnet/bilstm.py:125-188); the two directions are
stacked on the row axis ([2B, ·]) so direction never needs a gather.

Backward: a second whole-sequence kernel runs the reverse recurrence,
recomputing each step's gate activations from the stored per-step
(c, h) states (bf16) and the streamed gates_x — matmul-level remat with
weight gradients accumulated in VMEM scratch.  wx/bias gradients come
from the emitted dgates via one large XLA matmul, exactly like the
forward input projection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TIME_BLOCK = 32


def _kernel_unroll():
    """Unroll factor for the sequential in-kernel time loops
    (LSTM_CTC_TPU_KERNEL_UNROLL, default 1).  Semantics-preserving —
    trades Mosaic loop/index overhead for code size, the same lever
    that won ~10% on the XLA scan (docs/BENCHMARKS.md unroll rows).

    Mosaic's fori_loop lowering only supports unroll=1 or a FULL unroll
    of the loop (measured: partial factors raise NotImplementedError at
    lowering), so any value > 1 here means "fully unroll the in-block
    time loop" — the callers pass it through to lax.fori_loop(...,
    unroll=) after clamping to the actual step count."""
    import os
    return max(1, int(os.environ.get("LSTM_CTC_TPU_KERNEL_UNROLL",
                                     "1") or "1"))


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _make_fwd_kernel(batch, num_units, out_dim, forget_bias, use_peep,
                     use_proj, cdt, use_reset=False, unroll=1):
    h4 = 4 * num_units

    def kernel(gx_ref, mask_ref, whf_ref, whb_ref, projf_ref, projb_ref,
               wi_ref, wf_ref, wo_ref,
               out_ref, call_ref, hall_ref, cfin_ref, hfin_ref,
               c_ref, h_ref):
        blk = pl.program_id(0)
        nblk = pl.num_programs(0)

        @pl.when(blk == 0)
        def _():
            c_ref[:] = jnp.zeros_like(c_ref)
            h_ref[:] = jnp.zeros_like(h_ref)

        def step(tt, carry):
            c, h = carry                         # [2B, H], [2B, P]
            if use_reset:
                # packed rows: zero the carry at segment starts
                kp = mask_ref[tt][:, 1:2]
                c = kp * c
                h = kp * h
            hf = h[:batch].astype(cdt)
            hb = h[batch:].astype(cdt)
            rec_f = jax.lax.dot_general(
                hf, whf_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            rec_b = jax.lax.dot_general(
                hb, whb_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            gates = gx_ref[tt].astype(jnp.float32) \
                + jnp.concatenate([rec_f, rec_b], axis=0)
            i = gates[:, 0 * num_units:1 * num_units]
            j = gates[:, 1 * num_units:2 * num_units]
            f = gates[:, 2 * num_units:3 * num_units]
            o = gates[:, 3 * num_units:4 * num_units]
            if use_peep:
                i = i + wi_ref[:] * c
                f = f + wf_ref[:] * c
            c_new = (_sigmoid(f + forget_bias) * c
                     + _sigmoid(i) * jnp.tanh(j))
            if use_peep:
                o = o + wo_ref[:] * c_new
            out = _sigmoid(o) * jnp.tanh(c_new)  # [2B, H]
            if use_proj:
                out = jnp.concatenate([
                    jax.lax.dot_general(
                        out[:batch].astype(cdt), projf_ref[:],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32),
                    jax.lax.dot_general(
                        out[batch:].astype(cdt), projb_ref[:],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)], axis=0)
            m = mask_ref[tt][:, 0:1]             # [2B, 1]
            c_next = m * c_new + (1.0 - m) * c
            h_next = m * out + (1.0 - m) * h
            out_ref[tt] = (m * out).astype(out_ref.dtype)
            call_ref[tt] = c_next.astype(call_ref.dtype)
            hall_ref[tt] = h_next.astype(hall_ref.dtype)
            return c_next, h_next

        c, h = jax.lax.fori_loop(
            0, gx_ref.shape[0], step, (c_ref[:], h_ref[:]),
            unroll=gx_ref.shape[0] if unroll > 1 else 1)
        c_ref[:] = c
        h_ref[:] = h

        @pl.when(blk == nblk - 1)
        def _():
            cfin_ref[:] = c
            hfin_ref[:] = h

    return kernel


def _make_bwd_kernel(batch, num_units, out_dim, forget_bias, use_peep,
                     use_proj, cdt, use_reset=False,
                     fold_dx=False, d_in=0, unroll=1):
    """Reverse-time backward: recomputes gate activations from the stored
    previous-step states.

    The sequential fori loop carries only (dc, dh) and keeps just the six
    chain-critical matmuls per step (gate recompute ×2, projection dgrad
    ×2, recurrent dgrad ×2).  Weight-gradient accumulation is hoisted to
    BLOCK level: the loop stashes the per-step tensors it needs (c_new,
    pre-projection out, projected-output cotangent) in VMEM scratch, and
    after the loop one large [tb·B, ·]ᵀ×[tb·B, ·] matmul per direction
    accumulates wh̄/P̄ (peephole grads reduce elementwise) — big MXU
    shapes off the latency-bound critical path.

    ``fold_dx``: additionally consume the layer input stream (xt) and
    the input-projection weights, emitting the INPUT cotangent dxt
    directly plus VMEM-accumulated wx̄/bias̄ — replacing the emitted
    dgates stream ([T, 2B, 4H]) and its two XLA re-reads with a dxt
    stream ([T, 2B, D], typically half the bytes in bf16).  Requires
    d_in to be lane-aligned (128-divisible)."""
    h4 = 4 * num_units

    def kernel(*refs):
        it = iter(refs)
        gx_ref = next(it)
        mask_ref = next(it)
        cprev_ref = next(it)
        hprev_ref = next(it)
        xt_ref = next(it) if fold_dx else None
        whf_ref = next(it)
        whb_ref = next(it)
        projf_ref = next(it)
        projb_ref = next(it)
        wi_ref = next(it)
        wf_ref = next(it)
        wo_ref = next(it)
        wxf_ref = next(it) if fold_dx else None
        wxb_ref = next(it) if fold_dx else None
        dout_ref = next(it)
        dcfin_ref = next(it)
        dhfin_ref = next(it)
        dgx_ref = None if fold_dx else next(it)   # emitted dgates stream
        dxt_ref = next(it) if fold_dx else None   # emitted input cotangent
        dwhf_ref = next(it)
        dwhb_ref = next(it)
        dprojf_ref = next(it)
        dprojb_ref = next(it)
        dwi_ref = next(it)
        dwf_ref = next(it)
        dwo_ref = next(it)
        dwxf_ref = next(it) if fold_dx else None
        dwxb_ref = next(it) if fold_dx else None
        dbf_ref = next(it) if fold_dx else None
        dbb_ref = next(it) if fold_dx else None
        dc_ref = next(it)
        dh_ref = next(it)
        awhf_ref = next(it)
        awhb_ref = next(it)
        aprojf_ref = next(it)
        aprojb_ref = next(it)
        awi_ref = next(it)
        awf_ref = next(it)
        awo_ref = next(it)
        cnew_ref = next(it)
        outp_ref = next(it)
        doutp_ref = next(it)
        dgs_ref = next(it) if fold_dx else dgx_ref  # block-local dgates
        awxf_ref = next(it) if fold_dx else None
        awxb_ref = next(it) if fold_dx else None
        abf_ref = next(it) if fold_dx else None
        abb_ref = next(it) if fold_dx else None

        blk = pl.program_id(0)
        nblk = pl.num_programs(0)

        @pl.when(blk == 0)
        def _():
            # reverse sweep starts from the final-state cotangents
            dc_ref[:] = dcfin_ref[:]
            dh_ref[:] = dhfin_ref[:]
            awhf_ref[:] = jnp.zeros_like(awhf_ref)
            awhb_ref[:] = jnp.zeros_like(awhb_ref)
            if use_proj:
                aprojf_ref[:] = jnp.zeros_like(aprojf_ref)
                aprojb_ref[:] = jnp.zeros_like(aprojb_ref)
            if use_peep:
                awi_ref[:] = jnp.zeros_like(awi_ref)
                awf_ref[:] = jnp.zeros_like(awf_ref)
                awo_ref[:] = jnp.zeros_like(awo_ref)
            if fold_dx:
                awxf_ref[:] = jnp.zeros_like(awxf_ref)
                awxb_ref[:] = jnp.zeros_like(awxb_ref)
                abf_ref[:] = jnp.zeros_like(abf_ref)
                abb_ref[:] = jnp.zeros_like(abb_ref)

        def step(tt, carry):
            dc, dh = carry                       # [2B, H], [2B, P]
            c_prev = cprev_ref[tt].astype(jnp.float32)
            h_prev = hprev_ref[tt].astype(jnp.float32)
            m = mask_ref[tt][:, 0:1]             # [2B, 1]
            if use_reset:
                # forward zeroed the carry at segment starts: mirror it
                # on the recomputed states and on the outgoing cotangents
                kp = mask_ref[tt][:, 1:2]
                c_prev = kp * c_prev
                h_prev = kp * h_prev

            # --- recompute forward step t ---
            hf = h_prev[:batch].astype(cdt)
            hb = h_prev[batch:].astype(cdt)
            rec_f = jax.lax.dot_general(
                hf, whf_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            rec_b = jax.lax.dot_general(
                hb, whb_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            gates = gx_ref[tt].astype(jnp.float32) \
                + jnp.concatenate([rec_f, rec_b], axis=0)
            i = gates[:, 0 * num_units:1 * num_units]
            j = gates[:, 1 * num_units:2 * num_units]
            f = gates[:, 2 * num_units:3 * num_units]
            o = gates[:, 3 * num_units:4 * num_units]
            if use_peep:
                i = i + wi_ref[:] * c_prev
                f = f + wf_ref[:] * c_prev
            si = _sigmoid(i)
            tj = jnp.tanh(j)
            sf = _sigmoid(f + forget_bias)
            c_new = sf * c_prev + si * tj
            if use_peep:
                o = o + wo_ref[:] * c_new
            so = _sigmoid(o)
            tc = jnp.tanh(c_new)
            out_blk = so * tc                    # pre-projection output

            # --- backward through step t ---
            # h_next = m*out_p + (1-m)*h_prev; emitted out = m*out_p
            dout_p = m * (dout_ref[tt].astype(jnp.float32) + dh)
            dh_prev = (1.0 - m) * dh
            if use_proj:
                db_f = jax.lax.dot_general(     # dout_blk = dout_p @ Pᵀ
                    dout_p[:batch].astype(cdt), projf_ref[:],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                db_b = jax.lax.dot_general(
                    dout_p[batch:].astype(cdt), projb_ref[:],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dout_blk = jnp.concatenate([db_f, db_b], axis=0)
                outp_ref[tt] = out_blk
                doutp_ref[tt] = dout_p
            else:
                dout_blk = dout_p

            do = dout_blk * tc * so * (1.0 - so)
            dc_new = dout_blk * so * (1.0 - tc * tc)
            # c_next = m*c_new + (1-m)*c_prev
            dc_new = dc_new + m * dc
            dc_prev_carry = (1.0 - m) * dc
            if use_peep:
                dc_new = dc_new + do * wo_ref[:]
                cnew_ref[tt] = c_new
            df = dc_new * c_prev * sf * (1.0 - sf)
            di = dc_new * tj * si * (1.0 - si)
            dj = dc_new * si * (1.0 - tj * tj)
            dc_prev = dc_new * sf + dc_prev_carry
            if use_peep:
                dc_prev = dc_prev + df * wf_ref[:] + di * wi_ref[:]

            dgates = jnp.concatenate([di, dj, df, do], axis=1)  # [2B,4H]
            dgs_ref[tt] = dgates.astype(dgs_ref.dtype)
            # dh_prev += dgates @ whᵀ
            dh_f = jax.lax.dot_general(
                dgates[:batch].astype(cdt), whf_ref[:],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dh_b = jax.lax.dot_general(
                dgates[batch:].astype(cdt), whb_ref[:],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dh_prev = dh_prev + jnp.concatenate([dh_f, dh_b], axis=0)
            if use_reset:
                dc_prev = kp * dc_prev
                dh_prev = kp * dh_prev
            return dc_prev, dh_prev

        # iterate tt = Tb-1 .. 0 within the (reverse-ordered) block
        def rev_step(k, carry):
            return step(gx_ref.shape[0] - 1 - k, carry)

        dc, dh = jax.lax.fori_loop(
            0, gx_ref.shape[0], rev_step, (dc_ref[:], dh_ref[:]),
            unroll=gx_ref.shape[0] if unroll > 1 else 1)
        dc_ref[:] = dc
        dh_ref[:] = dh

        # --- block-level weight-gradient accumulation (off the chain) ---
        tb = gx_ref.shape[0]
        dg = dgs_ref[:]                                  # [tb, 2B, 4H]
        dg_f = dg[:, :batch].reshape(tb * batch, h4).astype(cdt)
        dg_b = dg[:, batch:].reshape(tb * batch, h4).astype(cdt)
        hp = hprev_ref[:]
        if use_reset:
            hp = hp * mask_ref[:][:, :, 1:2].astype(hp.dtype)
        hp_f = hp[:, :batch].reshape(tb * batch, out_dim).astype(cdt)
        hp_b = hp[:, batch:].reshape(tb * batch, out_dim).astype(cdt)
        awhf_ref[:] += jax.lax.dot_general(              # wh̄ += hᵀ dgates
            hp_f, dg_f, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        awhb_ref[:] += jax.lax.dot_general(
            hp_b, dg_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if use_proj:
            ob = outp_ref[:]
            dp = doutp_ref[:]
            ob_f = ob[:, :batch].reshape(tb * batch, num_units).astype(cdt)
            ob_b = ob[:, batch:].reshape(tb * batch, num_units).astype(cdt)
            dp_f = dp[:, :batch].reshape(tb * batch, out_dim).astype(cdt)
            dp_b = dp[:, batch:].reshape(tb * batch, out_dim).astype(cdt)
            aprojf_ref[:] += jax.lax.dot_general(        # P̄ += outᵀ dout_p
                ob_f, dp_f, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            aprojb_ref[:] += jax.lax.dot_general(
                ob_b, dp_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        if use_peep:
            dg32 = dg.astype(jnp.float32)
            cp32 = cprev_ref[:].astype(jnp.float32)
            if use_reset:
                cp32 = cp32 * mask_ref[:][:, :, 1:2]
            awi_ref[:] += jnp.sum(
                dg32[:, :, 0 * num_units:1 * num_units] * cp32, axis=0)
            awf_ref[:] += jnp.sum(
                dg32[:, :, 2 * num_units:3 * num_units] * cp32, axis=0)
            awo_ref[:] += jnp.sum(
                dg32[:, :, 3 * num_units:4 * num_units] * cnew_ref[:],
                axis=0)

        if fold_dx:
            # input-side grads + input cotangent, also off the chain:
            # wx̄ += xᵀ dgates, bias̄ += Σ dgates, dxt = dgates wxᵀ —
            # replaces the dgates HBM stream and its two XLA re-reads
            xt = xt_ref[:]
            x_f = xt[:, :batch].reshape(tb * batch, d_in).astype(cdt)
            x_b = xt[:, batch:].reshape(tb * batch, d_in).astype(cdt)
            awxf_ref[:] += jax.lax.dot_general(
                x_f, dg_f, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            awxb_ref[:] += jax.lax.dot_general(
                x_b, dg_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            abf_ref[:] += jnp.sum(dg[:, :batch].astype(jnp.float32),
                                  axis=(0, 1), keepdims=False)[None, :]
            abb_ref[:] += jnp.sum(dg[:, batch:].astype(jnp.float32),
                                  axis=(0, 1), keepdims=False)[None, :]
            dx_f = jax.lax.dot_general(          # [tb·B, 4H] @ [D, 4H]ᵀ
                dg_f, wxf_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dx_b = jax.lax.dot_general(
                dg_b, wxb_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dxt_ref[:, :batch] = dx_f.reshape(
                tb, batch, d_in).astype(dxt_ref.dtype)
            dxt_ref[:, batch:] = dx_b.reshape(
                tb, batch, d_in).astype(dxt_ref.dtype)

        @pl.when(blk == nblk - 1)
        def _():
            dwhf_ref[:] = awhf_ref[:]
            dwhb_ref[:] = awhb_ref[:]
            if use_proj:
                dprojf_ref[:] = aprojf_ref[:]
                dprojb_ref[:] = aprojb_ref[:]
            if use_peep:
                dwi_ref[:] = awi_ref[:]
                dwf_ref[:] = awf_ref[:]
                dwo_ref[:] = awo_ref[:]
            if fold_dx:
                dwxf_ref[:] = awxf_ref[:]
                dwxb_ref[:] = awxb_ref[:]
                dbf_ref[:] = abf_ref[:]
                dbb_ref[:] = abb_ref[:]

    return kernel


def _pad_time(x, padded_t):
    pad = padded_t - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


@functools.lru_cache(maxsize=32)
def _make_fused(time_steps, batch, num_units, out_dim, forget_bias,
                use_peep, use_proj, cdt_name, store_name, time_block,
                interpret, use_reset=False, fold_dx=False, d_in=0,
                unroll=1):
    # ``unroll`` is read from the env ONCE by the callers and passed in so
    # it participates in the lru_cache key — changing
    # LSTM_CTC_TPU_KERNEL_UNROLL mid-process must not silently reuse
    # kernels built with the old factor.
    cdt = jnp.dtype(cdt_name)
    h4 = 4 * num_units
    b2 = 2 * batch
    padded_t = -(-time_steps // time_block) * time_block
    nblk = padded_t // time_block
    # Per-step (c, h) remat states and the emitted dgates stream through
    # HBM at [T, 2B, ·]; storing them in bf16 halves that traffic and
    # measured +6% train throughput (docs/BENCHMARKS.md).  f32 is used by
    # the exact-parity tests.
    store_dt = jnp.dtype(store_name)

    fwd_kernel = _make_fwd_kernel(batch, num_units, out_dim, forget_bias,
                                  use_peep, use_proj, cdt, use_reset,
                                  unroll=unroll)
    bwd_kernel = _make_bwd_kernel(batch, num_units, out_dim, forget_bias,
                                  use_peep, use_proj, cdt, use_reset,
                                  fold_dx=fold_dx, d_in=d_in,
                                  unroll=unroll)
    mask_w = 2 if use_reset else 1

    tb_spec = lambda width, dtype=None: pl.BlockSpec(
        (time_block, b2, width), lambda t: (t, 0, 0),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    # The backward kernel's streamed blocks (gx, dgx, states, dout) plus
    # weight/accumulator residents overflow the default 16 MB scoped-VMEM
    # budget once double-buffering is counted; v5e has 128 MB, so raise
    # the per-kernel cap instead of shrinking the time block.
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),  # sequential carry over blocks
        # 110 MB matches the backward kernel's cap; the tb·2B=4096-row
        # forward (B=64 tb=32 / B=128 tb=16) measures 100.9 MB and was
        # 912 KB over the previous 100 MB cap (v5e has 128 MB physical)
        vmem_limit_bytes=110 * 1024 * 1024)

    def pallas_fwd(gx, mask, whf, whb, projf, projb, wi, wf, wo):
        outs = pl.pallas_call(
            fwd_kernel,
            grid=(nblk,),
            in_specs=[tb_spec(h4), tb_spec(mask_w)] + [full()] * 7,
            out_specs=[tb_spec(out_dim), tb_spec(num_units),
                       tb_spec(out_dim), full(), full()],
            out_shape=[
                jax.ShapeDtypeStruct((padded_t, b2, out_dim), jnp.float32),
                jax.ShapeDtypeStruct((padded_t, b2, num_units), store_dt),
                jax.ShapeDtypeStruct((padded_t, b2, out_dim), store_dt),
                jax.ShapeDtypeStruct((b2, num_units), jnp.float32),
                jax.ShapeDtypeStruct((b2, out_dim), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((b2, num_units), jnp.float32),
                            pltpu.VMEM((b2, out_dim), jnp.float32)],
            compiler_params=compiler_params,
            interpret=interpret,
        )(gx, mask, whf, whb, projf, projb, wi, wf, wo)
        return outs

    # backward walks time blocks in REVERSE grid order (within-block
    # reversal happens in the kernel's fori loop)
    rev_spec = lambda width: pl.BlockSpec(
        (time_block, b2, width), lambda t, n=nblk: (n - 1 - t, 0, 0),
        memory_space=pltpu.VMEM)

    base_scratch = [
        pltpu.VMEM((b2, num_units), jnp.float32),
        pltpu.VMEM((b2, out_dim), jnp.float32),
        pltpu.VMEM((out_dim, h4), jnp.float32),
        pltpu.VMEM((out_dim, h4), jnp.float32),
        pltpu.VMEM((num_units, out_dim), jnp.float32),
        pltpu.VMEM((num_units, out_dim), jnp.float32),
        pltpu.VMEM((b2, num_units), jnp.float32),
        pltpu.VMEM((b2, num_units), jnp.float32),
        pltpu.VMEM((b2, num_units), jnp.float32),
        # per-step stashes consumed by the block-level wgrad
        # accumulation after the reverse loop
        pltpu.VMEM((time_block, b2, num_units), jnp.float32),
        pltpu.VMEM((time_block, b2, num_units), jnp.float32),
        pltpu.VMEM((time_block, b2, out_dim), jnp.float32),
    ]

    def pallas_bwd(gx, mask, c_prev_all, h_prev_all, whf, whb, projf,
                   projb, wi, wf, wo, dout, dcfin, dhfin):
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(nblk,),
            in_specs=([rev_spec(h4), rev_spec(mask_w), rev_spec(num_units),
                       rev_spec(out_dim)] + [full()] * 7
                      + [rev_spec(out_dim), full(), full()]),
            out_specs=[rev_spec(h4)] + [full()] * 7,
            out_shape=[
                jax.ShapeDtypeStruct((padded_t, b2, h4), store_dt),
                jax.ShapeDtypeStruct((out_dim, h4), jnp.float32),
                jax.ShapeDtypeStruct((out_dim, h4), jnp.float32),
                jax.ShapeDtypeStruct((num_units, out_dim), jnp.float32),
                jax.ShapeDtypeStruct((num_units, out_dim), jnp.float32),
                jax.ShapeDtypeStruct((b2, num_units), jnp.float32),
                jax.ShapeDtypeStruct((b2, num_units), jnp.float32),
                jax.ShapeDtypeStruct((b2, num_units), jnp.float32),
            ],
            scratch_shapes=base_scratch,
            compiler_params=compiler_params,
            interpret=interpret,
        )(gx, mask, c_prev_all, h_prev_all, whf, whb, projf, projb,
          wi, wf, wo, dout, dcfin, dhfin)
        return outs

    def pallas_bwd_fold(gx, mask, c_prev_all, h_prev_all, xt, whf, whb,
                        projf, projb, wi, wf, wo, wxf, wxb, dout,
                        dcfin, dhfin):
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(nblk,),
            in_specs=([rev_spec(h4), rev_spec(mask_w), rev_spec(num_units),
                       rev_spec(out_dim), rev_spec(d_in)] + [full()] * 9
                      + [rev_spec(out_dim), full(), full()]),
            out_specs=[rev_spec(d_in)] + [full()] * 11,
            out_shape=[
                jax.ShapeDtypeStruct((padded_t, b2, d_in), store_dt),
                jax.ShapeDtypeStruct((out_dim, h4), jnp.float32),
                jax.ShapeDtypeStruct((out_dim, h4), jnp.float32),
                jax.ShapeDtypeStruct((num_units, out_dim), jnp.float32),
                jax.ShapeDtypeStruct((num_units, out_dim), jnp.float32),
                jax.ShapeDtypeStruct((b2, num_units), jnp.float32),
                jax.ShapeDtypeStruct((b2, num_units), jnp.float32),
                jax.ShapeDtypeStruct((b2, num_units), jnp.float32),
                jax.ShapeDtypeStruct((d_in, h4), jnp.float32),
                jax.ShapeDtypeStruct((d_in, h4), jnp.float32),
                jax.ShapeDtypeStruct((1, h4), jnp.float32),
                jax.ShapeDtypeStruct((1, h4), jnp.float32),
            ],
            scratch_shapes=base_scratch + [
                pltpu.VMEM((time_block, b2, h4), store_dt),  # dgates blk
                pltpu.VMEM((d_in, h4), jnp.float32),         # awxf
                pltpu.VMEM((d_in, h4), jnp.float32),         # awxb
                pltpu.VMEM((1, h4), jnp.float32),            # abf
                pltpu.VMEM((1, h4), jnp.float32),            # abb
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(gx, mask, c_prev_all, h_prev_all, xt, whf, whb, projf, projb,
          wi, wf, wo, wxf, wxb, dout, dcfin, dhfin)
        return outs

    if not fold_dx:
        @jax.custom_vjp
        def fused(gx, mask, whf, whb, projf, projb, wi, wf, wo):
            out, _, _, cfin, hfin = pallas_fwd(gx, mask, whf, whb, projf,
                                               projb, wi, wf, wo)
            return out[:time_steps], cfin, hfin

        def fused_fwd(gx, mask, whf, whb, projf, projb, wi, wf, wo):
            out, c_all, h_all, cfin, hfin = pallas_fwd(
                gx, mask, whf, whb, projf, projb, wi, wf, wo)
            res = (gx, mask, c_all, h_all, whf, whb, projf, projb, wi,
                   wf, wo)
            return (out[:time_steps], cfin, hfin), res

        def fused_bwd(res, cots):
            dout, dcfin, dhfin = cots
            (gx, mask, c_all, h_all, whf, whb, projf, projb, wi, wf,
             wo) = res
            # previous-step states: shift right by one, zeros at t=0
            zero_c = jnp.zeros((1,) + c_all.shape[1:], c_all.dtype)
            zero_h = jnp.zeros((1,) + h_all.shape[1:], h_all.dtype)
            c_prev = jnp.concatenate([zero_c, c_all[:-1]], axis=0)
            h_prev = jnp.concatenate([zero_h, h_all[:-1]], axis=0)
            dout_p = _pad_time(dout.astype(jnp.float32),
                               c_all.shape[0])
            (dgx, dwhf, dwhb, dprojf, dprojb, dwi, dwf,
             dwo) = pallas_bwd(
                gx, mask, c_prev, h_prev, whf, whb, projf, projb, wi,
                wf, wo, dout_p, dcfin.astype(jnp.float32),
                dhfin.astype(jnp.float32))
            dgx = dgx.astype(gx.dtype)
            return (dgx, jnp.zeros_like(mask),
                    dwhf.astype(whf.dtype), dwhb.astype(whb.dtype),
                    dprojf.astype(projf.dtype),
                    dprojb.astype(projb.dtype),
                    dwi.astype(wi.dtype), dwf.astype(wf.dtype),
                    dwo.astype(wo.dtype))

        fused.defvjp(fused_fwd, fused_bwd)
        return fused

    # ---- fold_dx variant: input projection inside the VJP boundary ----
    def compute_gx(xt, wxf, wxb, biasf, biasb):
        gf = jax.lax.dot_general(
            xt[:, :batch].astype(cdt), wxf, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + biasf[None, None, :]
        gb = jax.lax.dot_general(
            xt[:, batch:].astype(cdt), wxb, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + biasb[None, None, :]
        return jnp.concatenate([gf, gb], axis=1).astype(cdt)

    @jax.custom_vjp
    def fusedx(xt, wxf, wxb, biasf, biasb, mask, whf, whb, projf, projb,
               wi, wf, wo):
        gx = compute_gx(xt, wxf, wxb, biasf, biasb)
        out, _, _, cfin, hfin = pallas_fwd(gx, mask, whf, whb, projf,
                                           projb, wi, wf, wo)
        return out[:time_steps], cfin, hfin

    def fusedx_fwd(xt, wxf, wxb, biasf, biasb, mask, whf, whb, projf,
                   projb, wi, wf, wo):
        gx = compute_gx(xt, wxf, wxb, biasf, biasb)
        out, c_all, h_all, cfin, hfin = pallas_fwd(
            gx, mask, whf, whb, projf, projb, wi, wf, wo)
        res = (xt, gx, mask, c_all, h_all, wxf, wxb, whf, whb, projf,
               projb, wi, wf, wo)
        return (out[:time_steps], cfin, hfin), res

    def fusedx_bwd(res, cots):
        dout, dcfin, dhfin = cots
        (xt, gx, mask, c_all, h_all, wxf, wxb, whf, whb, projf, projb,
         wi, wf, wo) = res
        zero_c = jnp.zeros((1,) + c_all.shape[1:], c_all.dtype)
        zero_h = jnp.zeros((1,) + h_all.shape[1:], h_all.dtype)
        c_prev = jnp.concatenate([zero_c, c_all[:-1]], axis=0)
        h_prev = jnp.concatenate([zero_h, h_all[:-1]], axis=0)
        dout_p = _pad_time(dout.astype(jnp.float32), c_all.shape[0])
        (dxt, dwhf, dwhb, dprojf, dprojb, dwi, dwf, dwo, dwxf, dwxb,
         dbf, dbb) = pallas_bwd_fold(
            gx, mask, c_prev, h_prev, xt, whf, whb, projf, projb, wi,
            wf, wo, wxf, wxb, dout_p, dcfin.astype(jnp.float32),
            dhfin.astype(jnp.float32))
        return (dxt.astype(xt.dtype),
                dwxf.astype(wxf.dtype), dwxb.astype(wxb.dtype),
                dbf.reshape(h4), dbb.reshape(h4),
                jnp.zeros_like(mask),
                dwhf.astype(whf.dtype), dwhb.astype(whb.dtype),
                dprojf.astype(projf.dtype), dprojb.astype(projb.dtype),
                dwi.astype(wi.dtype), dwf.astype(wf.dtype),
                dwo.astype(wo.dtype))

    fusedx.defvjp(fusedx_fwd, fusedx_bwd)
    return fusedx


def _auto_time_block(batch):
    """Largest time block whose double-buffered backward streams fit the
    raised VMEM cap: the streamed block is tb*2B rows; tb*2B = 2048
    measures ~50 MB at H=P=320 (fits), while 4096 rows overflowed the
    100 MB cap (B=64, tb=32), so bound tb*2B <= 2048.

    LSTM_CTC_TPU_TIME_BLOCK overrides the heuristic (A/B lever for
    large-batch retuning — scripts/ab_train_step.py)."""
    import os
    env = os.environ.get("LSTM_CTC_TPU_TIME_BLOCK", "")
    if env:
        return max(1, int(env))
    tb = 2048 // (2 * batch)
    return max(4, min(32, 1 << (tb.bit_length() - 1) if tb > 0 else 4))


def bilstm_dual_scan_fused(fw_params, bw_params, x, x_rev,
                           sequence_length, forget_bias,
                           compute_dtype=None, time_block=None,
                           store_dtype="bfloat16", interpret=False,
                           reset_mask=None):
    """Drop-in fused replacement for cells.bilstm_dual_scan.

    Returns (fw_out [B,T,P], bw_out [B,T,P] reversed, (fw_state,
    bw_state)) with identical semantics (peepholes, forget bias,
    projection, dynamic_rnn masking, TF gate order).

    ``store_dtype`` sets the precision of the per-step remat states and
    the emitted dgates stream (the backward's HBM traffic); bf16 is the
    shipped default, f32 gives bit-level parity with the scan autodiff.
    """
    import os

    batch, time_steps, d_in = x.shape
    if time_block is None:
        time_block = _auto_time_block(batch)
    num_units = fw_params["bias"].shape[0] // 4
    use_proj = "proj" in fw_params
    use_peep = "w_i_diag" in fw_params
    out_dim = fw_params["proj"].shape[1] if use_proj else num_units
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None \
        else jnp.dtype(x.dtype)
    # opt-in: fold the input-side backward (dx/dwx/dbias) into the bwd
    # kernel, replacing the dgates HBM stream with the (smaller) dx
    # stream; needs a lane-aligned input dim
    fold_dx = os.environ.get("LSTM_CTC_TPU_LSTM_FOLD_DX", "0") == "1" \
        and d_in % 128 == 0

    if not fold_dx:
        # input projection for the whole sequence: one large MXU matmul
        wx = jnp.stack([fw_params["wx"], bw_params["wx"]]).astype(cdt)
        bias = jnp.stack([fw_params["bias"], bw_params["bias"]])
        x2 = jnp.stack([x, x_rev]).astype(cdt)              # [2, B, T, D]
        gx = jnp.einsum("kbtd,kdh->tkbh", x2, wx,
                        preferred_element_type=jnp.float32) \
            + bias[None, :, None, :]                        # [T, 2, B, 4H]
        gx = gx.reshape(time_steps, 2 * batch,
                        4 * num_units).astype(cdt)

    mask = (jnp.arange(time_steps)[:, None]
            < sequence_length[None, :]).astype(jnp.float32)  # [T, B]
    mask2 = jnp.tile(mask, (1, 2))[:, :, None]               # [T, 2B, 1]
    use_reset = reset_mask is not None
    if use_reset:
        # channel 1 = keep = 1 - reset: the kernel zeroes the carried
        # state at packed-segment starts (same positions both directions)
        keep = 1.0 - jnp.transpose(reset_mask).astype(jnp.float32)
        keep2 = jnp.tile(keep, (1, 2))[:, :, None]           # [T, 2B, 1]
        mask2 = jnp.concatenate([mask2, keep2], axis=2)      # [T, 2B, 2]

    padded_t = -(-time_steps // time_block) * time_block
    if fold_dx:
        # time-major stacked input stream [T, 2B, D]; the fused VJP
        # computes gx from it and owns the input-side backward
        xt = jnp.concatenate([jnp.moveaxis(x, 0, 1),
                              jnp.moveaxis(x_rev, 0, 1)], axis=1)
        xt = _pad_time(xt, padded_t)
    else:
        gx = _pad_time(gx, padded_t)
    mask2 = _pad_time(mask2, padded_t)
    if use_reset and padded_t > time_steps:
        # pad the keep channel with ONES: a zero keep would reset the
        # carried (c, h) at every padded step, diverging the returned
        # final states from the scan path, which preserves the carry
        # past sequence_length (validity, channel 0, stays zero there).
        mask2 = mask2.at[time_steps:, :, 1].set(1.0)

    def p2(name):
        shape_one = fw_params.get(name)
        if shape_one is None:
            z = jnp.zeros((1, num_units), jnp.float32)
            return z, z
        if shape_one.ndim == 1:
            return (fw_params[name].reshape(1, -1).astype(jnp.float32),
                    bw_params[name].reshape(1, -1).astype(jnp.float32))
        return (fw_params[name].astype(cdt), bw_params[name].astype(cdt))

    whf, whb = fw_params["wh"].astype(cdt), bw_params["wh"].astype(cdt)
    if use_proj:
        projf = fw_params["proj"].astype(cdt)
        projb = bw_params["proj"].astype(cdt)
    else:
        projf = projb = jnp.zeros((num_units, out_dim), cdt)
    wi_f, wi_b = p2("w_i_diag")
    wf_f, wf_b = p2("w_f_diag")
    wo_f, wo_b = p2("w_o_diag")
    wi = jnp.concatenate([jnp.tile(wi_f, (batch, 1)),
                          jnp.tile(wi_b, (batch, 1))], axis=0)
    wf = jnp.concatenate([jnp.tile(wf_f, (batch, 1)),
                          jnp.tile(wf_b, (batch, 1))], axis=0)
    wo = jnp.concatenate([jnp.tile(wo_f, (batch, 1)),
                          jnp.tile(wo_b, (batch, 1))], axis=0)

    fused = _make_fused(time_steps, batch, num_units, out_dim,
                        float(forget_bias), use_peep, use_proj,
                        jnp.dtype(cdt).name, jnp.dtype(store_dtype).name,
                        time_block, bool(interpret), use_reset,
                        fold_dx=fold_dx, d_in=d_in if fold_dx else 0,
                        unroll=_kernel_unroll())
    if fold_dx:
        out, cfin, hfin = fused(
            xt, fw_params["wx"].astype(cdt), bw_params["wx"].astype(cdt),
            fw_params["bias"].astype(jnp.float32),
            bw_params["bias"].astype(jnp.float32),
            mask2, whf, whb, projf, projb, wi, wf, wo)
    else:
        out, cfin, hfin = fused(gx, mask2, whf, whb, projf, projb,
                                wi, wf, wo)

    out = out.reshape(time_steps, 2, batch, out_dim)
    outputs = jnp.moveaxis(out, 0, 2)                       # [2, B, T, P]
    fw_state = (cfin[:batch], hfin[:batch])
    bw_state = (cfin[batch:], hfin[batch:])
    return outputs[0], outputs[1], (fw_state, bw_state)


def bilstm_dual_scan_sharded(mesh, fw_params, bw_params, x, x_rev,
                             sequence_length, forget_bias,
                             compute_dtype=None, time_block=None,
                             store_dtype="bfloat16", interpret=False,
                             reset_mask=None):
    """Data-parallel wrapper: runs the fused kernel once per mesh shard.

    GSPMD cannot partition a custom call, so inside a jit over a
    multi-device mesh the raw ``pallas_call`` would be all-gathered onto
    every device.  ``shard_map`` splits the batch axis explicitly: each
    device runs the whole-sequence kernel on its local rows with the
    weights replicated; shard_map's transpose psums the weight cotangents
    across the mesh, which is exactly the DP gradient all-reduce.

    Requires ``x.shape[0] % mesh.size == 0`` (callers fall back to the
    XLA scan otherwise).
    """
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    dp, rep = P(axis), P()

    def per_shard(fw_p, bw_p, xs, xrs, sl, *rest):
        return bilstm_dual_scan_fused(
            fw_p, bw_p, xs, xrs, sl, forget_bias,
            compute_dtype=compute_dtype, time_block=time_block,
            store_dtype=store_dtype, interpret=interpret,
            reset_mask=rest[0] if rest else None)

    args = (fw_params, bw_params, x, x_rev, sequence_length)
    in_specs = (rep, rep, dp, dp, dp)
    if reset_mask is not None:
        args += (reset_mask,)
        in_specs += (dp,)
    return jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=in_specs,
        out_specs=(dp, dp, ((dp, dp), (dp, dp))),
        check_vma=False,
    )(*args)


def lstm_scan_fused(params, x, sequence_length, forget_bias=1.0,
                    compute_dtype=None, time_block=None,
                    store_dtype="bfloat16", interpret=False):
    """Unidirectional fused whole-sequence scan (models/cells.lstm_scan
    semantics — reference nnet/lstm.py:233-295 stack cells).

    Reuses the dual-direction kernel by splitting the batch into two
    half-batch "rows groups" that share the same weights: the kernel's
    two per-step matmuls then each process half the batch, which is
    identical math to one full-batch matmul.  Requires an even batch and
    zero initial state; callers fall back to the XLA scan otherwise.

    Returns (outputs [B, T, P], (c_final [B, H], h_final [B, P])).
    """
    batch, time_steps, _ = x.shape
    if batch % 2 != 0:
        raise ValueError("lstm_scan_fused requires an even batch")
    half = batch // 2
    num_units = params["bias"].shape[0] // 4
    use_proj = "proj" in params
    use_peep = "w_i_diag" in params
    out_dim = params["proj"].shape[1] if use_proj else num_units
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None \
        else jnp.dtype(x.dtype)
    if time_block is None:
        time_block = _auto_time_block(half)

    gx = jnp.einsum("btd,dh->tbh", x.astype(cdt),
                    params["wx"].astype(cdt),
                    preferred_element_type=jnp.float32) \
        + params["bias"][None, None, :]                     # [T, B, 4H]
    gx = gx.astype(cdt)
    mask = (jnp.arange(time_steps)[:, None]
            < sequence_length[None, :]).astype(jnp.float32)  # [T, B]
    mask = mask[:, :, None]

    padded_t = -(-time_steps // time_block) * time_block
    gx = _pad_time(gx, padded_t)
    mask = _pad_time(mask, padded_t)

    wh = params["wh"].astype(cdt)
    proj = params["proj"].astype(cdt) if use_proj \
        else jnp.zeros((num_units, out_dim), cdt)

    def peep(name):
        v = params.get(name)
        if v is None:
            return jnp.zeros((batch, num_units), jnp.float32)
        return jnp.tile(v.reshape(1, -1).astype(jnp.float32), (batch, 1))

    fused = _make_fused(time_steps, half, num_units, out_dim,
                        float(forget_bias), use_peep, use_proj,
                        jnp.dtype(cdt).name, jnp.dtype(store_dtype).name,
                        time_block, bool(interpret),
                        unroll=_kernel_unroll())
    out, cfin, hfin = fused(gx, mask, wh, wh, proj, proj,
                            peep("w_i_diag"), peep("w_f_diag"),
                            peep("w_o_diag"))
    return jnp.moveaxis(out, 0, 1), (cfin, hfin)


def lstm_scan_sharded(mesh, params, x, sequence_length, forget_bias=1.0,
                      compute_dtype=None, time_block=None,
                      store_dtype="bfloat16", interpret=False):
    """Data-parallel wrapper for lstm_scan_fused (see
    bilstm_dual_scan_sharded for why shard_map is required)."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    dp, rep = P(axis), P()

    def per_shard(p, xs, sl):
        return lstm_scan_fused(
            p, xs, sl, forget_bias, compute_dtype=compute_dtype,
            time_block=time_block, store_dtype=store_dtype,
            interpret=interpret)

    return jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(rep, dp, dp),
        out_specs=(dp, (dp, dp)),
        check_vma=False,
    )(params, x, sequence_length)
