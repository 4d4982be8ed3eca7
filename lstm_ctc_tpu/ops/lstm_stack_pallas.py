"""Wavefront Pallas kernel: a whole UNIDIRECTIONAL LSTM stack in one
time loop.

The per-layer whole-sequence kernel (ops/lstm_pallas.py) removed the
per-step dispatch overhead, but a stack of L layers still runs L
sequential passes: T·L dependent recurrent matmuls.  For BIDIRECTIONAL
stacks that is a hard floor — layer l+1 at time 0 consumes layer l's
backward direction at time T−1, so layers cannot overlap.  For
UNIDIRECTIONAL stacks (the `lstm` / `cudnnlstm` families, reference
nnet/lstm.py:200-340) there is no such barrier: layer l at time t
depends only on layer l−1 at time t and on itself at t−1, so the stack
admits a diagonal wavefront — at wavefront step s, layer l processes
time t = s − l.  The L cell updates inside one wavefront step are
DATA-INDEPENDENT, so their matmuls issue back-to-back into the MXU
pipeline and the sequential chain shrinks from T·L dependent steps to
T + L − 1 wavefront steps.

Layout: layers stack on the row axis ([L·B, ·]), the same trick the
bidirectional kernel uses for its two directions.  The carried (c, h)
for every layer live in VMEM scratch; layer l's input at step s is
layer l−1's chain output from step s−1, held in a one-slot ring buffer
that shifts down by B rows each step.  Layer 0's input projection (the
only non-uniform shape) is precomputed outside as one big MXU matmul
and streamed in time blocks; its weight slab inside the fused z-matmul
is zero, so the ring buffer's layer-0 rows are inert.

Semantics mirror models/lstm.py exactly: TF gate order, runtime forget
bias, optional peepholes + projection, per-layer residual
(chain_l = masked_scan_out_l + in_l), dynamic_rnn masking (m=0 freezes
the carry, so wavefront steps outside a layer's valid time range are
no-ops and the final states fall out correctly).  Inter-layer dropout
runs in-kernel via the MoE head's counter-based hash mask (same
keep-prob semantics as the XLA path, different stream); only batch-norm
configs fall back to the per-layer path (BN needs whole-sequence batch
statistics).

Backward: a reverse wavefront with matmul-level remat — gates are
recomputed from the stored per-step (c, h) and chain streams, weight
gradients accumulate at block level off the sequential chain, and layer
0's dgates are emitted for the outside XLA input-projection backward
(the same contract as the per-layer kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lstm_pallas import _kernel_unroll, _pad_time, _sigmoid


def _auto_time_block(num_layers, batch):
    """Bound tb·L·B ≤ 2048 rows, the same budget rule as the
    bidirectional kernel's tb·2B ≤ 2048 (keeps double-buffered backward
    streams under the raised VMEM cap at H=P=320)."""
    tb = 2048 // max(1, num_layers * batch)
    return max(4, min(32, 1 << (tb.bit_length() - 1) if tb > 0 else 4))


def _make_fwd_kernel(num_layers, batch, num_units, out_dim, forget_bias,
                     use_peep, use_proj, cdt, residual, keep_prob,
                     time_block, use_affine=False, unroll=1):
    """residual: static tuple of L floats (1.0 → chain_l += in_l).
    keep_prob < 1: inter-layer dropout on the chain values via the same
    counter-based hash as the MoE kernel (same keep-prob semantics as
    the XLA path, different stream).
    use_affine: two extra [LB, P] inputs (a, b) apply a per-layer
    per-channel affine to the chain values — eval-mode batch-norm
    folded to chain·a + b (models/lstm._apply_bn with running stats)."""
    lb = num_layers * batch
    p2 = 2 * out_dim
    dropout = keep_prob < 1.0

    def kernel(*refs):
        (seed_ref, gx0_ref, mask_ref, wz_ref, bias_ref, proj_ref,
         wi_ref, wf_ref, wo_ref, cinit_ref, hinit_ref) = refs[:11]
        pos = 11
        if use_affine:
            a_ref, b_ref = refs[pos:pos + 2]
            pos += 2
        (out_ref, chain_ref, call_ref, hall_ref, cfin_ref, hfin_ref,
         c_ref, h_ref, in_ref) = refs[pos:]
        blk = pl.program_id(0)
        nblk = pl.num_programs(0)

        @pl.when(blk == 0)
        def _():
            c_ref[:] = cinit_ref[:]
            h_ref[:] = hinit_ref[:]
            in_ref[:] = jnp.zeros_like(in_ref)

        def step(tt, carry):
            c, h, inb = carry               # [LB, H], [LB, P], [LB, P]
            gparts = []
            for l in range(num_layers):
                rows = slice(l * batch, (l + 1) * batch)
                z = jnp.concatenate([inb[rows], h[rows]],
                                    axis=1).astype(cdt)
                gparts.append(jax.lax.dot_general(
                    z, wz_ref[l * p2:(l + 1) * p2],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            gates = jnp.concatenate(gparts, axis=0) + bias_ref[:]
            g0 = gx0_ref[tt].astype(jnp.float32)      # [B, 4H] layer 0
            gates = jnp.concatenate(
                [gates[:batch] + g0, gates[batch:]], axis=0)
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
            out_h = _sigmoid(o) * jnp.tanh(c_new)     # [LB, H]
            if use_proj:
                pparts = []
                for l in range(num_layers):
                    rows = slice(l * batch, (l + 1) * batch)
                    pparts.append(jax.lax.dot_general(
                        out_h[rows].astype(cdt),
                        proj_ref[l * num_units:(l + 1) * num_units],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                outp = jnp.concatenate(pparts, axis=0)
            else:
                outp = out_h
            m = mask_ref[tt][:, 0:1]                  # [LB, 1]
            c_next = m * c_new + (1.0 - m) * c
            h_next = m * outp + (1.0 - m) * h
            # chain value feeding layer l+1 (and, for the last layer,
            # the kernel output): masked scan output + optional residual
            rvec = jnp.concatenate(
                [jnp.full((batch, 1), residual[l], jnp.float32)
                 for l in range(num_layers)], axis=0)
            chain = m * outp + rvec * inb
            if dropout:
                from .moe_pallas import hash_uniform
                s_glob = blk * time_block + tt
                u = hash_uniform(seed_ref[0], s_glob * lb, 0, lb,
                                 out_dim)
                chain = chain * (u < keep_prob).astype(jnp.float32) \
                    * (1.0 / keep_prob)
            if use_affine:
                # eval-mode BN: residual → (dropout) → affine, the same
                # stage order as models/lstm.apply_lstm's per-layer loop
                chain = chain * a_ref[:] + b_ref[:]
            out_ref[tt] = chain[lb - batch:].astype(out_ref.dtype)
            chain_ref[tt] = chain.astype(chain_ref.dtype)
            call_ref[tt] = c_next.astype(call_ref.dtype)
            hall_ref[tt] = h_next.astype(hall_ref.dtype)
            # ring shift: layer l+1's next input = layer l's chain
            # value.  pltpu.roll + mask, NOT a concat of a sliced
            # operand — Mosaic rejects concats whose operand offset
            # differs from its placement ("result/input offset
            # mismatch on non-concat dimension").
            row = jax.lax.broadcasted_iota(jnp.int32, (lb, 1), 0)
            in_next = jnp.where(row < batch, 0.0,
                                pltpu.roll(chain, batch, 0))
            return c_next, h_next, in_next

        c, h, inb = jax.lax.fori_loop(
            0, gx0_ref.shape[0], step, (c_ref[:], h_ref[:], in_ref[:]),
            unroll=gx0_ref.shape[0] if unroll > 1 else 1)
        c_ref[:] = c
        h_ref[:] = h
        in_ref[:] = inb

        @pl.when(blk == nblk - 1)
        def _():
            cfin_ref[:] = c
            hfin_ref[:] = h

    return kernel


def _make_bwd_kernel(num_layers, batch, num_units, out_dim, forget_bias,
                     use_peep, use_proj, cdt, residual, keep_prob,
                     time_block, unroll=1):
    lb = num_layers * batch
    h4 = 4 * num_units
    p2 = 2 * out_dim
    dropout = keep_prob < 1.0

    def kernel(seed_ref, gx0_ref, mask_ref, cprev_ref, hprev_ref,
               inprev_ref,
               wz_ref, bias_ref, proj_ref, wi_ref, wf_ref, wo_ref,
               dout_ref, dcfin_ref, dhfin_ref,
               dgx0_ref, dwz_ref, dbias_ref, dproj_ref, dwi_ref,
               dwf_ref, dwo_ref, dcinit_ref, dhinit_ref,
               dc_ref, dh_ref, din_ref,
               awz_ref, abias_ref, aproj_ref, awi_ref, awf_ref, awo_ref,
               cnew_ref, outh_ref, doutp_ref, dgs_ref):
        blk = pl.program_id(0)
        nblk = pl.num_programs(0)

        @pl.when(blk == 0)
        def _():
            dc_ref[:] = dcfin_ref[:]
            dh_ref[:] = dhfin_ref[:]
            din_ref[:] = jnp.zeros_like(din_ref)
            awz_ref[:] = jnp.zeros_like(awz_ref)
            abias_ref[:] = jnp.zeros_like(abias_ref)
            if use_proj:
                aproj_ref[:] = jnp.zeros_like(aproj_ref)
            if use_peep:
                awi_ref[:] = jnp.zeros_like(awi_ref)
                awf_ref[:] = jnp.zeros_like(awf_ref)
                awo_ref[:] = jnp.zeros_like(awo_ref)

        def step(tt, carry):
            dc, dh, dinbuf = carry
            c_prev = cprev_ref[tt].astype(jnp.float32)
            h_prev = hprev_ref[tt].astype(jnp.float32)
            in_prev = inprev_ref[tt].astype(jnp.float32)
            m = mask_ref[tt][:, 0:1]

            # --- recompute forward wavefront step s ---
            gparts = []
            for l in range(num_layers):
                rows = slice(l * batch, (l + 1) * batch)
                z = jnp.concatenate([in_prev[rows], h_prev[rows]],
                                    axis=1).astype(cdt)
                gparts.append(jax.lax.dot_general(
                    z, wz_ref[l * p2:(l + 1) * p2],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            gates = jnp.concatenate(gparts, axis=0) + bias_ref[:]
            g0 = gx0_ref[tt].astype(jnp.float32)
            gates = jnp.concatenate(
                [gates[:batch] + g0, gates[batch:]], axis=0)
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
            out_h = so * tc

            # --- backward through wavefront step s ---
            # chain_l cotangent: the last layer's comes from the output
            # stream (full [LB, P] rows, zeros off the last layer),
            # layers below from layer l+1's din ring-shifted UP via
            # roll+mask (see the forward's Mosaic concat note)
            row = jax.lax.broadcasted_iota(jnp.int32, (lb, 1), 0)
            rolled = pltpu.roll(dinbuf, lb - batch, 0)
            dchain = jnp.where(row < lb - batch, rolled, 0.0) \
                + dout_ref[tt].astype(jnp.float32)
            if dropout:
                # regenerate the forward's hash mask: the cotangent of
                # the PRE-dropout chain is dchain · mask / keep_prob
                from .moe_pallas import hash_uniform
                s_glob = (nblk - 1 - blk) * time_block + tt
                u = hash_uniform(seed_ref[0], s_glob * lb, 0, lb,
                                 out_dim)
                dchain = dchain * (u < keep_prob).astype(jnp.float32) \
                    * (1.0 / keep_prob)
            # outp feeds h_next (m·outp) and chain (m·outp)
            dout_p = m * (dchain + dh)
            dh_prev = (1.0 - m) * dh
            rvec = jnp.concatenate(
                [jnp.full((batch, 1), residual[l], jnp.float32)
                 for l in range(num_layers)], axis=0)
            din = rvec * dchain               # residual passthrough
            if use_proj:
                dparts = []
                for l in range(num_layers):
                    rows = slice(l * batch, (l + 1) * batch)
                    dparts.append(jax.lax.dot_general(
                        dout_p[rows].astype(cdt),
                        proj_ref[l * num_units:(l + 1) * num_units],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32))
                dout_blk = jnp.concatenate(dparts, axis=0)
                outh_ref[tt] = out_h
                doutp_ref[tt] = dout_p
            else:
                dout_blk = dout_p

            do = dout_blk * tc * so * (1.0 - so)
            dc_new = dout_blk * so * (1.0 - tc * tc)
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

            dgates = jnp.concatenate([di, dj, df, do], axis=1)  # [LB,4H]
            dgs_ref[tt] = dgates
            dgx0_ref[tt] = dgates[:batch].astype(dgx0_ref.dtype)
            # dz = dgates · wzᵀ → input-part din, recurrent-part dh
            din_parts, dh_parts = [], []
            for l in range(num_layers):
                rows = slice(l * batch, (l + 1) * batch)
                dz = jax.lax.dot_general(
                    dgates[rows].astype(cdt),
                    wz_ref[l * p2:(l + 1) * p2],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [B, 2P]
                din_parts.append(dz[:, :out_dim])
                dh_parts.append(dz[:, out_dim:])
            din = din + jnp.concatenate(din_parts, axis=0)
            dh_prev = dh_prev + jnp.concatenate(dh_parts, axis=0)
            return dc_prev, dh_prev, din

        def rev_step(k, carry):
            return step(gx0_ref.shape[0] - 1 - k, carry)

        dc, dh, dinbuf = jax.lax.fori_loop(
            0, gx0_ref.shape[0], rev_step,
            (dc_ref[:], dh_ref[:], din_ref[:]),
            unroll=gx0_ref.shape[0] if unroll > 1 else 1)
        dc_ref[:] = dc
        dh_ref[:] = dh
        din_ref[:] = dinbuf

        # --- block-level weight-gradient accumulation (off the chain) ---
        tb = gx0_ref.shape[0]
        dg = dgs_ref[:]                                  # [tb, LB, 4H]
        abias_ref[:] += jnp.sum(dg, axis=0)              # [LB, 4H]
        for l in range(num_layers):
            rows = slice(l * batch, (l + 1) * batch)
            zin = jnp.concatenate(
                [inprev_ref[:, rows].astype(jnp.float32),
                 hprev_ref[:, rows].astype(jnp.float32)],
                axis=2)                                  # [tb, B, 2P]
            z2 = zin.reshape(tb * batch, p2).astype(cdt)
            dg2 = dg[:, rows].reshape(tb * batch, h4).astype(cdt)
            awz_ref[l * p2:(l + 1) * p2] += jax.lax.dot_general(
                z2, dg2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if use_proj:
                oh2 = outh_ref[:, rows].reshape(
                    tb * batch, num_units).astype(cdt)
                dp2 = doutp_ref[:, rows].reshape(
                    tb * batch, out_dim).astype(cdt)
                aproj_ref[l * num_units:(l + 1) * num_units] += \
                    jax.lax.dot_general(
                        oh2, dp2, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        if use_peep:
            cp32 = cprev_ref[:].astype(jnp.float32)
            awi_ref[:] += jnp.sum(
                dg[:, :, 0 * num_units:1 * num_units] * cp32, axis=0)
            awf_ref[:] += jnp.sum(
                dg[:, :, 2 * num_units:3 * num_units] * cp32, axis=0)
            awo_ref[:] += jnp.sum(
                dg[:, :, 3 * num_units:4 * num_units] * cnew_ref[:],
                axis=0)

        @pl.when(blk == nblk - 1)
        def _():
            dwz_ref[:] = awz_ref[:]
            dbias_ref[:] = abias_ref[:]
            # after the last (earliest-time) block, the carried (dc, dh)
            # are the initial-state cotangents
            dcinit_ref[:] = dc_ref[:]
            dhinit_ref[:] = dh_ref[:]
            if use_proj:
                dproj_ref[:] = aproj_ref[:]
            if use_peep:
                dwi_ref[:] = awi_ref[:]
                dwf_ref[:] = awf_ref[:]
                dwo_ref[:] = awo_ref[:]

    return kernel


@functools.lru_cache(maxsize=32)
def _make_fused(time_steps, num_layers, batch, num_units, out_dim,
                forget_bias, use_peep, use_proj, residual, cdt_name,
                store_name, time_block, interpret, keep_prob=1.0,
                use_affine=False, unroll=1):
    # ``unroll`` is passed in by the caller (read from the env once) so
    # it participates in the lru_cache key — see lstm_pallas._make_fused.
    cdt = jnp.dtype(cdt_name)
    store_dt = jnp.dtype(store_name)
    lb = num_layers * batch
    h4 = 4 * num_units
    p2 = 2 * out_dim
    s_steps = time_steps + num_layers - 1
    padded_s = -(-s_steps // time_block) * time_block
    nblk = padded_s // time_block

    fwd_kernel = _make_fwd_kernel(num_layers, batch, num_units, out_dim,
                                  forget_bias, use_peep, use_proj, cdt,
                                  residual, keep_prob, time_block,
                                  use_affine=use_affine, unroll=unroll)
    bwd_kernel = _make_bwd_kernel(num_layers, batch, num_units, out_dim,
                                  forget_bias, use_peep, use_proj, cdt,
                                  residual, keep_prob, time_block,
                                  unroll=unroll)

    tb_rows = lambda rows, width: pl.BlockSpec(
        (time_block, rows, width), lambda t: (t, 0, 0),
        memory_space=pltpu.VMEM)
    rev_rows = lambda rows, width: pl.BlockSpec(
        (time_block, rows, width), lambda t, n=nblk: (n - 1 - t, 0, 0),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=110 * 1024 * 1024)

    n_extra = 2 if use_affine else 0

    def pallas_fwd(seed, gx0, mask, wz, bias, proj, wi, wf, wo, cinit,
                   hinit, *affine):
        return pl.pallas_call(
            fwd_kernel,
            grid=(nblk,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      tb_rows(batch, h4), tb_rows(lb, 1)]
                     + [full()] * (8 + n_extra),
            out_specs=[tb_rows(batch, out_dim), tb_rows(lb, out_dim),
                       tb_rows(lb, num_units), tb_rows(lb, out_dim),
                       full(), full()],
            out_shape=[
                jax.ShapeDtypeStruct((padded_s, batch, out_dim),
                                     jnp.float32),
                jax.ShapeDtypeStruct((padded_s, lb, out_dim), store_dt),
                jax.ShapeDtypeStruct((padded_s, lb, num_units), store_dt),
                jax.ShapeDtypeStruct((padded_s, lb, out_dim), store_dt),
                jax.ShapeDtypeStruct((lb, num_units), jnp.float32),
                jax.ShapeDtypeStruct((lb, out_dim), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((lb, num_units), jnp.float32),
                            pltpu.VMEM((lb, out_dim), jnp.float32),
                            pltpu.VMEM((lb, out_dim), jnp.float32)],
            compiler_params=compiler_params,
            interpret=interpret,
        )(seed, gx0, mask, wz, bias, proj, wi, wf, wo, cinit, hinit,
          *affine)

    def pallas_bwd(seed, gx0, mask, c_prev, h_prev, in_prev, wz, bias,
                   proj, wi, wf, wo, dout, dcfin, dhfin):
        return pl.pallas_call(
            bwd_kernel,
            grid=(nblk,),
            in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM),
                       rev_rows(batch, h4), rev_rows(lb, 1),
                       rev_rows(lb, num_units), rev_rows(lb, out_dim),
                       rev_rows(lb, out_dim)] + [full()] * 6
                      + [rev_rows(lb, out_dim), full(), full()]),
            out_specs=[rev_rows(batch, h4)] + [full()] * 8,
            out_shape=[
                jax.ShapeDtypeStruct((padded_s, batch, h4), store_dt),
                jax.ShapeDtypeStruct((num_layers * p2, h4), jnp.float32),
                jax.ShapeDtypeStruct((lb, h4), jnp.float32),
                jax.ShapeDtypeStruct((num_layers * num_units, out_dim),
                                     jnp.float32),
                jax.ShapeDtypeStruct((lb, num_units), jnp.float32),
                jax.ShapeDtypeStruct((lb, num_units), jnp.float32),
                jax.ShapeDtypeStruct((lb, num_units), jnp.float32),
                jax.ShapeDtypeStruct((lb, num_units), jnp.float32),
                jax.ShapeDtypeStruct((lb, out_dim), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((lb, num_units), jnp.float32),    # dc
                pltpu.VMEM((lb, out_dim), jnp.float32),      # dh
                pltpu.VMEM((lb, out_dim), jnp.float32),      # dinbuf
                pltpu.VMEM((num_layers * p2, h4), jnp.float32),   # awz
                pltpu.VMEM((lb, h4), jnp.float32),           # abias
                pltpu.VMEM((num_layers * num_units, out_dim),
                           jnp.float32),                     # aproj
                pltpu.VMEM((lb, num_units), jnp.float32),    # awi
                pltpu.VMEM((lb, num_units), jnp.float32),    # awf
                pltpu.VMEM((lb, num_units), jnp.float32),    # awo
                pltpu.VMEM((time_block, lb, num_units),
                           jnp.float32),                     # cnew
                pltpu.VMEM((time_block, lb, num_units),
                           jnp.float32),                     # outh
                pltpu.VMEM((time_block, lb, out_dim),
                           jnp.float32),                     # doutp
                pltpu.VMEM((time_block, lb, h4), jnp.float32),  # dgates
            ],
            compiler_params=compiler_params,
            interpret=interpret,
        )(seed, gx0, mask, c_prev, h_prev, in_prev, wz, bias, proj,
          wi, wf, wo, dout, dcfin, dhfin)

    if use_affine:
        # forward-only (eval/decode).  A custom_vjp whose bwd raises
        # keeps anyone differentiating an eval forward (e.g. saliency)
        # from hitting an obscure Mosaic pallas_call transpose error.
        @jax.custom_vjp
        def fused_affine(seed, gx0, mask, wz, bias, proj, wi, wf, wo,
                         cinit, hinit, arows, brows):
            out, _, _, _, cfin, hfin = pallas_fwd(
                seed, gx0, mask, wz, bias, proj, wi, wf, wo, cinit,
                hinit, arows, brows)
            return out, cfin, hfin

        def fused_affine_fwd(*args):
            return fused_affine(*args), None

        def fused_affine_bwd(res, cots):
            raise NotImplementedError(
                "the affine (eval-mode BN) wavefront stack kernel is "
                "forward-only; gradients of an eval/decode forward are "
                "not supported — run with train=True (training-mode BN "
                "uses the scan path) or LSTM_CTC_TPU_LSTM_IMPL=scan")

        fused_affine.defvjp(fused_affine_fwd, fused_affine_bwd)
        return fused_affine

    @jax.custom_vjp
    def fused(seed, gx0, mask, wz, bias, proj, wi, wf, wo, cinit, hinit):
        out, _, _, _, cfin, hfin = pallas_fwd(seed, gx0, mask, wz, bias,
                                              proj, wi, wf, wo, cinit,
                                              hinit)
        return out, cfin, hfin

    def fused_fwd(seed, gx0, mask, wz, bias, proj, wi, wf, wo, cinit,
                  hinit):
        out, chain, c_all, h_all, cfin, hfin = pallas_fwd(
            seed, gx0, mask, wz, bias, proj, wi, wf, wo, cinit, hinit)
        res = (seed, gx0, mask, chain, c_all, h_all, wz, bias, proj, wi,
               wf, wo, cinit, hinit)
        return (out, cfin, hfin), res

    def fused_bwd(res, cots):
        dout, dcfin, dhfin = cots
        (seed, gx0, mask, chain, c_all, h_all, wz, bias, proj, wi, wf,
         wo, cinit, hinit) = res
        # the state BEFORE wavefront step 0 is the initial state (for
        # layers l ≥ 1 the s=0 row is masked off anyway)
        c_prev = jnp.concatenate(
            [cinit.astype(c_all.dtype)[None], c_all[:-1]], axis=0)
        h_prev = jnp.concatenate(
            [hinit.astype(h_all.dtype)[None], h_all[:-1]], axis=0)
        # in_l(s) = chain_{l-1}(s-1): shift one wavefront step in time
        # AND one layer (B rows) down; layer-0 rows are inert because
        # wz's layer-0 input slab is zero
        shifted_rows = jnp.concatenate(
            [jnp.zeros_like(chain[:, :batch]), chain[:, :-batch]],
            axis=1)
        zi = jnp.zeros((1,) + shifted_rows.shape[1:], shifted_rows.dtype)
        in_prev = jnp.concatenate([zi, shifted_rows[:-1]], axis=0)
        # the kernel reads the output cotangent at full [LB, P] rows
        # (zeros off the last layer) so the in-kernel merge is a plain
        # add instead of an offset-mismatched concat
        dout_full = jnp.concatenate(
            [jnp.zeros((dout.shape[0], lb - batch, out_dim),
                       jnp.float32),
             dout.astype(jnp.float32)], axis=1)
        (dgx0, dwz, dbias_rows, dproj, dwi, dwf, dwo, dcinit,
         dhinit) = pallas_bwd(
            seed, gx0, mask, c_prev, h_prev, in_prev, wz, bias, proj,
            wi, wf, wo, dout_full, dcfin.astype(jnp.float32),
            dhfin.astype(jnp.float32))
        return (None, dgx0.astype(gx0.dtype), jnp.zeros_like(mask),
                dwz.astype(wz.dtype), dbias_rows.astype(bias.dtype),
                dproj.astype(proj.dtype),
                dwi.astype(wi.dtype), dwf.astype(wf.dtype),
                dwo.astype(wo.dtype),
                dcinit.astype(cinit.dtype), dhinit.astype(hinit.dtype))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def stack_eligible(params_list):
    """The wavefront kernel applies when the stack is UNIFORM (same
    units / projection / peephole structure on every layer — the kernel
    derives its static shapes from layer 0, so a mixed stack would
    silently drop upper-layer peepholes or misalign the packed wz
    slices) and there is no layer-0 residual (input_dim == output_dim
    would need the raw input streamed in — fall back instead)."""
    if len(params_list) < 2:
        return False
    p0 = params_list[0]
    out_dim = p0["proj"].shape[1] if "proj" in p0 else \
        p0["bias"].shape[0] // 4
    if p0["wx"].shape[0] == out_dim:
        return False   # layer-0 residual active → raw input needed
    units0 = p0["bias"].shape[0]
    proj0 = "proj" in p0
    peep0 = "w_i_diag" in p0
    for p in params_list[1:]:
        if p["wx"].shape[0] != out_dim:
            return False
        if p["bias"].shape[0] != units0:
            return False
        if ("proj" in p) != proj0 or ("w_i_diag" in p) != peep0:
            return False
        if proj0 and p["proj"].shape != p0["proj"].shape:
            return False
    return True


def lstm_stack_fused(params_list, x, sequence_length, forget_bias=1.0,
                     residual_flags=None, compute_dtype=None,
                     store_dtype="bfloat16", time_block=None,
                     interpret=False, initial_states=None,
                     keep_prob=1.0, seed=None, affine=None):
    """Run the whole unidirectional stack in one wavefront kernel.

    params_list: one cells.init_lstm_cell dict per layer (uniform
    in/out dims beyond layer 0).  residual_flags: per-layer bools —
    layer l's chain output = masked scan output + (flag ? input : 0),
    mirroring models/lstm.py's ResidualWrapper placement.

    initial_states: optional [(c_l, h_l)] per layer (streaming chunk
    continuation — cross-chunk state is exactly the per-layer (c, h);
    the wavefront ring buffer refills during each chunk's L−1 fill
    steps).

    keep_prob < 1 applies inter-layer dropout to the chain values
    (after the residual add, matching models/lstm.py's stage order) via
    an in-kernel counter-based hash mask driven by ``seed`` (int32
    scalar/[1]) — same keep-prob semantics as the XLA path, different
    stream.

    affine: optional per-layer [(a_l, b_l)] channel vectors applying
    chain·a + b after the residual/dropout stages — eval-mode
    batch-norm folded into the kernel (forward-only: the affine path
    has no VJP).

    Returns (outputs [B, T, P], [(c_l, h_l) final states per layer]).
    """
    num_layers = len(params_list)
    batch, time_steps, d_in = x.shape
    p0 = params_list[0]
    num_units = p0["bias"].shape[0] // 4
    use_proj = "proj" in p0
    use_peep = "w_i_diag" in p0
    out_dim = p0["proj"].shape[1] if use_proj else num_units
    if residual_flags is None:
        residual_flags = (0.0,) * num_layers
    residual = tuple(float(r) for r in residual_flags)
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None \
        else jnp.dtype(x.dtype)
    if time_block is None:
        time_block = _auto_time_block(num_layers, batch)
    lb = num_layers * batch
    h4 = 4 * num_units
    p2 = 2 * out_dim
    s_steps = time_steps + num_layers - 1
    padded_s = -(-s_steps // time_block) * time_block

    # layer-0 input projection: one whole-sequence MXU matmul
    gx0 = jnp.einsum("btd,dh->tbh", x.astype(cdt),
                     p0["wx"].astype(cdt),
                     preferred_element_type=jnp.float32) \
        + p0["bias"][None, None, :]
    gx0 = _pad_time(gx0.astype(cdt), padded_s)

    # packed weights: wz[l] = [wx_l; wh_l] (layer 0's wx slab zero — its
    # projection is gx0), tiled bias rows (layer 0's zero, folded above)
    wz_parts, bias_rows = [], []
    for l, p in enumerate(params_list):
        wx = jnp.zeros((out_dim, h4), jnp.float32) if l == 0 \
            else p["wx"]
        wz_parts.append(jnp.concatenate(
            [wx.astype(jnp.float32), p["wh"].astype(jnp.float32)],
            axis=0))
        b = jnp.zeros((h4,), jnp.float32) if l == 0 else p["bias"]
        bias_rows.append(jnp.tile(b.reshape(1, -1), (batch, 1)))
    wz = jnp.concatenate(wz_parts, axis=0).astype(cdt)    # [L·2P, 4H]
    bias = jnp.concatenate(bias_rows, axis=0)             # [LB, 4H]
    if use_proj:
        proj = jnp.concatenate(
            [p["proj"].astype(jnp.float32) for p in params_list],
            axis=0).astype(cdt)                           # [L·H, P]
    else:
        proj = jnp.zeros((num_layers * num_units, out_dim), cdt)

    def peep(name):
        tiles = []
        for p in params_list:
            v = p.get(name)
            if v is None:
                tiles.append(jnp.zeros((batch, num_units), jnp.float32))
            else:
                tiles.append(jnp.tile(
                    v.reshape(1, -1).astype(jnp.float32), (batch, 1)))
        return jnp.concatenate(tiles, axis=0)             # [LB, H]

    # wavefront mask: layer l live at step s iff 0 ≤ s−l < T and
    # (s−l) < seq_len[b]
    s_idx = jnp.arange(padded_s)[:, None, None]           # [S, 1, 1]
    l_idx = jnp.arange(num_layers)[None, :, None]         # [1, L, 1]
    t_idx = s_idx - l_idx                                 # [S, L, 1]
    valid = (t_idx >= 0) & (t_idx < time_steps) \
        & (t_idx < sequence_length[None, None, :])        # [S, L, B]
    mask = valid.astype(jnp.float32).reshape(padded_s, lb, 1)

    if initial_states is None:
        cinit = jnp.zeros((lb, num_units), jnp.float32)
        hinit = jnp.zeros((lb, out_dim), jnp.float32)
    else:
        cinit = jnp.concatenate(
            [c.astype(jnp.float32) for c, _ in initial_states], axis=0)
        hinit = jnp.concatenate(
            [h.astype(jnp.float32) for _, h in initial_states], axis=0)

    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)

    assert affine is None or keep_prob >= 1.0, \
        "the affine (eval-mode BN) path is forward-only; no dropout"
    fused = _make_fused(
        time_steps, num_layers, batch, num_units, out_dim,
        float(forget_bias), use_peep, use_proj, residual,
        jnp.dtype(cdt).name, jnp.dtype(store_dtype).name, time_block,
        bool(interpret), keep_prob=float(keep_prob),
        use_affine=affine is not None, unroll=_kernel_unroll())
    args = [seed, gx0, mask, wz, bias, proj,
            peep("w_i_diag"), peep("w_f_diag"), peep("w_o_diag"),
            cinit, hinit]
    if affine is not None:
        arows = jnp.concatenate(
            [jnp.tile(a.reshape(1, -1).astype(jnp.float32), (batch, 1))
             for a, _ in affine], axis=0)                 # [LB, P]
        brows = jnp.concatenate(
            [jnp.tile(b.reshape(1, -1).astype(jnp.float32), (batch, 1))
             for _, b in affine], axis=0)
        args += [arows, brows]
    out, cfin, hfin = fused(*args)
    outputs = jnp.moveaxis(
        out[num_layers - 1:num_layers - 1 + time_steps], 0, 1)
    states = [(cfin[l * batch:(l + 1) * batch],
               hfin[l * batch:(l + 1) * batch])
              for l in range(num_layers)]
    return outputs, states


def lstm_stack_sharded(mesh, params_list, x, sequence_length,
                       forget_bias=1.0, residual_flags=None,
                       compute_dtype=None, store_dtype="bfloat16",
                       time_block=None, interpret=False,
                       keep_prob=1.0, seed=None, affine=None):
    """Data-parallel wrapper: the wavefront kernel runs per-shard under
    shard_map (a raw pallas_call inside a GSPMD jit would be replicated
    — same rationale as lstm_pallas.bilstm_dual_scan_sharded).

    keep_prob/seed: in-kernel hash dropout; each shard offsets the seed
    by its mesh position so masks are independent across shards (the
    kernel's hash counter indexes LOCAL rows, which repeat per shard).
    affine: per-layer eval-BN channel affines, replicated."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    dp, rep = P(axis), P()
    n = len(params_list)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    if affine is not None:
        a_stack = jnp.stack([a for a, _ in affine])      # [L, P]
        b_stack = jnp.stack([b for _, b in affine])
    else:
        a_stack = b_stack = jnp.zeros((0,), jnp.float32)

    def per_shard(plist, xs, sl, sd, a_st, b_st):
        if keep_prob < 1.0:
            # de-correlate shards: the hash counter restarts at local
            # row 0 on every shard, so fold the mesh position in
            sd = sd + jax.lax.axis_index(axis).astype(jnp.int32) * 7919
        aff = [(a_st[l], b_st[l]) for l in range(n)] \
            if affine is not None else None
        return lstm_stack_fused(
            list(plist), xs, sl, forget_bias,
            residual_flags=residual_flags, compute_dtype=compute_dtype,
            store_dtype=store_dtype, time_block=time_block,
            interpret=interpret, keep_prob=keep_prob, seed=sd,
            affine=aff)

    return jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(rep, dp, dp, rep, rep, rep),
        out_specs=(dp, [(dp, dp)] * n),
        check_vma=False,
    )(tuple(params_list), x, sequence_length, seed, a_stack, b_stack)
