"""Fused NSA fine + sliding attention for prefill/training (forward).

One flash-style pass per query tile over the K/V stream computes BOTH
NSA branches that use rotated q/k (the fused analogue of the reference
Triton kernel's causal+sparse phases and its unused built-in sliding
output, reference: triton_native_sparse_attention.py:74-484,540-551):

* fine output  — online softmax over (selected blocks ∪ block-causal
  diagonal), with per-ROW selection masks rebuilt in-kernel from the
  prefetched top-k indices (no gathered K/V ever materialized in HBM);
* sliding output — online softmax over the causal band
  ``0 <= q_pos - k_pos <= window`` , accumulated only in the k tiles that
  intersect the band.

Compared to the gather-based XLA path this trades extra masked MXU compute
(each q tile scans the causal triangle of k tiles) for zero gather traffic;
on the MXU the q@k tiles are dense [G*Tq, d] x [d, Tk] matmuls.

Long context: below ``STREAM_MIN_NK`` the whole K/V row of one
(batch, kv-head) is block-mapped into VMEM (fastest at trainable lengths,
and the layout the seq-4096 training path compiles with); at or above it
the forward switches to a streaming variant where K/V stay in HBM packed
as ``k||v`` on the lane dim (2d = 128-aligned — Mosaic requires manual-DMA
slices to be 128-aligned in the lane dim) and flow through a
double-buffered VMEM scratch, so per-program VMEM is O(Tq + Bk) and
context length is bounded by HBM, not VMEM.  q is zero-padded to 2d lanes
so the v half contracts to zero in q @ kv^T, and the v-half columns of
p @ kv are the attention output, sliced outside the kernel.

Semantics note: when ``selection_block_size == compress_stride`` the
reference can select the diagonal block itself, double-counting it in the
softmax (duplicate gathered keys).  A masked union cannot double-count, so
this kernel requires the (default) ``num_compress_per_fine > 1`` regime
where the diagonal is masked out of selection and the two formulations
agree exactly; the wrapper asserts this.

GQA layout: query heads of one KV head are adjacent ([b, (kvh g), n, d]),
so a (1, G, Tq, d) q block per (b, kv-head) program is contiguous.

Backward: ``nsa_fine_sliding_attention`` is wrapped in jax.custom_vjp whose
backward re-runs the XLA oracle's VJP (exact same math); a native Pallas
backward can replace it without touching callers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..common import round_up_mult

NEG_INF = -1e30


def _masks(row_pos, q_blk, k_pos, k_blk_id, sel_idx, sel_msk, G, num_sel,
           window, n_k):
    """Recompute the fine/sliding masks for one (q tile, k tile) pair."""
    causal = (row_pos >= k_pos) & (k_pos < n_k)
    sel_hit = jnp.zeros(row_pos.shape, jnp.bool_)
    for si in range(num_sel):
        idx_s = sel_idx[:, si:si + 1]                     # [Tq, 1]
        msk_s = sel_msk[:, si:si + 1] != 0
        idx_rows = jnp.concatenate([idx_s] * G, axis=0)   # [R, 1]
        msk_rows = jnp.concatenate([msk_s] * G, axis=0)
        sel_hit = sel_hit | ((k_blk_id == idx_rows) & msk_rows)
    fine_ok = causal & (sel_hit | (k_blk_id == q_blk))
    slide_ok = causal & ((row_pos - k_pos) <= window)
    return fine_ok, slide_ok


def _kernel(idx_ref, msk_ref, q_ref, k_ref, v_ref, fo_ref, so_ref,
            flse_ref, slse_ref, *,
            scale, sel_block, window, block_k, n_k, num_sel):
    """grid (b, kvh, n_q_tiles); q block [1, G, Tq, d]; k/v full rows."""
    qi = pl.program_id(2)
    _, _, G, Tq, d = q_ref.shape
    R = G * Tq

    q = q_ref[0, 0].reshape(R, d).astype(jnp.float32) * scale
    # global query position per row (rows are [g, tq] row-major)
    row_pos = qi * Tq + jax.lax.broadcasted_iota(jnp.int32, (R, block_k), 0) % Tq
    q_blk = row_pos // sel_block

    # per-row selection (idx/msk blocks are [1, 1, Tq, S])
    sel_idx = idx_ref[0, 0]                    # [Tq, S] int32
    sel_msk = msk_ref[0, 0]                    # [Tq, S] int32 (0/1)

    num_kb = pl.cdiv(n_k, block_k)
    num_kb_live = jnp.minimum(num_kb, ((qi + 1) * Tq + block_k - 1) // block_k)

    def body(i, carry):
        fm, fl, facc, sm, sl, sacc = carry
        kblk = k_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vblk = v_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                       # [R, Bk]

        k_pos = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (R, block_k), 1
        )
        k_blk_id = k_pos // sel_block
        fine_ok, slide_ok = _masks(
            row_pos, q_blk, k_pos, k_blk_id, sel_idx, sel_msk, G, num_sel,
            window, n_k,
        )

        def online(m, l, acc, mask):
            sm_ = jnp.where(mask, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(sm_, axis=-1, keepdims=True))
            # explicit zero under the mask: a fully-masked tile with
            # m == NEG_INF would otherwise contribute exp(0) = 1 per column
            p = jnp.where(mask, jnp.exp(sm_ - m_new), 0.0)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * alpha + jax.lax.dot_general(
                p, vblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc_new

        fm, fl, facc = online(fm, fl, facc, fine_ok)

        # the sliding band only lives in the last few k tiles of this row
        # range; skip its update elsewhere
        in_band = (i + 1) * block_k > qi * Tq - window
        sm, sl, sacc = jax.lax.cond(
            in_band,
            lambda args: online(args[0], args[1], args[2], slide_ok),
            lambda args: args,
            (sm, sl, sacc),
        )
        return fm, fl, facc, sm, sl, sacc

    z = jnp.zeros((R, 1), jnp.float32)
    zacc = jnp.zeros((R, d), jnp.float32)
    init = (jnp.full((R, 1), NEG_INF, jnp.float32), z, zacc,
            jnp.full((R, 1), NEG_INF, jnp.float32), z, zacc)
    fm, fl, facc, sm, sl, sacc = jax.lax.fori_loop(0, num_kb_live, body, init)

    fo_ref[0, 0] = (facc / jnp.maximum(fl, 1e-30)).reshape(G, Tq, d).astype(fo_ref.dtype)
    so_ref[0, 0] = (sacc / jnp.maximum(sl, 1e-30)).reshape(G, Tq, d).astype(so_ref.dtype)
    flse_ref[0, 0] = (fm + jnp.log(jnp.maximum(fl, 1e-30))).reshape(G, Tq, 1)
    slse_ref[0, 0] = (sm + jnp.log(jnp.maximum(sl, 1e-30))).reshape(G, Tq, 1)


# K/V rows at least this long use the HBM-streaming forward (the
# block-mapped whole-row layout is faster below it and is the compile
# configuration the seq-4096 training path is validated with)
from .runtime import STREAM_MIN_NK  # noqa: E402  (shared threshold)
# test hook: force the streaming forward at any length
FORCE_STREAM = False


def _kernel_stream(idx_ref, msk_ref, q_ref, kv_ref, fo_ref, so_ref,
                   flse_ref, slse_ref, kv_s, sem_kv, *,
                   scale, sel_block, window, block_k, n_k, num_sel):
    """Long-context forward: kv_ref is k||v packed on the lane dim
    ([b, kvh, nk_pad, 2d], 128-aligned so manual DMA slices are legal),
    held in HBM and streamed tile-by-tile through double-buffered VMEM
    scratch (the DMA for tile i+1 is issued before computing tile i).
    q arrives zero-padded to 2d lanes, so q @ kv^T = q @ k^T (the v half
    contracts with zeros) and the v-half columns of p @ kv are the
    attention output (the k-half columns are discarded by the wrapper).
    Per-program VMEM is O(Tq + Bk), independent of n_k."""
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    qi = pl.program_id(2)
    _, _, G, Tq, d2 = q_ref.shape          # d2 = 2 * d
    R = G * Tq

    q = q_ref[0, 0].reshape(R, d2).astype(jnp.float32) * scale
    row_pos = qi * Tq + jax.lax.broadcasted_iota(jnp.int32, (R, block_k), 0) % Tq
    q_blk = row_pos // sel_block
    sel_idx = idx_ref[0, 0]
    sel_msk = msk_ref[0, 0]

    num_kb = pl.cdiv(n_k, block_k)
    num_kb_live = jnp.minimum(num_kb, ((qi + 1) * Tq + block_k - 1) // block_k)

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            kv_ref.at[bi, hi, pl.ds(i * block_k, block_k), :],
            kv_s.at[slot],
            sem_kv.at[slot],
        )

    get_dma(0, 0).start()

    def body(i, carry):
        fm, fl, facc, sm, sl, sacc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < num_kb_live)
        def _():
            get_dma(1 - slot, i + 1).start()

        get_dma(slot, i).wait()
        kvblk = kv_s[slot].astype(jnp.float32)             # [Bk, 2d]
        s = jax.lax.dot_general(
            q, kvblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [R, Bk] = q @ k^T

        k_pos = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (R, block_k), 1
        )
        k_blk_id = k_pos // sel_block
        fine_ok, slide_ok = _masks(
            row_pos, q_blk, k_pos, k_blk_id, sel_idx, sel_msk, G, num_sel,
            window, n_k,
        )

        def online(m, l, acc, mask):
            sm_ = jnp.where(mask, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(sm_, axis=-1, keepdims=True))
            p = jnp.where(mask, jnp.exp(sm_ - m_new), 0.0)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * alpha + jax.lax.dot_general(
                p, kvblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # [R, 2d]
            return m_new, l_new, acc_new

        fm, fl, facc = online(fm, fl, facc, fine_ok)
        in_band = (i + 1) * block_k > qi * Tq - window
        sm, sl, sacc = jax.lax.cond(
            in_band,
            lambda args: online(args[0], args[1], args[2], slide_ok),
            lambda args: args,
            (sm, sl, sacc),
        )
        return fm, fl, facc, sm, sl, sacc

    z = jnp.zeros((R, 1), jnp.float32)
    zacc = jnp.zeros((R, d2), jnp.float32)
    init = (jnp.full((R, 1), NEG_INF, jnp.float32), z, zacc,
            jnp.full((R, 1), NEG_INF, jnp.float32), z, zacc)
    fm, fl, facc, sm, sl, sacc = jax.lax.fori_loop(0, num_kb_live, body, init)

    fo_ref[0, 0] = (facc / jnp.maximum(fl, 1e-30)).reshape(G, Tq, d2).astype(fo_ref.dtype)
    so_ref[0, 0] = (sacc / jnp.maximum(sl, 1e-30)).reshape(G, Tq, d2).astype(so_ref.dtype)
    flse_ref[0, 0] = (fm + jnp.log(jnp.maximum(fl, 1e-30))).reshape(G, Tq, 1)
    slse_ref[0, 0] = (sm + jnp.log(jnp.maximum(sl, 1e-30))).reshape(G, Tq, 1)


def _forward(
    rq, rk, v, sel_idx, sel_mask, *, sel_block, window, scale,
    block_q, block_k, interpret,
):
    from .runtime import resolve_interpret
    interpret = resolve_interpret(interpret)
    b, h, n, d = rq.shape
    _, kvh, n_k, _ = rk.shape
    G = h // kvh
    S = sel_idx.shape[-1]

    Tq = min(block_q, round_up_mult(n, 128))
    Bk = min(block_k, round_up_mult(n_k, 128))
    n_pad = round_up_mult(n, Tq)
    nk_pad = round_up_mult(n_k, Bk)

    q5 = rq.reshape(b, kvh, G, n, d)
    if n_pad != n:
        q5 = jnp.pad(q5, ((0, 0), (0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    kp = jnp.pad(rk, ((0, 0), (0, 0), (0, nk_pad - n_k), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, nk_pad - n_k), (0, 0)))
    idx = jnp.pad(sel_idx, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    msk = jnp.pad(sel_mask.astype(jnp.int32),
                  ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))

    stream = (FORCE_STREAM or n_k >= STREAM_MIN_NK) and (2 * d) % 128 == 0
    grid = (b, kvh, n_pad // Tq)
    sel_spec = pl.BlockSpec((1, 1, Tq, S), lambda bi, hi, qi: (bi, hi, qi, 0),
                            memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, G, Tq, 1),
                            lambda bi, hi, qi: (bi, hi, 0, qi, 0),
                            memory_space=pltpu.VMEM)
    d_out = 2 * d if stream else d
    q_spec = pl.BlockSpec((1, 1, G, Tq, d_out),
                          lambda bi, hi, qi: (bi, hi, 0, qi, 0),
                          memory_space=pltpu.VMEM)

    if stream:
        kvpack = jnp.concatenate([kp, vp], axis=-1)        # [b,kvh,nk_pad,2d]
        q5 = jnp.pad(q5, ((0, 0),) * 4 + ((0, d),))        # zero v-half lanes
        kernel = functools.partial(
            _kernel_stream, scale=scale, sel_block=sel_block, window=window,
            block_k=Bk, n_k=n_k, num_sel=S,
        )
        in_specs = [sel_spec, sel_spec, q_spec,
                    pl.BlockSpec(memory_space=pl.ANY)]     # kv stays in HBM
        operands = (idx.astype(jnp.int32), msk, q5, kvpack)
        scratch = [pltpu.VMEM((2, Bk, 2 * d), rk.dtype),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        kernel = functools.partial(
            _kernel, scale=scale, sel_block=sel_block, window=window,
            block_k=Bk, n_k=n_k, num_sel=S,
        )
        kv_spec = pl.BlockSpec((1, 1, nk_pad, d),
                               lambda bi, hi, qi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM)
        in_specs = [sel_spec, sel_spec, q_spec, kv_spec, kv_spec]
        operands = (idx.astype(jnp.int32), msk, q5, kp, vp)
        scratch = []

    fo, so, f_lse, s_lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(q_spec, q_spec, lse_spec, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, kvh, G, n_pad, d_out), rq.dtype),
            jax.ShapeDtypeStruct((b, kvh, G, n_pad, d_out), rq.dtype),
            jax.ShapeDtypeStruct((b, kvh, G, n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, kvh, G, n_pad, 1), jnp.float32),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)

    if stream:
        # v-half columns of p @ kv are the attention output
        fo = fo[..., d:]
        so = so[..., d:]
    fo = fo.reshape(b, h, n_pad, d)[:, :, :n]
    so = so.reshape(b, h, n_pad, d)[:, :, :n]
    return fo, so, f_lse, s_lse


def _oracle(rq, rk, v, sel_idx, sel_mask, gates, sel_block, window, scale,
            chunk: int = 128):
    """XLA composite with identical semantics (used for the backward).

    Fine attention runs per query chunk under lax.map + remat so the
    backward's recomputation stays memory-bounded at long sequence.
    """
    from ..attention import (
        blockify_kv,
        fine_attend_core,
        sliding_window_attention,
    )

    b, h, n, d = rq.shape
    Hs = sel_idx.shape[1]
    kb, vb = blockify_kv(rk, v, sel_block, Hs)

    if n <= chunk:
        fine = fine_attend_core(
            rq, kb, vb, sel_idx, sel_mask, gates, jnp.arange(n), True, scale
        )
    else:
        Nc = round_up_mult(n, chunk)
        C = Nc // chunk

        def to_chunks(t, last):
            pad = [(0, 0)] * t.ndim
            pad[2] = (0, Nc - n)
            t = jnp.pad(t, pad)
            return jnp.moveaxis(
                t.reshape(*t.shape[:2], C, chunk, last), 2, 0
            )

        xs = (
            to_chunks(rq, d),
            to_chunks(sel_idx, sel_idx.shape[-1]),
            to_chunks(sel_mask, sel_mask.shape[-1]),
            (to_chunks(gates, gates.shape[-1]) if gates is not None
             else jnp.zeros((C,))),
            jnp.arange(Nc).reshape(C, chunk),
        )

        def one(args):
            qc, ic, mc, gc, pc = args
            g_ = gc if gates is not None else None
            return fine_attend_core(qc, kb, vb, ic, mc, g_, pc, True, scale)

        outs = jax.lax.map(jax.checkpoint(one), xs)
        fine = jnp.moveaxis(outs, 0, 2).reshape(b, h, Nc, d)[:, :, :n]

    sliding = sliding_window_attention(rq, rk, v, window, causal=True, scale=scale)
    return fine, sliding


# ---------------------------------------------------------------------------
# Backward kernels (atomics-free, flash-style):
#   dq kernel   — q-major grid, same loop structure as the forward;
#   dkv kernel  — kv-major grid (each k tile owned by ONE program, so dk/dv
#                 accumulate locally; the reference Triton backward needed
#                 relaxed atomic_add here, triton_...py:1040-1133);
#   d_gates     — accumulated in the dq kernel (the Triton kernel's
#                 sel_grads output for differentiable top-k, :1061-1080).
# Linearized at straight-through gate value 1.0, like the forward.
# ---------------------------------------------------------------------------

# toggle for tests: route the custom-vjp backward through the XLA oracle
# instead of the Pallas kernels
USE_ORACLE_BACKWARD = False


def _dq_kernel(idx_ref, msk_ref, q_ref, k_ref, v_ref, dfo_ref, dso_ref,
               flse_ref, slse_ref, fdel_ref, sdel_ref, dq_ref, dg_ref, *,
               scale, sel_block, window, block_k, n_k, num_sel, want_gates):
    qi = pl.program_id(2)
    _, _, G, Tq, d = q_ref.shape
    R = G * Tq

    q = q_ref[0, 0].reshape(R, d).astype(jnp.float32) * scale
    dfo = dfo_ref[0, 0].reshape(R, d).astype(jnp.float32)
    dso = dso_ref[0, 0].reshape(R, d).astype(jnp.float32)
    f_lse = flse_ref[0, 0].reshape(R, 1)   # [G, Tq, 1] -> sublane merge
    s_lse = slse_ref[0, 0].reshape(R, 1)
    f_del = fdel_ref[0, 0].reshape(R, 1)
    s_del = sdel_ref[0, 0].reshape(R, 1)

    row_pos = qi * Tq + jax.lax.broadcasted_iota(jnp.int32, (R, block_k), 0) % Tq
    q_blk = row_pos // sel_block
    sel_idx = idx_ref[0, 0]
    sel_msk = msk_ref[0, 0]

    num_kb = pl.cdiv(n_k, block_k)
    num_kb_live = jnp.minimum(num_kb, ((qi + 1) * Tq + block_k - 1) // block_k)

    def body(i, carry):
        dq_acc, dg_acc = carry
        kblk = k_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vblk = v_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        k_pos = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (R, block_k), 1
        )
        k_blk_id = k_pos // sel_block
        fine_ok, slide_ok = _masks(
            row_pos, q_blk, k_pos, k_blk_id, sel_idx, sel_msk, G, num_sel,
            window, n_k,
        )

        def branch_ds(mask, lse, delta, do):
            # clamp the exponent: padded/garbage rows have lse=-1e30 but
            # their cotangents are zero, so dS is 0 either way
            p = jnp.where(mask, jnp.exp(jnp.minimum(s - lse, 30.0)), 0.0)
            dp = jax.lax.dot_general(
                do, vblk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return p * (dp - delta)

        ds_f = branch_ds(fine_ok, f_lse, f_del, dfo)
        in_band = (i + 1) * block_k > qi * Tq - window

        def with_slide(args):
            ds_f_, dq_acc_ = args
            ds_s = branch_ds(slide_ok, s_lse, s_del, dso)
            return ds_f_ + ds_s, dq_acc_

        ds_tot, dq_acc = jax.lax.cond(
            in_band, with_slide, lambda a: a, (ds_f, dq_acc)
        )
        dq_acc = dq_acc + jax.lax.dot_general(
            ds_tot, kblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        if want_gates:
            # d gate[slot] = sum over the slot's columns of dS_fine * s;
            # accumulate via whole-array add (a sliced .at[].add would
            # lower to scatter-add, which Mosaic TC does not support)
            prod = ds_f * s
            cols = []
            for si in range(num_sel):
                idx_s = sel_idx[:, si:si + 1]
                msk_s = sel_msk[:, si:si + 1] != 0
                idx_rows = jnp.concatenate([idx_s] * G, axis=0)
                msk_rows = jnp.concatenate([msk_s] * G, axis=0)
                hit = (k_blk_id == idx_rows) & msk_rows
                contrib = jnp.sum(
                    jnp.where(hit, prod, 0.0), axis=-1, keepdims=True
                )                                              # [R, 1]
                # reduce over the G query-head groups (static slices)
                per_q = contrib[0:Tq]
                for gi in range(1, G):
                    per_q = per_q + contrib[gi * Tq:(gi + 1) * Tq]
                cols.append(per_q)
            dg_acc = dg_acc + jnp.concatenate(cols, axis=1)    # [Tq, S]
        return dq_acc, dg_acc

    dq0 = jnp.zeros((R, d), jnp.float32)
    dg0 = jnp.zeros((Tq, num_sel), jnp.float32)
    dq_acc, dg_acc = jax.lax.fori_loop(0, num_kb_live, body, (dq0, dg0))

    dq_ref[0, 0] = (dq_acc * scale).reshape(G, Tq, d).astype(dq_ref.dtype)
    dg_ref[0, 0] = dg_acc.astype(dg_ref.dtype)


def _dkv_kernel(idx_ref, msk_ref, q_ref, k_ref, v_ref, dfo_ref, dso_ref,
                flse_ref, slse_ref, fdel_ref, sdel_ref, dk_ref, dv_ref, *,
                scale, sel_block, window, block_q, n_k, num_sel, n_pad):
    ki = pl.program_id(2)
    Bk = dk_ref.shape[2]
    _, _, G, _, d = q_ref.shape
    Tq = block_q
    R = G * Tq

    kblk = k_ref[0, 0].astype(jnp.float32)                 # [Bk, d]
    vblk = v_ref[0, 0].astype(jnp.float32)
    k_pos = ki * Bk + jax.lax.broadcasted_iota(jnp.int32, (R, Bk), 1)
    k_blk_id = k_pos // sel_block

    num_qt = n_pad // Tq
    qt0 = (ki * Bk) // Tq                                  # first q tile ≥ diag

    def body(qi, carry):
        dk_acc, dv_acc = carry
        qt = q_ref[0, 0, :, pl.ds(qi * Tq, Tq), :].reshape(R, d).astype(
            jnp.float32
        ) * scale
        dfo = dfo_ref[0, 0, :, pl.ds(qi * Tq, Tq), :].reshape(R, d).astype(
            jnp.float32
        )
        f_lse = flse_ref[0, 0, :, pl.ds(qi * Tq, Tq), :].reshape(R, 1)
        f_del = fdel_ref[0, 0, :, pl.ds(qi * Tq, Tq), :].reshape(R, 1)
        sel_idx = idx_ref[0, 0, pl.ds(qi * Tq, Tq)]
        sel_msk = msk_ref[0, 0, pl.ds(qi * Tq, Tq)]

        row_pos = qi * Tq + jax.lax.broadcasted_iota(
            jnp.int32, (R, Bk), 0
        ) % Tq
        q_blk = row_pos // sel_block
        s = jax.lax.dot_general(
            qt, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        fine_ok, slide_ok = _masks(
            row_pos, q_blk, k_pos, k_blk_id, sel_idx, sel_msk, G, num_sel,
            window, n_k,
        )

        def branch(mask, lse, delta, do):
            p = jnp.where(mask, jnp.exp(jnp.minimum(s - lse, 30.0)), 0.0)
            dp = jax.lax.dot_general(
                do, vblk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta)
            dv_c = jax.lax.dot_general(
                p, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # [Bk, d]
            dk_c = jax.lax.dot_general(
                ds, qt, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # [Bk, d]
            return dk_c, dv_c

        dk_f, dv_f = branch(fine_ok, f_lse, f_del, dfo)
        dk_acc = dk_acc + dk_f
        dv_acc = dv_acc + dv_f

        in_band = qi * Tq <= ki * Bk + Bk - 1 + window

        def with_slide(args):
            dk_a, dv_a = args
            s_lse = slse_ref[0, 0, :, pl.ds(qi * Tq, Tq), :].reshape(R, 1)
            s_del = sdel_ref[0, 0, :, pl.ds(qi * Tq, Tq), :].reshape(R, 1)
            dso = dso_ref[0, 0, :, pl.ds(qi * Tq, Tq)].reshape(R, d).astype(
                jnp.float32
            )
            dk_s, dv_s = branch(slide_ok, s_lse, s_del, dso)
            return dk_a + dk_s, dv_a + dv_s

        dk_acc, dv_acc = jax.lax.cond(
            in_band, with_slide, lambda a: a, (dk_acc, dv_acc)
        )
        return dk_acc, dv_acc

    z = jnp.zeros((Bk, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(qt0, num_qt, body, (z, z))
    # no extra scale: qt was pre-scaled, so dS^T @ qt already carries it
    dk_ref[0, 0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_acc.astype(dv_ref.dtype)


def _backward_kernels(
    rq, rk, v, sel_idx, sel_mask, fo, so, f_lse, s_lse, dfo, dso,
    *, sel_block, window, scale, block_q, block_k, interpret,
):
    """Pallas backward: returns (dq [b,h,n,d], dk, dv [b,kvh,n,d],
    dgates [b,kvh,n,S])."""
    from .runtime import resolve_interpret
    interpret = resolve_interpret(interpret)
    b, h, n, d = rq.shape
    _, kvh, n_k, _ = rk.shape
    G = h // kvh
    S = sel_idx.shape[-1]
    Tq = min(block_q, round_up_mult(n, 128))
    Bk = min(block_k, round_up_mult(n_k, 128))
    n_pad = round_up_mult(n, Tq)
    nk_pad = round_up_mult(n_k, Bk)

    def pad_q5(t):
        t5 = t.reshape(b, kvh, G, n, d)
        return jnp.pad(t5, ((0, 0),) * 3 + ((0, n_pad - n), (0, 0)))

    q5 = pad_q5(rq)
    dfo5 = pad_q5(dfo)
    dso5 = pad_q5(dso)
    kp = jnp.pad(rk, ((0, 0), (0, 0), (0, nk_pad - n_k), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, nk_pad - n_k), (0, 0)))
    idx = jnp.pad(sel_idx, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    msk = jnp.pad(sel_mask.astype(jnp.int32),
                  ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))

    # deltas: rowsum(o * do), cheap XLA elementwise (padded rows -> 0)
    def delta(o, do):
        dl = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), -1)
        dl = dl.reshape(b, kvh, G, n, 1)
        return jnp.pad(dl, ((0, 0),) * 3 + ((0, n_pad - n), (0, 0)))

    f_del = delta(fo, dfo)
    s_del = delta(so, dso)

    q_tile5 = pl.BlockSpec((1, 1, G, Tq, d),
                           lambda bi, hi, qi: (bi, hi, 0, qi, 0),
                           memory_space=pltpu.VMEM)
    q_full5 = pl.BlockSpec((1, 1, G, n_pad, d),
                           lambda bi, hi, ki: (bi, hi, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    lse_tile = pl.BlockSpec((1, 1, G, Tq, 1),
                            lambda bi, hi, qi: (bi, hi, 0, qi, 0),
                            memory_space=pltpu.VMEM)
    lse_full = pl.BlockSpec((1, 1, G, n_pad, 1),
                            lambda bi, hi, ki: (bi, hi, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    kv_full = pl.BlockSpec((1, 1, nk_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                           memory_space=pltpu.VMEM)
    kv_tile = pl.BlockSpec((1, 1, Bk, d), lambda bi, hi, ki: (bi, hi, ki, 0),
                           memory_space=pltpu.VMEM)
    sel_tile = pl.BlockSpec((1, 1, Tq, S), lambda bi, hi, qi: (bi, hi, qi, 0),
                            memory_space=pltpu.VMEM)
    sel_full = pl.BlockSpec((1, 1, n_pad, S), lambda bi, hi, ki: (bi, hi, 0, 0),
                            memory_space=pltpu.VMEM)

    dq5, dgates = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, sel_block=sel_block, window=window,
            block_k=Bk, n_k=n_k, num_sel=S, want_gates=True,
        ),
        grid=(b, kvh, n_pad // Tq),
        in_specs=[sel_tile, sel_tile, q_tile5, kv_full, kv_full,
                  q_tile5, q_tile5, lse_tile, lse_tile, lse_tile, lse_tile],
        out_specs=(q_tile5, sel_tile),
        out_shape=(
            jax.ShapeDtypeStruct((b, kvh, G, n_pad, d), rq.dtype),
            jax.ShapeDtypeStruct((b, kvh, n_pad, S), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(idx.astype(jnp.int32), msk, q5, kp, vp, dfo5, dso5,
      f_lse, s_lse, f_del, s_del)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, sel_block=sel_block, window=window,
            block_q=Tq, n_k=n_k, num_sel=S, n_pad=n_pad,
        ),
        grid=(b, kvh, nk_pad // Bk),
        in_specs=[sel_full, sel_full, q_full5, kv_tile, kv_tile,
                  q_full5, q_full5, lse_full, lse_full, lse_full, lse_full],
        out_specs=(kv_tile, kv_tile),
        out_shape=(
            jax.ShapeDtypeStruct((b, kvh, nk_pad, d), rk.dtype),
            jax.ShapeDtypeStruct((b, kvh, nk_pad, d), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(idx.astype(jnp.int32), msk, q5, kp, vp, dfo5, dso5,
      f_lse, s_lse, f_del, s_del)

    dq = dq5.reshape(b, h, n_pad, d)[:, :, :n]
    dk = dk[:, :, :n_k]
    dv = dv[:, :, :n_k]
    dgates = dgates[:, :, :n]
    return dq, dk, dv, dgates


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11)
)
def nsa_fine_sliding_attention(
    rq, rk, v, sel_idx, sel_mask, gates,
    sel_block: int, window: int, scale: float,
    block_q: int = 128, block_k: int = 512, interpret: bool | None = None,
):
    """Fused fine+sliding NSA attention with exact straight-through grads.

    rq [b,h,n,d] rotated queries; rk/v [b,kvh,n,d]; sel_idx/sel_mask/gates
    [b,kvh,n,S] (shared selection only).  Returns (fine_out, sliding_out).

    The kernel forward ignores ``gates`` — with straight-through top-k
    their forward value is exactly 1.0 (reference:
    native_sparse_attention.py:148-149,715) — and the Pallas backward
    produces dq/dk/dv plus d_gates (the selection-gradient output of the
    reference Triton kernel) at the same linearization point.
    """
    fo, so, _, _ = _forward(
        rq, rk, v, sel_idx, sel_mask, sel_block=sel_block, window=window,
        scale=scale, block_q=block_q, block_k=block_k, interpret=interpret,
    )
    return fo, so


def _fwd(rq, rk, v, sel_idx, sel_mask, gates, sel_block, window, scale,
         block_q, block_k, interpret):
    fo, so, f_lse, s_lse = _forward(
        rq, rk, v, sel_idx, sel_mask, sel_block=sel_block, window=window,
        scale=scale, block_q=block_q, block_k=block_k, interpret=interpret,
    )
    return (fo, so), (rq, rk, v, sel_idx, sel_mask, gates, fo, so,
                      f_lse, s_lse)


def _bwd(sel_block, window, scale, block_q, block_k, interpret,
         residuals, cotangents):
    rq, rk, v, sel_idx, sel_mask, gates, fo, so, f_lse, s_lse = residuals
    dfo, dso = cotangents

    if USE_ORACLE_BACKWARD:
        if gates is None:
            _, vjp_fn = jax.vjp(
                lambda q_, k_, v_: _oracle(
                    q_, k_, v_, sel_idx, sel_mask, None, sel_block, window,
                    scale,
                ),
                rq, rk, v,
            )
            dq, dk, dv = vjp_fn(cotangents)
            return dq, dk, dv, None, None, None
        _, vjp_fn = jax.vjp(
            lambda q_, k_, v_, g_: _oracle(
                q_, k_, v_, sel_idx, sel_mask, g_, sel_block, window, scale
            ),
            rq, rk, v, gates,
        )
        dq, dk, dv, dg = vjp_fn(cotangents)
        return dq, dk, dv, None, None, dg

    dq, dk, dv, dgates = _backward_kernels(
        rq, rk, v, sel_idx, sel_mask, fo, so, f_lse, s_lse, dfo, dso,
        sel_block=sel_block, window=window, scale=scale,
        block_q=block_q, block_k=block_k, interpret=interpret,
    )
    dg = dgates.astype(gates.dtype) if gates is not None else None
    return dq, dk, dv, None, None, dg


nsa_fine_sliding_attention.defvjp(_fwd, _bwd)
