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


def _kernel(idx_ref, msk_ref, q_ref, k_ref, v_ref, fo_ref, so_ref, *,
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
        causal = (row_pos >= k_pos) & (k_pos < n_k)

        # fine mask: selected-by-this-row OR block-causal diagonal
        sel_hit = jnp.zeros((R, block_k), jnp.bool_)
        for si in range(num_sel):
            # row-wise selected block id, expanded over the G query heads
            # (2-D concatenation: Mosaic rejects 1-D tile/reshape here)
            idx_s = sel_idx[:, si:si + 1]                 # [Tq, 1]
            msk_s = sel_msk[:, si:si + 1] != 0            # [Tq, 1]
            idx_rows = jnp.concatenate([idx_s] * G, axis=0)   # [R, 1]
            msk_rows = jnp.concatenate([msk_s] * G, axis=0)
            sel_hit = sel_hit | ((k_blk_id == idx_rows) & msk_rows)
        fine_ok = causal & (sel_hit | (k_blk_id == q_blk))

        # sliding mask: exact band
        slide_ok = causal & ((row_pos - k_pos) <= window)

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


def _forward(
    rq, rk, v, sel_idx, sel_mask, *, sel_block, window, scale,
    block_q, block_k, interpret,
):
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

    grid = (b, kvh, n_pad // Tq)
    fo, so = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, sel_block=sel_block, window=window,
            block_k=Bk, n_k=n_k, num_sel=S,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Tq, S), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tq, S), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G, Tq, d),
                         lambda bi, hi, qi: (bi, hi, 0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, G, Tq, d),
                         lambda bi, hi, qi: (bi, hi, 0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G, Tq, d),
                         lambda bi, hi, qi: (bi, hi, 0, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, kvh, G, n_pad, d), rq.dtype),
            jax.ShapeDtypeStruct((b, kvh, G, n_pad, d), rq.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(idx.astype(jnp.int32), msk, q5, kp, vp)

    fo = fo.reshape(b, h, n_pad, d)[:, :, :n]
    so = so.reshape(b, h, n_pad, d)[:, :, :n]
    return fo, so


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


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11)
)
def nsa_fine_sliding_attention(
    rq, rk, v, sel_idx, sel_mask, gates,
    sel_block: int, window: int, scale: float,
    block_q: int = 128, block_k: int = 512, interpret: bool = False,
):
    """Fused fine+sliding NSA attention with exact straight-through grads.

    rq [b,h,n,d] rotated queries; rk/v [b,kvh,n,d]; sel_idx/sel_mask/gates
    [b,kvh,n,S] (shared selection only).  Returns (fine_out, sliding_out).

    The kernel forward ignores ``gates`` — with straight-through top-k
    their forward value is exactly 1.0 (reference:
    native_sparse_attention.py:148-149,715) — while the backward runs the
    XLA oracle's VJP at the same linearization point, so gradients
    (including d/d gates for differentiable top-k) are exact.
    """
    return _forward(
        rq, rk, v, sel_idx, sel_mask, sel_block=sel_block, window=window,
        scale=scale, block_q=block_q, block_k=block_k, interpret=interpret,
    )


def _fwd(rq, rk, v, sel_idx, sel_mask, gates, sel_block, window, scale,
         block_q, block_k, interpret):
    out = _forward(
        rq, rk, v, sel_idx, sel_mask, sel_block=sel_block, window=window,
        scale=scale, block_q=block_q, block_k=block_k, interpret=interpret,
    )
    return out, (rq, rk, v, sel_idx, sel_mask, gates)


def _bwd(sel_block, window, scale, block_q, block_k, interpret,
         residuals, cotangents):
    rq, rk, v, sel_idx, sel_mask, gates = residuals
    if gates is None:
        _, vjp_fn = jax.vjp(
            lambda q_, k_, v_: _oracle(
                q_, k_, v_, sel_idx, sel_mask, None, sel_block, window, scale
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


nsa_fine_sliding_attention.defvjp(_fwd, _bwd)
