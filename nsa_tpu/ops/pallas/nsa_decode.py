"""Fused decode-step kernels for the NSA branches.

Two Pallas kernels replace ~25 small XLA ops per layer in the decode step
(on this backend every small kernel costs ~20-30 us regardless of size, so
decode latency is kernel count x fixed cost — fusion is the whole game):

* ``decode_select`` — compressed attention (branch 1) AND the full
  selection pipeline in one kernel: masked compressed logits over the
  packed ckv cache + mem slots, softmax, branch-1 output, grouped
  importance, stride->selection-block regrouping, diagonal masking,
  pad-softmax-strip normalization, and iterative top-k.  Outputs the
  branch-1 result plus the gathered-block id list (selected + trailing
  window blocks) and the score-validity mask.
* ``decode_attend`` — fine + sliding attention over the XLA-gathered
  packed blocks: one q.K matmul, two masked softmaxes (selected-union-
  diagonal and exact band), two weighted sums.

The block gather between them stays in XLA (its vmapped gather is already
near bandwidth on this shape).  Grid is (kvh, batch_tiles): NSA selection
is per KV head, so each program owns one head's slice — the same layout
the tensor-parallel sharding uses.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .runtime import resolve_interpret

NEG = -1e30
SCORE_EPS = 1e-10


INFO_WIDTH = 128  # lane-aligned packed (idx | msk) output width


def _pick_batch_tile(b: int, cap: int) -> int:
    """Largest power-of-two divisor of ``b`` that is <= cap.

    The batch tile is the leading dim of every block spec, so any divisor
    is legal; halving until it divides keeps odd batch sizes (24, 48, 80…)
    on the kernel path instead of tripping a trace-time assert."""
    bt = min(cap, b)
    while bt > 1 and b % bt:
        bt //= 2
    return bt


def _select_kernel(
    scal_ref,       # SMEM [2]: t, num_cb
    q_ref,          # [Bt, 1, g, d]
    ckv_ref,        # [Bt, 1, Wc, 2d]
    memk_ref,       # [1, M, d]
    memv_ref,       # [1, M, d]
    cout_ref,       # [Bt, 1, g, d]
    info_ref,       # [Bt, INFO_WIDTH]: cols [0,n_slots) idx, [n_slots,+S) msk
    *, scale, stride, sel_block, window, num_sel, n_slide, max_blocks,
):
    t = scal_ref[0]
    num_cb = scal_ref[1]
    Bt, _, g, d = q_ref.shape
    Wc = ckv_ref.shape[2]
    M = memk_ref.shape[1]
    npf = sel_block // stride

    q = q_ref[:, 0].astype(jnp.float32)                    # [Bt, g, d]
    ck = ckv_ref[:, 0, :, :d].astype(jnp.float32)          # [Bt, Wc, d]
    cv = ckv_ref[:, 0, :, d:].astype(jnp.float32)

    # compressed logits: batched [g, d] x [d, Wc]
    sim_c = jax.lax.dot_general(
        q, ck, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                                              # [Bt, g, Wc]
    cb_ids = jax.lax.broadcasted_iota(jnp.int32, (Bt, g, Wc), 2)
    sim_c = jnp.where(cb_ids < num_cb, sim_c, NEG)

    memk = memk_ref[0].astype(jnp.float32)                 # [M, d]
    sim_m = jax.lax.dot_general(
        q, memk, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                              # [Bt, g, M]

    m = jnp.maximum(
        jnp.max(sim_c, axis=-1, keepdims=True),
        jnp.max(sim_m, axis=-1, keepdims=True),
    )
    pc = jnp.exp(sim_c - m)
    pm = jnp.exp(sim_m - m)
    denom = jnp.sum(pc, -1, keepdims=True) + jnp.sum(pm, -1, keepdims=True)
    attn_c = pc / denom                                    # [Bt, g, Wc]
    attn_m = pm / denom
    c_out = jax.lax.dot_general(
        attn_c, cv, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        attn_m, memv_ref[0].astype(jnp.float32), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cout_ref[:, 0] = c_out.astype(cout_ref.dtype)

    # ---- selection pipeline (importance -> normalized scores -> top-k) ---
    imp = jnp.mean(sim_c, axis=1)                          # [Bt, Wc]
    Wf = Wc // npf
    if npf > 1:
        # stride->selection-block pooling as a static matmul (Mosaic cannot
        # reshape across the lane dimension): P[i, j] = 1/npf iff i//npf==j
        src_ids = jax.lax.broadcasted_iota(jnp.int32, (Wc, Wf), 0)
        dst_ids = jax.lax.broadcasted_iota(jnp.int32, (Wc, Wf), 1)
        pool = jnp.where(src_ids // npf == dst_ids, 1.0 / npf, 0.0)
        imp = jax.lax.dot_general(
            imp, pool, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [Bt, Wf]
        diag = t // sel_block
        f_ids = jax.lax.broadcasted_iota(jnp.int32, (Bt, Wf), 1)
        imp = jnp.where(f_ids == diag, NEG, imp)
    # pad(-1e3)-softmax-strip, computed without materializing the pad slot
    mx = jnp.maximum(jnp.max(imp, axis=-1, keepdims=True), -1e3)
    p = jnp.exp(imp - mx)
    denom_f = jnp.sum(p, -1, keepdims=True) + jnp.exp(-1e3 - mx)
    scores = p / denom_f                                   # [Bt, Wf]

    # iterative top-k (k passes of max+mask)
    f_ids = jax.lax.broadcasted_iota(jnp.int32, (Bt, Wf), 1)
    cur = scores
    for s in range(num_sel):
        v = jnp.max(cur, axis=-1, keepdims=True)           # [Bt, 1]
        amax = jnp.argmax(cur, axis=-1, keepdims=True)     # [Bt, 1]
        info_ref[:, s:s + 1] = amax.astype(jnp.int32)
        info_ref[:, num_sel + n_slide + s:num_sel + n_slide + s + 1] = (
            v > SCORE_EPS
        ).astype(jnp.int32)
        cur = jnp.where(f_ids == amax, NEG, cur)

    # trailing window block ids (ascending, last = diagonal block)
    last_blk = t // sel_block
    for j in range(n_slide):
        blk = jnp.clip(last_blk - (n_slide - 1 - j), 0, max_blocks - 1)
        info_ref[:, num_sel + j:num_sel + j + 1] = jnp.full(
            (Bt, 1), blk, jnp.int32
        )


@functools.partial(
    jax.jit,
    static_argnames=("max_blocks", "stride", "sel_block", "window", "num_sel",
                     "n_slide", "scale", "batch_tile", "interpret"),
)
def decode_select(
    q: jnp.ndarray,        # [b, kvh, g, d] UNROTATED queries
    ckv: jnp.ndarray,      # [b, kvh, Wc, 2d]
    mem_kv: jnp.ndarray,   # [2, kvh, M, d]
    t: jnp.ndarray,        # scalar int32
    num_cb: jnp.ndarray,   # scalar int32
    max_blocks: int,
    *, stride: int, sel_block: int, window: int, num_sel: int, n_slide: int,
    scale: float, batch_tile: int = 32,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (c_out [b,kvh,g,d], idx_all [b,kvh,S+n_slide] int32, msk [b,kvh,S])."""
    b, kvh, g, d = q.shape
    Wc = ckv.shape[2]
    interpret = resolve_interpret(interpret)
    Bt = _pick_batch_tile(b, batch_tile)
    n_slots = num_sel + n_slide
    scal = jnp.stack([t.astype(jnp.int32), num_cb.astype(jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kvh, b // Bt),
        in_specs=[
            pl.BlockSpec((Bt, 1, g, d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1, Wc, 2 * d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mem_kv.shape[2], d), lambda hi, bi, s: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mem_kv.shape[2], d), lambda hi, bi, s: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Bt, 1, g, d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, INFO_WIDTH), lambda hi, bi, s: (bi, hi),
                         memory_space=pltpu.VMEM),
        ),
    )
    c_out, info = pl.pallas_call(
        functools.partial(
            _select_kernel, scale=scale, stride=stride, sel_block=sel_block,
            window=window, num_sel=num_sel, n_slide=n_slide,
            max_blocks=max_blocks,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, kvh, g, d), q.dtype),
            jax.ShapeDtypeStruct((b, kvh * INFO_WIDTH), jnp.int32),
        ),
        interpret=interpret,
    )(scal, q, ckv, mem_kv[0], mem_kv[1])
    idx_all = info.reshape(b, kvh, INFO_WIDTH)[:, :, :n_slots]
    return c_out, idx_all, info


def _attend_kernel(
    scal_ref,       # SMEM [1]: t
    rq_ref,         # [Bt, 1, g, d]
    fkv_ref,        # [Bt, 1, J, 2d]
    msk_ref,        # [Bt, INFO_WIDTH] int32 packed info (msk at n_slots+)
    cout_ref,       # [Bt, 1, g, d] branch-1 output (from decode_select)
    gates_ref,      # [Bt, 1, g, 3*d] per-head gates broadcast over d
    out_ref,        # [Bt, 1, g, d] gate-combined attention output
    *, scale, sel_block, window, num_sel, n_slide,
):
    t = scal_ref[0]
    Bt, _, g, d = rq_ref.shape
    J = fkv_ref.shape[2]
    Bs = sel_block

    rq = rq_ref[:, 0].astype(jnp.float32)                  # [Bt, g, d]
    fk = fkv_ref[:, 0, :, :d].astype(jnp.float32)          # [Bt, J, d]
    fv = fkv_ref[:, 0, :, d:].astype(jnp.float32)

    sim = jax.lax.dot_general(
        rq, fk, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                                              # [Bt, g, J]

    col = jax.lax.broadcasted_iota(jnp.int32, (Bt, g, J), 2)
    slot = col // Bs
    within = col % Bs

    # selected-slot validity (first num_sel slots, from msk)
    off = num_sel + n_slide          # msk columns start after the idx list
    sel_ok = jnp.zeros((Bt, g, J), jnp.bool_)
    for s in range(num_sel):
        ok_s = (msk_ref[:, off + s:off + s + 1] != 0)[:, :, None]  # [Bt,1,1]
        sel_ok = sel_ok | ((slot == s) & ok_s)

    # trailing slots: global position of each column
    last_blk = t // Bs
    trail_j = slot - num_sel                               # >=0 on trailing
    trail_blk = last_blk - (n_slide - 1) + trail_j
    j_global = trail_blk * Bs + within
    is_trail = slot >= num_sel
    trail_valid = is_trail & (trail_blk >= 0)

    fine_ok = sel_ok | (
        trail_valid & (slot == num_sel + n_slide - 1) & (j_global <= t)
    )
    slide_ok = trail_valid & (j_global >= t - window) & (j_global <= t)

    def masked_out(ok):
        s_ = jnp.where(ok, sim, NEG)
        m = jnp.max(s_, axis=-1, keepdims=True)
        p = jnp.where(ok, jnp.exp(s_ - m), 0.0)
        denom = jnp.maximum(jnp.sum(p, -1, keepdims=True), 1e-30)
        return jax.lax.dot_general(
            p / denom, fv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    f_out = masked_out(fine_ok)
    s_out = masked_out(slide_ok)

    # gate combine in-kernel: out = gc*c + gf*f + gs*s (the XLA stack +
    # einsum after the kernel cost two more ~30us dispatches per layer)
    c_out = cout_ref[:, 0].astype(jnp.float32)
    gts = gates_ref[:, 0].astype(jnp.float32)              # [Bt, g, 3d]
    out = (gts[:, :, :d] * c_out
           + gts[:, :, d:2 * d] * f_out
           + gts[:, :, 2 * d:] * s_out)
    out_ref[:, 0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sel_block", "window", "num_sel", "n_slide", "scale",
                     "batch_tile", "interpret"),
)
def decode_attend(
    rq: jnp.ndarray,       # [b, kvh, g, d] rotated queries
    fkv: jnp.ndarray,      # [b, kvh, J, 2d] gathered packed blocks
    msk: jnp.ndarray,      # [b, kvh*INFO_WIDTH] packed info from decode_select
    c_out: jnp.ndarray,    # [b, kvh, g, d] branch-1 output from decode_select
    gates: jnp.ndarray,    # [b, kvh, g, 3] sigmoid gates (c, f, s order)
    t: jnp.ndarray,
    *, sel_block: int, window: int, num_sel: int, n_slide: int, scale: float,
    batch_tile: int = 16, interpret: bool | None = None,
) -> jnp.ndarray:
    """-> gate-combined attention output [b, kvh, g, d]."""
    b, kvh, g, d = rq.shape
    J = fkv.shape[2]
    interpret = resolve_interpret(interpret)
    Bt = _pick_batch_tile(b, batch_tile)
    scal = t.astype(jnp.int32)[None]
    # broadcast each gate over d and pack on the lane dim: [b, kvh, g, 3d]
    gates_bc = jnp.repeat(gates.astype(rq.dtype), d, axis=-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kvh, b // Bt),
        in_specs=[
            pl.BlockSpec((Bt, 1, g, d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1, J, 2 * d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, INFO_WIDTH), lambda hi, bi, s: (bi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1, g, d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1, g, 3 * d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bt, 1, g, d), lambda hi, bi, s: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _attend_kernel, scale=scale, sel_block=sel_block, window=window,
            num_sel=num_sel, n_slide=n_slide,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, d), rq.dtype),
        interpret=interpret,
    )(scal, rq, fkv, msk, c_out, gates_bc)
    return out
