"""Whole-model decode megakernel: ONE Pallas launch per token step.

Round-4 attack on the bs-1 decode floor (RESULTS.md r4): on this backend
decode latency is launch-count x ~12-25 us, and the fused 2-kernel layer
step still pays 12 Pallas launches + an XLA preamble chain per step at
batch 1 (~0.19 ms/step vs full attention's 0.066).  This kernel runs the
ENTIRE decode step — token embedding, all ``depth`` transformer layers
(RMSNorm, fused qkv+gate projection, rotary, compressed attention +
selection + conditional emission, block-gather fine+sliding attention,
output projection + residual, feed-forward), final RMSNorm and the LM
head — in a single ``pallas_call`` with ``grid=(depth,)``:

* per-layer weights are STACKED ``[L, ...]`` arrays delivered through
  blocked ``BlockSpec``s with ``index_map=lambda l: (l, ...)`` — Pallas's
  grid pipeline prefetches layer ``l+1``'s weights from HBM while layer
  ``l`` computes, which is exactly the double-buffering a bs-1 step needs
  to run at the weight-read bandwidth floor;
* the residual stream lives in a VMEM scratch that persists across grid
  steps (the layer loop);
* the kv / ckv / ring caches are stacked ``[L, ...]`` buffers aliased
  in-place; reads and writes use the same aligned-window DMA discipline
  as the 2-kernel path (``nsa_decode_fused.py``);
* rotary is applied as ``x * cos_vec + (x @ P_swap) * sin_vec`` where
  ``P_swap`` is the constant even<->odd lane permutation as a matrix —
  the MXU is the Mosaic-legal lane shuffler (a strided even/odd extract
  is not), and the per-step cos/sin lane vectors arrive precomputed;
* the GroupedMLP compressor weights stay in HBM and are DMA'd per head
  ONLY on emission steps (1 in ``stride``), as in ``decode_select_emit``;
* selected-block ids are computed in-kernel (the 2-kernel path routes
  them through XLA + scalar prefetch) and turned into DMA addresses via
  masked lane reductions to scalars.

The attention/selection math is NOT reimplemented: this kernel calls the
same ``_select_math`` / ``_attend_math`` / ``_ff_tail`` bodies as the
fused 2-kernel path (scratch refs stand in for the operand refs), so the
NSA semantics live in exactly one place per branch.  Equivalence against
the layer-by-layer decode path is pinned by tests/test_megakernel.py.

Reference semantics: native_sparse_attention.py:338-547
(forward_inference) with the prefill masking rule (see ops/nsa.py module
docstring); the reference has no analogue of this fusion (its decode hot
loop is per-layer Python, transformer.py:273-312).

Scope: scalar-position decode (one shared ``t``), batch <= 8 (the bs-1
regime this kernel exists for); serving's ragged pools keep the 2-kernel
path whose launch count is already pool-size-independent.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nsa_decode import INFO_WIDTH
from .nsa_decode_fused import _attend_math, _ff_tail, _hbm_spec, _select_math
from .runtime import resolve_interpret


def swap_matrix(dim_inner: int) -> jnp.ndarray:
    """Constant [dim_inner, dim_inner] even<->odd lane permutation.

    ``x @ swap_matrix`` swaps each interleaved rotary pair (2i, 2i+1) —
    the matmul form of the lane shuffle rotary needs, which Mosaic can
    always lower (a strided lane extract is not generally legal)."""
    import numpy as np

    idx = np.arange(dim_inner) ^ 1
    m = np.zeros((dim_inner, dim_inner), np.float32)
    m[idx, np.arange(dim_inner)] = 1.0
    return jnp.asarray(m)


def _extract_scalar(row, lane: int):
    """Pull lane ``lane`` of a [1, W] int32 vector out as a 0-d scalar via
    a masked lane reduction (the guide-blessed vreg->sreg route; a direct
    ref element read would also work but reductions are the documented
    path for scalar extraction on TPU)."""
    ids = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.max(jnp.where(ids == lane, row, -(2 ** 30)))


def _mega_kernel(
    # scalar prefetch
    scal_ref,       # SMEM [1]: t (everything position-derived is computed
                    # in-kernel so the step has NO per-step XLA preamble)
    tok_ref,        # SMEM [b]: this step's token ids
    # per-step operands (constant over the layer grid)
    pswap_ref,      # [din, din] f32 even<->odd pair permutation
    emb_hbm,        # ANY [vocab, dim] token embedding (model dtype)
    onorm_ref,      # [1, dim] final norm scale
    tolog_ref,      # [dim, vocab] LM head
    # stacked per-layer weights (blocked on the layer grid dim; per-layer
    # VECTORS carry a singleton middle dim for block-shape legality).
    # Under ``resident`` the four BIG matrices (wqkvg/wout/fw1/fw2 — ~97%
    # of the per-token weight bytes) arrive as HBM refs instead and are
    # DMA'd ONCE per launch into [L, ...] VMEM scratch: a blocked operand
    # is refetched every grid step, so a multi-token launch would re-read
    # ~35 MB of weights per TOKEN; resident cuts that to once per LAUNCH.
    anorm_ref,      # [1, 1, dim] attn norm scale
    wqkvg_ref,      # [1, dim, P] fused q|k|v|gate proj (HBM [L,...] if resident)
    gateb_ref,      # [1, 1, 3h] gate bias
    memkv_ref,      # [1, 2, kvh, M, d]
    poskv_ref,      # [1, kvh, Bc, 2d] packed k_pos||v_pos
    b1k_ref,        # [1, kvh, hid]
    b1v_ref,        # [1, kvh, hid]
    b2c_ref,        # [1, kvh, 2d]
    w1k_hbm,        # ANY [L, kvh, Bc*d, hid] (DMA'd on emission steps)
    w1v_hbm,        # ANY [L, kvh, Bc*d, hid]
    w2c_hbm,        # ANY [L, kvh, hid, 2d]
    wout_ref,       # [1, din, dim] (HBM [L,...] if resident)
    fnorm_ref,      # [1, 1, dim] FF norm scale
    fw1_ref,        # [1, dim, hid4] (HBM [L,...] if resident)
    fb1_ref,        # [1, 1, hid4]
    fw2_ref,        # [1, hid4, dim] (HBM [L,...] if resident)
    fb2_ref,        # [1, 1, dim]
    # stacked caches (all ANY: ckv and ring are loaded into VMEM scratch
    # at launch start and written back once at the end, so every token
    # step within a launch sees the previous step's state without relying
    # on blocked-input refetch semantics over an aliased buffer)
    ckv_hbm,        # ANY [L, b, kvh, Wc, 2d] (aliased -> ckv_out)
    ring_hbm,       # ANY [L, b, kvh, Bc, 2d] (aliased -> ring_out)
    kv_hbm,         # ANY [L, b, kvh, max_len, 2d] (aliased -> kv_out)
    # outputs (tok_out only present under the static greedy flag)
    *rest_refs,     # logits [b, vocab] f32, (tok_out [steps, b] int32,)
                    # ckv_out ANY, ring_out ANY, kv_out ANY, scratch...
    scale, stride, sel_block, num_sel, n_slide, window, max_blocks,
    eps, depth, theta, greedy, resident, kv_heads,
):
    if resident:
        rest_refs, res_tail = rest_refs[:-5], rest_refs[-5:]
        wqkvg_all_s, wout_all_s, fw1_all_s, fw2_all_s, ressems = res_tail
    if greedy:
        logits_ref, tok_out = rest_refs[0], rest_refs[1]
        rest = rest_refs[2:]
    else:
        logits_ref, tok_out = rest_refs[0], None
        rest = rest_refs[1:]
    (ckv_out, ring_out, kv_out, x_s, cs_s, embw_s,
     ckv_all_s, ckv_sel_s, ring_all_s, tok_s, w1k_s, w1v_s, w2c_s,
     cand_s) = rest[:14]
    rest = rest[14:]
    # per-head staging + DMA-target scratches arrive as SEPARATE small
    # refs (a stacked [kvh, ...] scratch would force chained .at[hi]-view
    # + indexed accesses, which Mosaic rejects through bf16-padded tile
    # dims: "Slice shape along dimension 4 must be aligned to tiling";
    # carrying them as VALUES instead dies on lane-offset concats:
    # "result/input offset mismatch on non-concat dimension" — both
    # observed on chip, r5)
    def take(n):
        nonlocal rest
        out, rest = rest[:n], rest[n:]
        return out

    q_list = take(kv_heads)
    rq_list = take(kv_heads)
    cout_list = take(kv_heads)
    gates_list = take(kv_heads)
    info_list = take(kv_heads)
    fkv_list = take(kv_heads)
    wkv_list = take(kv_heads)
    gsems, wsem, csem, esem, rsem = rest
    # scratch refs (in rest_refs): x_s [b, dim] residual (persists across
    # the grid), cs_s [2, din] f32 rotary lane vectors (per token step),
    # per-head staging/select/DMA scratches as kvh SEPARATE refs each:
    # q/rq/cout [b, 1, g, d], gates [b, 1, g, 3], info [b, INFO_WIDTH]
    # int32, fkv [b, n_slots*Bs, 2d], wkv [b, 8, 2d] kv RMW windows;
    # embw_s [8, dim],
    # ckv_all_s [L, b, kvh, Wc, 2d] launch-resident compressed cache,
    # ckv_sel_s [b, 1, Wc, 2d] per-head select staging,
    # ring_all_s [L, b, kvh, Bc, 2d] launch-resident ring,
    # tok_s [b, 1] int32 greedy-feedback token (multi-step),
    # w1k_s/w1v_s [Bc*d, hid], w2c_s [hid, 2d], cand_s [b, 2d],
    # sems: gsems (n_slots,), wsem (), csem (3,), esem (), rsem ()
    s_ix = pl.program_id(0)     # token step within this launch
    l = pl.program_id(1)        # layer
    t = scal_ref[0] + s_ix
    # position-derived scalars, computed in-kernel (matching the XLA-side
    # math in sparse_attention_decode / decode_select_emit)
    Bc_ = ring_all_s.shape[3]
    num_cb = t // stride
    run_fill = (Bc_ - stride) + t - num_cb * stride
    emit = (run_fill + 1 == Bc_).astype(jnp.int32)
    slot = jnp.minimum(num_cb, ckv_all_s.shape[3] - 1)
    b, dim = x_s.shape
    g, d = cout_list[0].shape[2], cout_list[0].shape[3]
    kvh = ring_all_s.shape[2]
    Bc = ring_all_s.shape[3]
    Wc = ckv_all_s.shape[3]
    hid = w1k_s.shape[1]
    din = wout_ref.shape[1]
    heads_ = din // d
    dkv = kvh * d
    Bs = sel_block
    n_slots = num_sel + n_slide
    mdt = x_s.dtype
    cdt = fkv_list[0].dtype

    # ---- launch-resident cache load (first grid step only) ----------------
    @pl.when(jnp.logical_and(s_ix == 0, l == 0))
    def _load_caches():
        c1 = pltpu.make_async_copy(ckv_hbm, ckv_all_s, csem.at[0])
        c2 = pltpu.make_async_copy(ring_hbm, ring_all_s, rsem)
        c1.start()
        c2.start()
        if resident:
            # one ~35 MB weight DMA per LAUNCH (vs per token step when
            # blocked); overlapped with the cache loads above
            cps = [
                pltpu.make_async_copy(wqkvg_ref, wqkvg_all_s, ressems.at[0]),
                pltpu.make_async_copy(wout_ref, wout_all_s, ressems.at[1]),
                pltpu.make_async_copy(fw1_ref, fw1_all_s, ressems.at[2]),
                pltpu.make_async_copy(fw2_ref, fw2_all_s, ressems.at[3]),
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
        c1.wait()
        c2.wait()

    # ---- token embedding (first layer step only) --------------------------
    # vocab rows are 8-sublane tiled: read the aligned window, select the
    # row.  Token steps after the first consume the greedy token the
    # previous step wrote to tok_s (in-kernel feedback)
    @pl.when(l == 0)
    def _embed():
        for r in range(b):
            fed = jnp.min(tok_s[r:r + 1, :])   # vreg->sreg via reduction
            tok = jnp.where(s_ix == 0, tok_ref[r], fed)
            base = pl.multiple_of((tok // 8) * 8, 8)
            cp = pltpu.make_async_copy(
                emb_hbm.at[pl.ds(base, 8), :], embw_s, esem)
            cp.start()
            cp.wait()
            ri = jax.lax.broadcasted_iota(jnp.int32, (8, dim), 0)
            row = jnp.sum(
                jnp.where(ri == tok - base,
                          embw_s[...].astype(jnp.float32), 0.0),
                axis=0, keepdims=True,
            )
            x_s[r:r + 1, :] = row.astype(mdt)

    # ---- rotary lane vectors at position t (first layer step only) --------
    # rot(x) = x*cvec + swap(x)*svec reproduces ops/rotary.apply_rotary's
    # interleaved convention: cvec[2i]=cvec[2i+1]=cos(t*f_i),
    # svec[2i]=-sin(t*f_i), svec[2i+1]=+sin(t*f_i), tiled across heads
    @pl.when(l == 0)
    def _rope():
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, din), 1)
        pair = ((cols % d) // 2).astype(jnp.float32)
        invf = jnp.exp(pair * jnp.float32(-2.0 * math.log(theta) / d))
        ang = t.astype(jnp.float32) * invf                  # [1, din]
        sgn = jnp.where(cols % 2 == 0, -1.0, 1.0)
        cs_s[0:1, :] = jnp.cos(ang)
        cs_s[1:2, :] = jnp.sin(ang) * sgn

    # ---- pre-attention norm + fused qkv|gate projection --------------------
    x = x_s[...]                                            # [b, dim] mdt
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)
              * anorm_ref[0, 0].astype(jnp.float32)).astype(mdt)
    proj = jax.lax.dot_general(
        normed, wqkvg_all_s[l] if resident else wqkvg_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(mdt)                                           # [b, P]
    qf = proj[:, :din]
    kf = proj[:, din:din + dkv]
    vf = proj[:, din + dkv:din + 2 * dkv]
    gl = proj[:, din + 2 * dkv:]
    # sigmoid in f32: Mosaic's bf16 `logistic` lowering emits an illegal
    # f32->bf16 vector.broadcast (verified on chip, r4c); the XLA path
    # computes gates from the f32 projection anyway, so this also matches
    # its numerics more closely.
    gates = jax.nn.sigmoid(
        gl.astype(jnp.float32) + gateb_ref[0, 0].astype(jnp.float32)
    ).astype(mdt)                                           # [b, 3h] mdt

    # ---- rotary at position t (matmul lane-swap form, f32 like the XLA path)
    cvec = cs_s[0:1, :]
    svec = cs_s[1:2, :]
    qf32 = qf.astype(jnp.float32)
    qsw = jax.lax.dot_general(
        qf32, pswap_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rqf = (qf32 * cvec + qsw * svec).astype(mdt)
    kf32 = kf.astype(jnp.float32)
    ksw = jax.lax.dot_general(
        kf32, pswap_ref[:dkv, :dkv], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rkf = (kf32 * cvec[:, :dkv] + ksw * svec[:, :dkv]).astype(mdt)

    # full-extent load of this layer's mem-KV (legal: no slicing through
    # the tiled (M, d) dims), indexed per head STATICALLY below — ref
    # views like memkv_ref.at[0, 0, pl.ds(hi, 1)] fail Mosaic's tiling
    # alignment checks on both bf16 and f32 layouts (r4c smoke)
    memkv_all = memkv_ref[0].astype(jnp.float32)            # [2, kvh, M, d]

    y = None                                                # f32 [b, dim]
    # The per-head work is split into PHASES across heads (r5): the old
    # monolithic head loop serialized ~11 gather DMAs per head behind that
    # head's select math, so every DMA's issue+completion latency was paid
    # back-to-back 4x per layer.  Phasing issues ALL heads' cache-row RMWs
    # and block gathers together, so their latencies overlap each other
    # and the remaining heads' select math.  Math is untouched — only the
    # schedule changed (equivalence pinned by tests/test_megakernel.py).
    # Per-head q/rq/gates/cout/info/newkv flow between phases as VALUES
    # (python lists over the unrolled head loop) — only DMA targets are
    # refs, and none of them needs a chained .at[] view.
    kvbase = pl.multiple_of(
        jnp.minimum((t // 8) * 8, max_blocks * Bs - 8), 8)
    roff = t - kvbase
    last_blk = t // Bs
    rd_cps = {}

    # ---- phase 1: staging + ring + emission + select (per head); the
    # kv-row RMW window read is started first so it rides under the math
    for hi in range(kvh):
        rd = pltpu.make_async_copy(
            kv_out.at[l, :, hi, pl.ds(kvbase, 8), :], wkv_list[hi],
            wsem.at[hi])
        rd.start()
        rd_cps[hi] = rd
    newkv_vals = []
    for hi in range(kvh):
        for gi in range(g):
            hq = (hi * g + gi) * d
            # staging through scratch WRITES (store relayouts the
            # lane-offset slices — value-level stack/concat of offset
            # slices is Mosaic-illegal, observed on chip r5)
            rows = jax.lax.broadcasted_iota(jnp.int32, (3 * heads_, 3), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (3 * heads_, 3), 1)
            esel = (rows == 3 * (hi * g + gi) + cols).astype(jnp.float32)
            # extract this head's 3 gate lanes (offset 3*(hi*g+gi), not
            # lane-aligned) via an iota-built 0/1 selection matmul — the
            # MXU is the always-legal lane shuffler
            g3 = jax.lax.dot_general(
                gates.astype(jnp.float32), esel,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # [b, 3]
            if b == 1:
                q_list[hi][:, 0, gi, :] = qf[:, hq:hq + d].astype(mdt)
                rq_list[hi][:, 0, gi, :] = rqf[:, hq:hq + d].astype(mdt)
                gates_list[hi][:, 0, gi, :] = g3.astype(mdt)
            else:
                # b > 1: a whole-batch store needs a [b,d]->[b,1,1,d]
                # relayout (sublane -> leading dim) Mosaic can't infer
                # ("unsupported shape cast", r5 on-chip at bs 8);
                # per-row [1,d] stores sidestep it
                for r in range(b):
                    q_list[hi][r:r + 1, 0, gi, :] = (
                        qf[r:r + 1, hq:hq + d].astype(mdt))
                    rq_list[hi][r:r + 1, 0, gi, :] = (
                        rqf[r:r + 1, hq:hq + d].astype(mdt))
                    gates_list[hi][r:r + 1, 0, gi, :] = (
                        g3[r:r + 1].astype(mdt))
        k_u = kf[:, hi * d:(hi + 1) * d]
        v_u = vf[:, hi * d:(hi + 1) * d]
        rk_u = rkf[:, hi * d:(hi + 1) * d]
        new_unrot = jnp.concatenate([k_u, v_u], axis=-1).astype(cdt)
        newkv_vals.append(jnp.concatenate([rk_u, v_u], axis=-1).astype(cdt))

        # ---- ring shift (every step): pure VMEM scratch update -------------
        ring_blk = ring_all_s[l, :, hi]                     # [b, Bc, 2d]
        shifted = jnp.concatenate(
            [ring_blk[:, 1:], new_unrot[:, None, :]], axis=1)
        ring_all_s[l, :, hi] = shifted

        # ---- predicated compressed-block emission --------------------------
        # (weights DMA'd from HBM only on emission steps; see
        # decode_select_emit for the shared rationale)
        @pl.when(emit == 1)
        def _emit():
            cp1 = pltpu.make_async_copy(w1k_hbm.at[l, hi], w1k_s, csem.at[0])
            cp2 = pltpu.make_async_copy(w1v_hbm.at[l, hi], w1v_s, csem.at[1])
            cp3 = pltpu.make_async_copy(w2c_hbm.at[l, hi], w2c_s, csem.at[2])
            cp1.start()
            cp2.start()
            cp3.start()
            cp1.wait()
            cp2.wait()
            cp3.wait()
            row_pos = (t + 1 - Bc) + jax.lax.broadcasted_iota(
                jnp.int32, (b, Bc, 2 * d), 1)
            win = jnp.where(row_pos >= 0, shifted, 0.0)
            win = win + poskv_ref[0, hi][None].astype(win.dtype)
            hk = jnp.zeros((b, hid), jnp.float32)
            hv = jnp.zeros((b, hid), jnp.float32)
            for j in range(Bc):
                hk = hk + jax.lax.dot_general(
                    win[:, j, :d], w1k_s[j * d:(j + 1) * d, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                hv = hv + jax.lax.dot_general(
                    win[:, j, d:], w1v_s[j * d:(j + 1) * d, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            hk = jax.nn.relu(hk + b1k_ref[0, hi].astype(jnp.float32))
            hv = jax.nn.relu(hv + b1v_ref[0, hi].astype(jnp.float32))
            hk = hk.astype(cand_s.dtype)
            hv = hv.astype(cand_s.dtype)
            ck_ = jax.lax.dot_general(
                hk, w2c_s[:, :d], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b2c_ref[0, hi, :d].astype(jnp.float32)
            cv_ = jax.lax.dot_general(
                hv, w2c_s[:, d:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b2c_ref[0, hi, d:].astype(jnp.float32)
            cand_s[:, :d] = ck_.astype(cand_s.dtype)
            cand_s[:, d:] = cv_.astype(cand_s.dtype)
            # masked-row write into the launch-resident scratch: no DMA,
            # no 8-row tiling constraint (plain VMEM vector select)
            rows = jax.lax.broadcasted_iota(jnp.int32, (b, Wc, 2 * d), 1)
            cur = ckv_all_s[l, :, hi]                       # [b, Wc, 2d]
            ckv_all_s[l, :, hi] = jnp.where(
                rows == slot, cand_s[...][:, None, :], cur)

        # ---- compressed attention + selection ------------------------------
        # reads the PRE-update view semantically: this step's emission
        # lands at slot == num_cb, which the select mask (< num_cb)
        # excludes, so staging after the emission write is equivalent
        ckv_sel_s[:, 0] = ckv_all_s[l, :, hi]
        _select_math(
            t, num_cb, q_list[hi], ckv_sel_s,
            memkv_all[0, hi], memkv_all[1, hi],
            cout_list[hi], info_list[hi],
            scale=scale, stride=stride, sel_block=sel_block,
            num_sel=num_sel, n_slide=n_slide, max_blocks=max_blocks,
        )

    # ---- phase 2: commit every head's new kv row; issue every head's
    # selected + trailing block gathers (all DMAs in flight together)
    wr_cps = {}
    gather_cps = []
    ri8 = jax.lax.broadcasted_iota(jnp.int32, (8, 2 * d), 0)
    for hi in range(kvh):
        rd_cps[hi].wait()
        wkv = wkv_list[hi]
        for r in range(b):
            wkv[r] = jnp.where(
                ri8 == roff, newkv_vals[hi][r:r + 1, :], wkv[r])
        wr = pltpu.make_async_copy(
            wkv, kv_out.at[l, :, hi, pl.ds(kvbase, 8), :], wsem.at[hi])
        wr.start()
        wr_cps[hi] = wr
        for r in range(b):
            irow = info_list[hi][r:r + 1, :]                # [1, 128] value
            for s in range(num_sel):
                blk = _extract_scalar(irow, s)
                cp = pltpu.make_async_copy(
                    kv_out.at[l, r, hi, pl.ds(blk * Bs, Bs), :],
                    fkv_list[hi].at[r, pl.ds(s * Bs, Bs), :],
                    gsems.at[hi, s],
                )
                cp.start()
                gather_cps.append(cp)
        for j in range(n_slide - 1):
            blk = jnp.clip(last_blk - (n_slide - 1 - j), 0, max_blocks - 1)
            cp = pltpu.make_async_copy(
                kv_out.at[l, :, hi, pl.ds(blk * Bs, Bs), :],
                fkv_list[hi].at[:, pl.ds((num_sel + j) * Bs, Bs), :],
                gsems.at[hi, num_sel + j],
            )
            cp.start()
            gather_cps.append(cp)

    # ---- phase 3: after each head's row write lands, read back its
    # diagonal block (contains the just-committed row: the token must
    # attend to itself)
    diag = jnp.clip(last_blk, 0, max_blocks - 1)
    for hi in range(kvh):
        wr_cps[hi].wait()
        cp = pltpu.make_async_copy(
            kv_out.at[l, :, hi, pl.ds(diag * Bs, Bs), :],
            fkv_list[hi].at[:, pl.ds((n_slots - 1) * Bs, Bs), :],
            gsems.at[hi, n_slots - 1],
        )
        cp.start()
        gather_cps.append(cp)
    for cp in gather_cps:
        cp.wait()

    # ---- phase 4: fine + sliding + gate combine + output projection -------
    for hi in range(kvh):
        combined = _attend_math(
            t, rq_list[hi], fkv_list[hi][...], info_list[hi],
            cout_list[hi], gates_list[hi],
            scale=scale, sel_block=sel_block, window=window,
            num_sel=num_sel, n_slide=n_slide,
        )                                                   # [b, g, d] f32
        comb16 = combined.astype(cdt)
        for gi in range(g):
            sl = slice((hi * g + gi) * d, (hi * g + gi + 1) * d)
            wsl = wout_all_s[l, sl, :] if resident else wout_ref[0, sl, :]
            pg = jax.lax.dot_general(
                comb16[:, gi, :], wsl.astype(cdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # [b, dim]
            y = pg if y is None else y + pg

    # ---- residual + feed-forward ------------------------------------------
    y32 = x.astype(jnp.float32) + y
    # vectors as single-op loads ([0, 0] indexing): a .at[0] view + inner
    # [0] load stacks two memref_slices through the bf16-padded sublane
    # dim, which Mosaic rejects ("dimension 1 must be aligned to tiling
    # (2)", r4c smoke); the big ffw matrices stay as full-extent views
    out32 = _ff_tail(
        y32, mdt, fnorm_ref[0, 0], fb1_ref[0, 0], fb2_ref[0, 0],
        fw1_all_s.at[l] if resident else fw1_ref.at[0],
        fw2_all_s.at[l] if resident else fw2_ref.at[0],
        eps=eps,
    )
    x_s[...] = out32.astype(mdt)

    # ---- cache writeback (last grid step only) ------------------------------
    @pl.when(jnp.logical_and(s_ix == pl.num_programs(0) - 1, l == depth - 1))
    def _writeback():
        c1 = pltpu.make_async_copy(ckv_all_s, ckv_out, csem.at[0])
        c2 = pltpu.make_async_copy(ring_all_s, ring_out, rsem)
        c1.start()
        c2.start()
        c1.wait()
        c2.wait()

    # ---- final norm + LM head (last layer step) -----------------------------
    @pl.when(l == depth - 1)
    def _logits():
        xo = x_s[...].astype(jnp.float32)
        v2 = jnp.mean(xo * xo, axis=-1, keepdims=True)
        onormed = (xo * jax.lax.rsqrt(v2 + eps)
                   * onorm_ref[0].astype(jnp.float32)).astype(mdt)
        lg = jax.lax.dot_general(
            onormed, tolog_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # match the XLA path's bf16-matmul output rounding before the f32 cast
        lgq = lg.astype(mdt).astype(jnp.float32)
        logits_ref[...] = lgq
        if greedy:
            # in-kernel greedy sampling: min-index-of-max matches
            # jnp.argmax's first-max tie-breaking.  The token goes to the
            # [steps, b] output column AND to the tok_s feedback scratch
            # the next token step's embedding reads.
            vocab = lgq.shape[1]
            ids = jax.lax.broadcasted_iota(jnp.int32, (1, vocab), 1)
            for r in range(b):
                row = lgq[r:r + 1, :]
                mx = jnp.max(row, axis=-1, keepdims=True)
                pick = jnp.min(
                    jnp.where(row >= mx, ids, 2 ** 30),
                    axis=-1, keepdims=True,
                )                                           # [1, 1]
                tok_s[r:r + 1, :] = pick
                # per-row [1,1] store: concatenating the b picks hits
                # 'offset mismatch on non-concat dimension' (each pick
                # carries its own sublane offset, r5 on-chip at bs 8)
                tok_out[pl.ds(s_ix, 1), r:r + 1] = pick


def _mega_kernel_hb(
    # scalar prefetch + operands: same order as _mega_kernel
    scal_ref, tok_ref,
    pswap_ref, emb_hbm, onorm_ref, tolog_ref,
    anorm_ref, wqkvg_ref, gateb_ref, memkv_ref, poskv_ref,
    b1k_ref, b1v_ref, b2c_ref, w1k_hbm, w1v_hbm, w2c_hbm,
    wout_ref, fnorm_ref, fw1_ref, fb1_ref, fw2_ref, fb2_ref,
    ckv_hbm, ring_hbm, kv_hbm,
    *rest_refs,
    scale, stride, sel_block, num_sel, n_slide, window, max_blocks,
    eps, depth, theta, greedy, resident, kv_heads,
):
    """HEAD-BATCHED megakernel body (r5): folds the ``kvh`` KV heads into
    the row dimension (``B = b*kvh``, b-major: row = r*kvh + hi) so the
    select and attend pipelines — the bulk of the per-layer serial op
    chain the r5 exclusion experiment identified as the bs-1 floor — run
    ONCE per layer over B rows instead of kvh times over b rows.  Every
    tiny vector op in ``_select_math``/``_attend_math`` vectorizes over
    rows at no issue cost (the same batch-invariance that made bs-8
    nearly free), so head-batching buys ~kvh× fewer issued ops in those
    phases.  The ring shift, emission write, and gate combine batch the
    same way; per-(row, block) DMA gathers and the per-head kv-row RMW
    keep their (already overlapped) structure; the per-head output
    projection matmuls collapse into lane-staging stores + ONE
    [b, din] @ [din, dim] matmul.

    Head-crossing data still moves through staging stores (a [b, h*X]
    lane layout cannot be reshaped into rows in-kernel — reshapes across
    the lane dim are Mosaic-illegal), so staging costs match the
    per-head formulation; the savings are all in the math phases.

    Semantics are identical to _mega_kernel (equivalence pinned by
    tests/test_megakernel.py with NSA_MEGA_HB on/off)."""
    if resident:
        rest_refs, res_tail = rest_refs[:-5], rest_refs[-5:]
        wqkvg_all_s, wout_all_s, fw1_all_s, fw2_all_s, ressems = res_tail
    if greedy:
        logits_ref, tok_out = rest_refs[0], rest_refs[1]
        rest = rest_refs[2:]
    else:
        logits_ref, tok_out = rest_refs[0], None
        rest = rest_refs[1:]
    (ckv_out, ring_out, kv_out, x_s, cs_s, embw_s,
     ckv_all_s, ring_all_s, tok_s, w1k_s, w1v_s, w2c_s, cand_s,
     newkv_s, q_s, rq_s, cout_s, gates_s, info_s, fkv_s, co_s) = rest[:21]
    rest = rest[21:]
    wkv_list = list(rest[:kv_heads])
    gsems, wsem, csem, esem, rsem = rest[kv_heads:kv_heads + 5]

    s_ix = pl.program_id(0)
    l = pl.program_id(1)
    t = scal_ref[0] + s_ix
    Bc = ring_all_s.shape[3]
    num_cb = t // stride
    run_fill = (Bc - stride) + t - num_cb * stride
    emit = (run_fill + 1 == Bc).astype(jnp.int32)
    slot = jnp.minimum(num_cb, ckv_all_s.shape[3] - 1)
    b, dim = x_s.shape
    kvh = ring_all_s.shape[2]
    B, _, g, d = q_s.shape
    Wc = ckv_all_s.shape[3]
    din = wout_ref.shape[1]
    heads_ = din // d
    dkv = kvh * d
    Bs = sel_block
    n_slots = num_sel + n_slide
    M = memkv_ref.shape[3]
    mdt = x_s.dtype
    cdt = fkv_s.dtype

    # ---- launch-resident cache load (first grid step only) ----------------
    @pl.when(jnp.logical_and(s_ix == 0, l == 0))
    def _load_caches():
        c1 = pltpu.make_async_copy(ckv_hbm, ckv_all_s, csem.at[0])
        c2 = pltpu.make_async_copy(ring_hbm, ring_all_s, rsem)
        c1.start()
        c2.start()
        if resident:
            cps = [
                pltpu.make_async_copy(wqkvg_ref, wqkvg_all_s, ressems.at[0]),
                pltpu.make_async_copy(wout_ref, wout_all_s, ressems.at[1]),
                pltpu.make_async_copy(fw1_ref, fw1_all_s, ressems.at[2]),
                pltpu.make_async_copy(fw2_ref, fw2_all_s, ressems.at[3]),
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
        c1.wait()
        c2.wait()

    # ---- token embedding + rotary lane vectors (first layer step) ---------
    @pl.when(l == 0)
    def _embed():
        for r in range(b):
            fed = jnp.min(tok_s[r:r + 1, :])
            tok = jnp.where(s_ix == 0, tok_ref[r], fed)
            base = pl.multiple_of((tok // 8) * 8, 8)
            cp = pltpu.make_async_copy(
                emb_hbm.at[pl.ds(base, 8), :], embw_s, esem)
            cp.start()
            cp.wait()
            ri = jax.lax.broadcasted_iota(jnp.int32, (8, dim), 0)
            row = jnp.sum(
                jnp.where(ri == tok - base,
                          embw_s[...].astype(jnp.float32), 0.0),
                axis=0, keepdims=True,
            )
            x_s[r:r + 1, :] = row.astype(mdt)

    @pl.when(l == 0)
    def _rope():
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, din), 1)
        pair = ((cols % d) // 2).astype(jnp.float32)
        invf = jnp.exp(pair * jnp.float32(-2.0 * math.log(theta) / d))
        ang = t.astype(jnp.float32) * invf
        sgn = jnp.where(cols % 2 == 0, -1.0, 1.0)
        cs_s[0:1, :] = jnp.cos(ang)
        cs_s[1:2, :] = jnp.sin(ang) * sgn

    # ---- pre-attention norm + fused qkv|gate projection --------------------
    x = x_s[...]
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)
              * anorm_ref[0, 0].astype(jnp.float32)).astype(mdt)
    proj = jax.lax.dot_general(
        normed, wqkvg_all_s[l] if resident else wqkvg_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(mdt)
    qf = proj[:, :din]
    kf = proj[:, din:din + dkv]
    vf = proj[:, din + dkv:din + 2 * dkv]
    gl = proj[:, din + 2 * dkv:]
    gates = jax.nn.sigmoid(
        gl.astype(jnp.float32) + gateb_ref[0, 0].astype(jnp.float32)
    ).astype(mdt)

    cvec = cs_s[0:1, :]
    svec = cs_s[1:2, :]
    qf32 = qf.astype(jnp.float32)
    qsw = jax.lax.dot_general(
        qf32, pswap_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rqf = (qf32 * cvec + qsw * svec).astype(mdt)
    kf32 = kf.astype(jnp.float32)
    ksw = jax.lax.dot_general(
        kf32, pswap_ref[:dkv, :dkv], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rkf = (kf32 * cvec[:, :dkv] + ksw * svec[:, :dkv]).astype(mdt)

    memkv_all = memkv_ref[0].astype(jnp.float32)            # [2, kvh, M, d]

    # the kv-row RMW window reads ride under all the staging work below
    kvbase = pl.multiple_of(
        jnp.minimum((t // 8) * 8, max_blocks * Bs - 8), 8)
    roff = t - kvbase
    last_blk = t // Bs
    rd_cps = {}
    for hi in range(kvh):
        rd = pltpu.make_async_copy(
            kv_out.at[l, :, hi, pl.ds(kvbase, 8), :], wkv_list[hi],
            wsem.at[hi])
        rd.start()
        rd_cps[hi] = rd

    # ---- staging: head-crossing lane extracts -> row-major scratches ------
    # (store relayouts are the only Mosaic-legal lane->row movement; the
    # per-(hi, gi) gate extraction keeps the iota-matmul route because its
    # 3-lane source offsets are not lane-aligned)
    for hi in range(kvh):
        for gi in range(g):
            hq = (hi * g + gi) * d
            rows_e = jax.lax.broadcasted_iota(jnp.int32, (3 * heads_, 3), 0)
            cols_e = jax.lax.broadcasted_iota(jnp.int32, (3 * heads_, 3), 1)
            esel = (rows_e == 3 * (hi * g + gi) + cols_e).astype(jnp.float32)
            g3 = jax.lax.dot_general(
                gates.astype(jnp.float32), esel,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for r in range(b):
                row = r * kvh + hi
                q_s[row:row + 1, 0, gi, :] = (
                    qf[r:r + 1, hq:hq + d].astype(mdt))
                rq_s[row:row + 1, 0, gi, :] = (
                    rqf[r:r + 1, hq:hq + d].astype(mdt))
                gates_s[row:row + 1, 0, gi, :] = g3[r:r + 1].astype(mdt)
        # ring rows are UNROTATED k||v (compression inputs are never
        # rotated, reference native_sparse_attention.py:377-385)
        for r in range(b):
            newkv_s[r:r + 1, hi, :d] = (
                kf[r:r + 1, hi * d:(hi + 1) * d].astype(cdt))
            newkv_s[r:r + 1, hi, d:] = (
                vf[r:r + 1, hi * d:(hi + 1) * d].astype(cdt))

    # ---- ring shift (every step), ALL heads in one op ----------------------
    ring4 = ring_all_s[l]                                   # [b, kvh, Bc, 2d]
    shifted4 = jnp.concatenate(
        [ring4[:, :, 1:], newkv_s[...][:, :, None, :]], axis=2)
    ring_all_s[l] = shifted4

    # ---- predicated compressed-block emission (batched window, per-head
    # matmuls: the GroupedMLP weights differ per head) -----------------------
    @pl.when(emit == 1)
    def _emit():
        cp1 = pltpu.make_async_copy(w1k_hbm.at[l], w1k_s, csem.at[0])
        cp2 = pltpu.make_async_copy(w1v_hbm.at[l], w1v_s, csem.at[1])
        cp3 = pltpu.make_async_copy(w2c_hbm.at[l], w2c_s, csem.at[2])
        cp1.start()
        cp2.start()
        cp3.start()
        cp1.wait()
        cp2.wait()
        cp3.wait()
        hid = w1k_s.shape[2]
        row_pos = (t + 1 - Bc) + jax.lax.broadcasted_iota(
            jnp.int32, (b, kvh, Bc, 2 * d), 2)
        win4 = jnp.where(row_pos >= 0, shifted4, 0.0)
        win4 = win4 + poskv_ref[0][None].astype(win4.dtype)
        w1k_all = w1k_s[...]
        w1v_all = w1v_s[...]
        w2c_all = w2c_s[...]
        for hi in range(kvh):
            win = win4[:, hi]                               # [b, Bc, 2d]
            hk = jnp.zeros((b, hid), jnp.float32)
            hv = jnp.zeros((b, hid), jnp.float32)
            for j in range(Bc):
                hk = hk + jax.lax.dot_general(
                    win[:, j, :d], w1k_all[hi, j * d:(j + 1) * d, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                hv = hv + jax.lax.dot_general(
                    win[:, j, d:], w1v_all[hi, j * d:(j + 1) * d, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            hk = jax.nn.relu(hk + b1k_ref[0, hi].astype(jnp.float32))
            hv = jax.nn.relu(hv + b1v_ref[0, hi].astype(jnp.float32))
            hk = hk.astype(cdt)
            hv = hv.astype(cdt)
            ck_ = jax.lax.dot_general(
                hk, w2c_all[hi, :, :d], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b2c_ref[0, hi, :d].astype(jnp.float32)
            cv_ = jax.lax.dot_general(
                hv, w2c_all[hi, :, d:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b2c_ref[0, hi, d:].astype(jnp.float32)
            # per-row stores: whole-batch stores through an int mid index
            # need a relayout Mosaic can't infer (r5 bs-8 finding)
            for r in range(b):
                cand_s[r:r + 1, hi, :d] = ck_[r:r + 1].astype(cdt)
                cand_s[r:r + 1, hi, d:] = cv_[r:r + 1].astype(cdt)
        rows = jax.lax.broadcasted_iota(jnp.int32, (b, kvh, Wc, 2 * d), 2)
        cur4 = ckv_all_s[l]
        ckv_all_s[l] = jnp.where(
            rows == slot, cand_s[...][:, :, None, :], cur4)

    # ---- compressed attention + selection: ONE call over B rows -----------
    # (reads the post-emission ckv; slot == num_cb is masked out by the
    # select math, so pre/post staging is equivalent — same argument as
    # the per-head kernel)
    ckv_b = ckv_all_s[l].reshape(B, 1, Wc, 2 * d)
    memk_b = jnp.broadcast_to(
        memkv_all[0][None], (b, kvh, M, d)).reshape(B, M, d)
    memv_b = jnp.broadcast_to(
        memkv_all[1][None], (b, kvh, M, d)).reshape(B, M, d)
    _select_math(
        t, num_cb, q_s, ckv_b, memk_b, memv_b, cout_s, info_s,
        scale=scale, stride=stride, sel_block=sel_block,
        num_sel=num_sel, n_slide=n_slide, max_blocks=max_blocks,
    )

    # ---- commit new kv rows; issue ALL gathers together ---------------------
    wr_cps = {}
    gather_cps = []
    ri8 = jax.lax.broadcasted_iota(jnp.int32, (8, 2 * d), 0)
    for hi in range(kvh):
        rd_cps[hi].wait()
        # the kv cache row is ROTATED k || v (unlike the ring's unrotated
        # row) — same value concat the per-head kernel builds
        rkv_h = jnp.concatenate(
            [rkf[:, hi * d:(hi + 1) * d], vf[:, hi * d:(hi + 1) * d]],
            axis=-1,
        ).astype(cdt)                                       # [b, 2d]
        wkv = wkv_list[hi]
        for r in range(b):
            wkv[r] = jnp.where(
                ri8 == roff, rkv_h[r:r + 1, :], wkv[r])
        wr = pltpu.make_async_copy(
            wkv, kv_out.at[l, :, hi, pl.ds(kvbase, 8), :], wsem.at[hi])
        wr.start()
        wr_cps[hi] = wr
        for r in range(b):
            row = r * kvh + hi
            irow = info_s[row:row + 1, :]
            for s in range(num_sel):
                blk = _extract_scalar(irow, s)
                cp = pltpu.make_async_copy(
                    kv_out.at[l, r, hi, pl.ds(blk * Bs, Bs), :],
                    fkv_s.at[row, pl.ds(s * Bs, Bs), :],
                    gsems.at[hi, s],
                )
                cp.start()
                gather_cps.append(cp)
            for j in range(n_slide - 1):
                blk = jnp.clip(
                    last_blk - (n_slide - 1 - j), 0, max_blocks - 1)
                cp = pltpu.make_async_copy(
                    kv_out.at[l, r, hi, pl.ds(blk * Bs, Bs), :],
                    fkv_s.at[row, pl.ds((num_sel + j) * Bs, Bs), :],
                    gsems.at[hi, num_sel + j],
                )
                cp.start()
                gather_cps.append(cp)

    diag = jnp.clip(last_blk, 0, max_blocks - 1)
    for hi in range(kvh):
        wr_cps[hi].wait()
        for r in range(b):
            row = r * kvh + hi
            cp = pltpu.make_async_copy(
                kv_out.at[l, r, hi, pl.ds(diag * Bs, Bs), :],
                fkv_s.at[row, pl.ds((n_slots - 1) * Bs, Bs), :],
                gsems.at[hi, n_slots - 1],
            )
            cp.start()
            gather_cps.append(cp)
    for cp in gather_cps:
        cp.wait()

    # ---- fine + sliding + gate combine: ONE call over B rows ---------------
    combined = _attend_math(
        t, rq_s, fkv_s[...], info_s, cout_s, gates_s,
        scale=scale, sel_block=sel_block, window=window,
        num_sel=num_sel, n_slide=n_slide,
    )                                                       # [B, g, d] f32
    comb16 = combined.astype(cdt)

    # ---- output projection: lane-stage rows back -> ONE [b,din]@[din,dim] --
    for hi in range(kvh):
        for gi in range(g):
            ho = (hi * g + gi) * d
            for r in range(b):
                row = r * kvh + hi
                co_s[r:r + 1, ho:ho + d] = comb16[row:row + 1, gi, :]
    y = jax.lax.dot_general(
        co_s[...], (wout_all_s[l] if resident else wout_ref[0]).astype(cdt),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [b, dim] f32

    # ---- residual + feed-forward -------------------------------------------
    y32 = x.astype(jnp.float32) + y
    out32 = _ff_tail(
        y32, mdt, fnorm_ref[0, 0], fb1_ref[0, 0], fb2_ref[0, 0],
        fw1_all_s.at[l] if resident else fw1_ref.at[0],
        fw2_all_s.at[l] if resident else fw2_ref.at[0],
        eps=eps,
    )
    x_s[...] = out32.astype(mdt)

    # ---- cache writeback (last grid step only) ------------------------------
    @pl.when(jnp.logical_and(s_ix == pl.num_programs(0) - 1, l == depth - 1))
    def _writeback():
        c1 = pltpu.make_async_copy(ckv_all_s, ckv_out, csem.at[0])
        c2 = pltpu.make_async_copy(ring_all_s, ring_out, rsem)
        c1.start()
        c2.start()
        c1.wait()
        c2.wait()

    # ---- final norm + LM head (last layer step) -----------------------------
    @pl.when(l == depth - 1)
    def _logits():
        xo = x_s[...].astype(jnp.float32)
        v2 = jnp.mean(xo * xo, axis=-1, keepdims=True)
        onormed = (xo * jax.lax.rsqrt(v2 + eps)
                   * onorm_ref[0].astype(jnp.float32)).astype(mdt)
        lg = jax.lax.dot_general(
            onormed, tolog_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        lgq = lg.astype(mdt).astype(jnp.float32)
        logits_ref[...] = lgq
        if greedy:
            vocab = lgq.shape[1]
            ids = jax.lax.broadcasted_iota(jnp.int32, (1, vocab), 1)
            for r in range(b):
                row = lgq[r:r + 1, :]
                mx = jnp.max(row, axis=-1, keepdims=True)
                pick = jnp.min(
                    jnp.where(row >= mx, ids, 2 ** 30),
                    axis=-1, keepdims=True,
                )
                tok_s[r:r + 1, :] = pick
                tok_out[pl.ds(s_ix, 1), r:r + 1] = pick


def decode_step_mega(
    mp, kv, ckv, ring, token, t, *, steps: int = 1,
    interpret: bool | None = None, resident: bool | None = None,
    headbatch: bool | None = None, **static_kw,
):
    """Env-dependent statics (resident / headbatch / interpret) are
    resolved HERE, outside the jit: resolving them inside the traced
    function caches the executable under the ``None`` static key, so
    flipping NSA_MEGA_RESIDENT / NSA_MEGA_HB between same-shape calls
    would silently reuse the stale compile.  See _decode_step_mega_jit
    for the actual kernel wrapper."""
    import os as _os

    b = kv.shape[1]
    interpret = resolve_interpret(interpret)
    if resident is None:
        # launch-resident weights pay one ~35 MB VMEM staging DMA per
        # launch, so they only win when several token steps amortize it;
        # the VMEM cost (~23 MB net) rules out the larger cache batches.
        env = _os.environ.get("NSA_MEGA_RESIDENT", "")
        resident = env == "1" if env in ("0", "1") else steps >= 4
    # hard clamp regardless of env: resident scratch (+~35 MB) on top of
    # the b-scaled launch-resident caches exceeds the 64 MiB scoped-VMEM
    # limit at b 8 (measured 65.46 MB, r5)
    resident = resident and b <= 4
    if headbatch is None:
        # head-batched body (r5): ~kvh x fewer issued ops in the
        # select/attend phases; NSA_MEGA_HB=0 falls back to per-head
        headbatch = _os.environ.get("NSA_MEGA_HB", "1") == "1"
    return _decode_step_mega_jit(
        mp, kv, ckv, ring, token, t, steps=steps, interpret=interpret,
        resident=resident, headbatch=headbatch, **static_kw,
    )


@functools.partial(
    jax.jit,
    static_argnames=("depth", "heads", "kv_heads", "dim_head", "stride",
                     "sel_block", "num_sel", "n_slide", "window", "scale",
                     "eps", "theta", "greedy", "steps", "interpret",
                     "resident", "headbatch"),
)
def _decode_step_mega_jit(
    mp: dict,
    kv: jnp.ndarray,         # [L, b, kvh, max_len, 2d] (donated)
    ckv: jnp.ndarray,        # [L, b, kvh, Wc, 2d] (donated)
    ring: jnp.ndarray,       # [L, b, kvh, Bc, 2d] (donated)
    token: jnp.ndarray,      # [b] int32
    t: jnp.ndarray,          # scalar int32: tokens already cached
    *, depth: int, heads: int, kv_heads: int, dim_head: int, stride: int,
    sel_block: int, num_sel: int, n_slide: int, window: int, scale: float,
    eps: float, theta: float, greedy: bool = False, steps: int = 1,
    interpret: bool | None = None, resident: bool | None = None,
    headbatch: bool | None = None,
) -> Tuple[jnp.ndarray, ...]:
    """Whole-model decode -> (logits [b, vocab] f32, kv, ckv, ring), or
    with ``greedy=True`` -> (logits, tokens [b, steps] int32, kv, ckv,
    ring) with the argmax sampled IN-KERNEL.

    ``steps > 1`` (greedy only) decodes that many consecutive tokens in
    ONE launch: grid (steps, depth), with the sampled token fed back
    through scratch — launch cost amortizes across the chunk and the
    scan body contains no per-step XLA work at all.  ``tokens[:, i]`` is
    the token sampled AFTER consuming position t+i (so tokens[:, :-1]
    are the next steps' inputs and tokens[:, -1] is the carry).

    ``mp`` is the stacked parameter dict from
    models.transformer.pack_mega_params.  The caches are stacked across
    layers and updated in place (aliased).
    """
    L, b, kvh, max_len, _2d = kv.shape
    d = dim_head
    g = heads // kv_heads
    Wc = ckv.shape[3]
    Bc = ring.shape[3]
    dim = mp["token_emb"].shape[1]
    vocab = mp["to_logits"].shape[1]
    hid = mp["w1k"].shape[3]
    hid4 = mp["fw1"].shape[2]
    P = mp["w_qkvg"].shape[2]
    n_slots = num_sel + n_slide
    max_blocks = max_len // sel_block
    # statics arrive CONCRETE from decode_step_mega (env resolution lives
    # there, outside the jit, so env flips are not masked by the jit cache)
    assert interpret is not None and resident is not None
    assert headbatch is not None
    # b 16 needs the raised scoped-VMEM limit (~75 MB launch caches +
    # scratch; ops/common.tpu_compiler_options); b 32's launch-resident
    # ckv alone is ~102 MB — out of reach on v5e
    assert b <= 16, "megakernel decode targets the small-batch regime"
    assert steps == 1 or greedy, "multi-step decode requires greedy"
    assert not (resident and b > 4), "resident weights are clamped to b <= 4"

    scal = t.astype(jnp.int32)[None]    # everything else derives in-kernel

    cdt = kv.dtype
    mdt = mp["token_emb"].dtype

    def c(ix):
        """index_map for operands constant over the whole grid."""
        return lambda si, l, sc, tk: ix

    def per_l(nd):
        """index_map for [L, ...] stacked operands blocked per layer."""
        return lambda si, l, sc, tk: (l,) + (0,) * nd

    M = mp["mem_kv"].shape[3]
    in_specs = [
        pl.BlockSpec((heads * d, heads * d), c((0, 0)),
                     memory_space=pltpu.VMEM),
        _hbm_spec(interpret),                                   # emb
        pl.BlockSpec((1, dim), c((0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((dim, vocab), c((0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, dim), per_l(2), memory_space=pltpu.VMEM),
        _hbm_spec(interpret) if resident else
        pl.BlockSpec((1, dim, P), per_l(2), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 3 * heads), per_l(2), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, kvh, M, d), per_l(4), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kvh, Bc, 2 * d), per_l(3), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kvh, hid), per_l(2), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kvh, hid), per_l(2), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kvh, 2 * d), per_l(2), memory_space=pltpu.VMEM),
        _hbm_spec(interpret),                                   # w1k
        _hbm_spec(interpret),                                   # w1v
        _hbm_spec(interpret),                                   # w2c
        _hbm_spec(interpret) if resident else
        pl.BlockSpec((1, heads * d, dim), per_l(2), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, dim), per_l(2), memory_space=pltpu.VMEM),
        _hbm_spec(interpret) if resident else
        pl.BlockSpec((1, dim, hid4), per_l(2), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hid4), per_l(2), memory_space=pltpu.VMEM),
        _hbm_spec(interpret) if resident else
        pl.BlockSpec((1, hid4, dim), per_l(2), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, dim), per_l(2), memory_space=pltpu.VMEM),
        _hbm_spec(interpret),                                   # ckv
        _hbm_spec(interpret),                                   # ring
        _hbm_spec(interpret),                                   # kv
    ]
    operands = [
        mp["pswap"], mp["token_emb"], mp["out_norm"], mp["to_logits"],
        mp["attn_norm"], mp["w_qkvg"], mp["gate_b"], mp["mem_kv"],
        mp["pos_kv"], mp["b1k"], mp["b1v"], mp["b2c"],
        mp["w1k"], mp["w1v"], mp["w2c"], mp["w_out"],
        mp["ff_norm"], mp["fw1"], mp["fb1"], mp["fw2"], mp["fb2"],
        ckv, ring, kv,
    ]
    # operand numbering includes the two scalar-prefetch args
    ckv_ix = 2 + len(operands) - 3
    ring_ix = ckv_ix + 1
    kv_ix = ckv_ix + 2

    out_specs = [pl.BlockSpec((b, vocab), c((0, 0)), memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((b, vocab), jnp.float32)]
    if greedy:
        out_specs.append(
            pl.BlockSpec((steps, b), c((0, 0)), memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((steps, b), jnp.int32))
    cache_out_base = len(out_specs)
    out_specs += [
        _hbm_spec(interpret),                                   # ckv (aliased)
        _hbm_spec(interpret),                                   # ring (aliased)
        _hbm_spec(interpret),                                   # kv (aliased)
    ]
    out_shapes += [
        jax.ShapeDtypeStruct(ckv.shape, ckv.dtype),
        jax.ShapeDtypeStruct(ring.shape, ring.dtype),
        jax.ShapeDtypeStruct(kv.shape, kv.dtype),
    ]

    if headbatch:
        B = b * kvh
        scratch_shapes = [
            pltpu.VMEM((b, dim), mdt),                          # x_s
            pltpu.VMEM((2, heads * d), jnp.float32),            # cs_s
            pltpu.VMEM((8, dim), mdt),                          # embw_s
            pltpu.VMEM(ckv.shape, cdt),                         # ckv_all_s
            pltpu.VMEM(ring.shape, cdt),                        # ring_all_s
            pltpu.VMEM((b, 1), jnp.int32),                      # tok_s
            pltpu.VMEM((kvh, Bc * d, hid), cdt),                # w1k_s
            pltpu.VMEM((kvh, Bc * d, hid), cdt),                # w1v_s
            pltpu.VMEM((kvh, hid, 2 * d), cdt),                 # w2c_s
            pltpu.VMEM((b, kvh, 2 * d), cdt),                   # cand_s
            pltpu.VMEM((b, kvh, 2 * d), cdt),                   # newkv_s
            pltpu.VMEM((B, 1, g, d), mdt),                      # q_s
            pltpu.VMEM((B, 1, g, d), mdt),                      # rq_s
            pltpu.VMEM((B, 1, g, d), mdt),                      # cout_s
            pltpu.VMEM((B, 1, g, 3), mdt),                      # gates_s
            pltpu.VMEM((B, INFO_WIDTH), jnp.int32),             # info_s
            pltpu.VMEM((B, n_slots * sel_block, 2 * d), cdt),   # fkv_s
            pltpu.VMEM((b, heads * d), cdt),                    # co_s
        ] + [
            pltpu.VMEM((b, 8, 2 * d), cdt)                      # wkv per head
            for _ in range(kv_heads)
        ] + [
            pltpu.SemaphoreType.DMA((kv_heads, n_slots)),       # gsems
            pltpu.SemaphoreType.DMA((kv_heads,)),               # wsem
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
        kernel_fn = _mega_kernel_hb
    else:
        scratch_shapes = [
            pltpu.VMEM((b, dim), mdt),                          # x_s
            pltpu.VMEM((2, heads * d), jnp.float32),            # cs_s
            pltpu.VMEM((8, dim), mdt),                          # embw_s
            pltpu.VMEM(ckv.shape, cdt),                         # ckv_all_s
            pltpu.VMEM((b, 1, Wc, 2 * d), cdt),                 # ckv_sel_s
            pltpu.VMEM(ring.shape, cdt),                        # ring_all_s
            pltpu.VMEM((b, 1), jnp.int32),                      # tok_s
            pltpu.VMEM((Bc * d, hid), cdt),                     # w1k_s
            pltpu.VMEM((Bc * d, hid), cdt),                     # w1v_s
            pltpu.VMEM((hid, 2 * d), cdt),                      # w2c_s
            pltpu.VMEM((b, 2 * d), cdt),                        # cand_s
        ] + [
            pltpu.VMEM((b, 1, g, d), mdt)                       # q per head
            for _ in range(kv_heads)
        ] + [
            pltpu.VMEM((b, 1, g, d), mdt)                       # rq per head
            for _ in range(kv_heads)
        ] + [
            pltpu.VMEM((b, 1, g, d), mdt)                       # cout per head
            for _ in range(kv_heads)
        ] + [
            pltpu.VMEM((b, 1, g, 3), mdt)                       # gates per head
            for _ in range(kv_heads)
        ] + [
            pltpu.VMEM((b, INFO_WIDTH), jnp.int32)              # info per head
            for _ in range(kv_heads)
        ] + [
            pltpu.VMEM((b, n_slots * sel_block, 2 * d), cdt)    # fkv per head
            for _ in range(kv_heads)
        ] + [
            pltpu.VMEM((b, 8, 2 * d), cdt)                      # wkv per head
            for _ in range(kv_heads)
        ] + [
            pltpu.SemaphoreType.DMA((kv_heads, n_slots)),       # gsems
            pltpu.SemaphoreType.DMA((kv_heads,)),               # wsem
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
        kernel_fn = _mega_kernel
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(steps, depth),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch_shapes + ([
            pltpu.VMEM((L, dim, P), mdt),                   # wqkvg_all_s
            pltpu.VMEM((L, heads * d, dim), mdt),           # wout_all_s
            pltpu.VMEM((L, dim, hid4), mdt),                # fw1_all_s
            pltpu.VMEM((L, hid4, dim), mdt),                # fw2_all_s
            pltpu.SemaphoreType.DMA((4,)),                  # ressems
        ] if resident else []),
    )
    outs = pl.pallas_call(
        functools.partial(
            kernel_fn, scale=scale, stride=stride, sel_block=sel_block,
            num_sel=num_sel, n_slide=n_slide, window=window,
            max_blocks=max_blocks, eps=eps, depth=depth, theta=theta,
            greedy=greedy, resident=resident, kv_heads=kv_heads,
        ),
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        input_output_aliases={
            ckv_ix: cache_out_base,
            ring_ix: cache_out_base + 1,
            kv_ix: cache_out_base + 2,
        },
        interpret=interpret,
    )(scal, token.astype(jnp.int32), *operands)
    if greedy:
        logits, tok, new_ckv, new_ring, new_kv = outs
        return logits, tok.T, new_kv, new_ckv, new_ring
    logits, new_ckv, new_ring, new_kv = outs
    return logits, new_kv, new_ckv, new_ring
