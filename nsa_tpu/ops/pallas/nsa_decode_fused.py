"""Fully-fused decode-step kernels: 2 Pallas launches per NSA layer.

Round-3 redesign of the decode hot path (see RESULTS.md round-2 xprof):
on this backend decode latency = device-op count x fixed launch cost, and
the round-2 path still paid ~7 launches + an unconditional compressor
weight read (~17 MB/layer, read EVERY step for a 1-in-stride emission)
per layer.  These kernels collapse the whole per-layer attention step to:

* ``decode_select_emit`` — everything the round-2 ``decode_select`` did
  (compressed attention, grouped importance, regroup, diagonal mask,
  pad-softmax-strip, iterative top-k) PLUS:
    - the unrotated ring-buffer shift (ring is aliased in/out);
    - the compressed-block emission, computed ONLY on emission steps
      under ``pl.when``: the GroupedMLP weights stay in HBM and are
      manually DMA'd into VMEM scratch once per (emission step, head), so
      the per-step amortized weight traffic drops by ``stride``x;
    - the emitted row is DMA'd straight into the (aliased, donated) ckv
      cache — no XLA dynamic_update_slice, no trash-row trick.
* ``decode_attend_fused`` — everything the round-2 ``decode_attend`` did
  (fine + sliding attention over the selected-union-trailing blocks, gate
  combine) PLUS:
    - the block gather, as per-block async DMA from the HBM kv cache
      (indices arrive via scalar prefetch from ``decode_select_emit``'s
      packed info output) — replaces the separate XLA gather;
    - the new token's packed kv row is DMA'd into the (aliased, donated)
      kv cache inside the kernel — no XLA dynamic_update_slice — and the
      block-diagonal read waits on that write so the current token
      attends to itself exactly as before;
    - the output projection, accumulated across the KV-head grid
      dimension (w_out is blocked per head), with the residual stream
      added in — the kernel returns ``x + attn_out`` directly.

Semantics are pinned to the XLA path by tests/test_decode_equivalence.py
and tests/test_impl_equivalence.py; reference semantics:
native_sparse_attention.py:338-547 (forward_inference) with the prefill
masking rule (see ops/nsa.py module docstring).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nsa_decode import INFO_WIDTH, NEG, SCORE_EPS, _pick_batch_tile
from .runtime import resolve_interpret


import os as _os

# The compressed-logit pass is a batched matvec (g=2 query rows per batch
# element): as an MXU batched dot it engages 2 of 8 sublane rows per pass
# and was the single largest decode cost at 300us/layer (RESULTS r2).  The
# VPU formulation (broadcast multiply + lane reduction over d) streams the
# same ckv bytes through 8x128 vector ops instead.  Opt-in via
# NSA_SELECT_VPU=1 for on-chip A/B; default MXU (the round-2 formulation,
# known Mosaic-legal).  Mixed int+None indexing lowers to >2-D gathers
# Mosaic rejects, so the VPU path uses static slices only.
_VPU_SELECT = _os.environ.get("NSA_SELECT_VPU", "") != ""


def _hbm_spec(interpret):
    """Unblocked spec for manually-DMA'd / aliased buffers: explicit HBM on
    hardware (ANY lets Mosaic place small buffers in VMEM, where 1-row DMA
    slices hit the 8-sublane tiling rule); ANY under interpret (the CPU
    interpreter mishandles HBM-constrained aliased refs)."""
    return pl.BlockSpec(
        memory_space=pl.ANY if interpret else pltpu.MemorySpace.HBM
    )



def _batched_matvec_qk(q, ck):
    """sim[b, g, w] = sum_d q[b, g, d] * ck[b, w, d] via VPU lane reduce."""
    Bt, g, d = q.shape
    outs = []
    for gi in range(g):
        qg = jax.lax.slice_in_dim(q, gi, gi + 1, axis=1)   # [Bt, 1, d]
        outs.append(jnp.sum(qg * ck, axis=-1))             # [Bt, W]
    return jnp.stack(outs, axis=1)                         # [Bt, g, W]


def _batched_matvec_av(attn, cv):
    """out[b, g, d] = sum_w attn[b, g, w] * cv[b, w, d].

    The contraction runs W (lanes of ``attn``) against W (sublanes of
    ``cv``) — a genuine cross-layout contraction, kept on the MXU even
    under NSA_SELECT_VPU (a VPU version needs a lane->sublane transpose
    Mosaic has no cheap lowering for)."""
    return jax.lax.dot_general(
        attn, cv, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _select_math(t, num_cb, q_ref, ckv_ref, memk, memv, cout_ref,
                 info_ref, *, scale, stride, sel_block, num_sel, n_slide,
                 max_blocks):
    """Compressed attention + selection pipeline (shared with round-2
    kernel; see nsa_decode._select_kernel for the original).

    ``t`` / ``num_cb`` are int32 VALUES: scalars (single-position decode)
    or [Bt] vectors (ragged decode — every row at its own position); all
    position math broadcasts over the row dim either way.

    ``memk`` / ``memv`` are f32 VALUES [M, d], not refs: the megakernel
    sources them by statically indexing one full-extent load of its
    stacked [1, 2, kvh, M, d] operand — ref views sliced through the
    tiled (M, d) dims are Mosaic-illegal ("slice shape along dimension
    3/4 must be aligned to tiling", r4c smoke).  [Bt, M, d] (per-row mem
    slots) is also accepted: the head-batched megakernel folds the kv
    heads into the row dim, so each row attends its own head's mem-KV.

    ``q_ref``/``ckv_ref`` may be VALUES too (only sliced, never written);
    ``cout_ref``/``info_ref`` must be real refs."""
    Bt, _, g, d = q_ref.shape
    Wc = ckv_ref.shape[2]
    npf = sel_block // stride
    t_r1 = jnp.asarray(t).reshape(-1, 1)                   # [1,1] | [Bt,1]
    ncb_r2 = jnp.asarray(num_cb).reshape(-1, 1, 1)         # [1,1,1] | [Bt,1,1]

    q = q_ref[:, 0].astype(jnp.float32)                    # [Bt, g, d]
    ck = ckv_ref[:, 0, :, :d].astype(jnp.float32)          # [Bt, Wc, d]
    cv = ckv_ref[:, 0, :, d:].astype(jnp.float32)

    if _VPU_SELECT:
        sim_c = _batched_matvec_qk(q, ck) * scale          # [Bt, g, Wc]
    else:
        sim_c = jax.lax.dot_general(
            q, ck, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
    cb_ids = jax.lax.broadcasted_iota(jnp.int32, (Bt, g, Wc), 2)
    sim_c = jnp.where(cb_ids < ncb_r2, sim_c, NEG)

    if memk.ndim == 3:                                     # per-row mem slots
        sim_m = jax.lax.dot_general(
            q, memk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                          # [Bt, g, M]
    else:
        sim_m = jax.lax.dot_general(
            q, memk, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                          # [Bt, g, M]

    m = jnp.maximum(
        jnp.max(sim_c, axis=-1, keepdims=True),
        jnp.max(sim_m, axis=-1, keepdims=True),
    )
    pc = jnp.exp(sim_c - m)
    pm = jnp.exp(sim_m - m)
    denom = jnp.sum(pc, -1, keepdims=True) + jnp.sum(pm, -1, keepdims=True)
    attn_c = pc / denom
    attn_m = pm / denom
    if _VPU_SELECT:
        c_out = _batched_matvec_av(attn_c, cv)
    else:
        c_out = jax.lax.dot_general(
            attn_c, cv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    if memv.ndim == 3:
        c_out = c_out + jax.lax.dot_general(
            attn_m, memv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    else:
        c_out = c_out + jax.lax.dot_general(
            attn_m, memv, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    cout_ref[:, 0] = c_out.astype(cout_ref.dtype)

    imp = jnp.mean(sim_c, axis=1)                          # [Bt, Wc]
    Wf = Wc // npf
    if npf > 1:
        src_ids = jax.lax.broadcasted_iota(jnp.int32, (Wc, Wf), 0)
        dst_ids = jax.lax.broadcasted_iota(jnp.int32, (Wc, Wf), 1)
        pool = jnp.where(src_ids // npf == dst_ids, 1.0 / npf, 0.0)
        imp = jax.lax.dot_general(
            imp, pool, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [Bt, Wf]
        diag = t_r1 // sel_block                           # [1,1] | [Bt,1]
        f_ids = jax.lax.broadcasted_iota(jnp.int32, (Bt, Wf), 1)
        imp = jnp.where(f_ids == diag, NEG, imp)
    mx = jnp.maximum(jnp.max(imp, axis=-1, keepdims=True), -1e3)
    p = jnp.exp(imp - mx)
    denom_f = jnp.sum(p, -1, keepdims=True) + jnp.exp(-1e3 - mx)
    scores = p / denom_f                                   # [Bt, Wf]

    f_ids = jax.lax.broadcasted_iota(jnp.int32, (Bt, Wf), 1)
    cur = scores
    for s in range(num_sel):
        v = jnp.max(cur, axis=-1, keepdims=True)
        amax = jnp.argmax(cur, axis=-1, keepdims=True)
        info_ref[:, s:s + 1] = amax.astype(jnp.int32)
        info_ref[:, num_sel + n_slide + s:num_sel + n_slide + s + 1] = (
            v > SCORE_EPS
        ).astype(jnp.int32)
        cur = jnp.where(f_ids == amax, NEG, cur)

    last_blk = t_r1 // sel_block                           # [1,1] | [Bt,1]
    for j in range(n_slide):
        blk = jnp.clip(last_blk - (n_slide - 1 - j), 0, max_blocks - 1)
        info_ref[:, num_sel + j:num_sel + j + 1] = jnp.broadcast_to(
            blk, (Bt, 1)
        ).astype(jnp.int32)


def _select_emit_kernel(
    scal_ref,       # SMEM [4]: t, num_cb, emit, slot
    q_ref,          # [Bt, 1, g, d] unrotated queries
    ckv_ref,        # [Bt, 1, Wc, 2d] VMEM (pre-update view of the cache)
    ring_ref,       # [Bt, 1, Bc, 2d] VMEM, aliased -> ring_out
    kvnew_ref,      # [Bt, 1, 1, 2d] unrotated k||v of the new token
    memk_ref,       # [1, M, d]
    memv_ref,       # [1, M, d]
    pos_ref,        # [1, Bc, 2d] packed k_pos||v_pos for this head
    b1k_ref,        # [1, 1, hid]
    b1v_ref,        # [1, 1, hid]
    b2_ref,         # [1, 1, 2d] packed b2_k||b2_v
    w1k_hbm,        # [kvh, Bc*d, hid] ANY (manual DMA on emit steps)
    w1v_hbm,        # [kvh, Bc*d, hid] ANY
    w2_hbm,         # [kvh, hid, 2d] ANY, packed w2_k||w2_v
    cout_ref,       # out: [Bt, 1, g, d]
    info_ref,       # out: [Bt, INFO_WIDTH]
    ckv_out,        # out: ANY, aliased to the ckv cache buffer
    ring_out,       # out: [Bt, 1, Bc, 2d], aliased to ring
    w1k_s,          # scratch VMEM [Bc*d, hid]
    w1v_s,          # scratch VMEM [Bc*d, hid]
    w2_s,           # scratch VMEM [hid, 2d]
    cand_s,         # scratch VMEM [Bt, 2d]
    win_s,          # scratch VMEM [Bt, 8, 2d] (aligned ckv RMW window)
    sems,           # DMA semaphores (4,)
    *, scale, stride, sel_block, num_sel, n_slide, max_blocks, blk_size,
):
    t = scal_ref[0]
    emit = scal_ref[2]
    slot = scal_ref[3]
    hi = pl.program_id(0)
    bi = pl.program_id(1)
    Bt = q_ref.shape[0]
    Bc = ring_ref.shape[2]
    d = q_ref.shape[3]
    hid = w1k_s.shape[1]

    # ---- ring shift (every step): slot j <- j+1, last <- new token -------
    ring = ring_ref[:, 0]                                  # [Bt, Bc, 2d]
    new_row = kvnew_ref[:, 0]                              # [Bt, 1, 2d]
    shifted = jnp.concatenate([ring[:, 1:], new_row], axis=1)
    ring_out[:, 0] = shifted

    # ---- predicated compressed-block emission ----------------------------
    # Weights stream from HBM only when a block is actually emitted (1 in
    # ``stride`` steps), and only on the first batch tile of each head
    # (scratch persists across the inner batch-grid steps).
    @pl.when(jnp.logical_and(emit == 1, bi == 0))
    def _load_weights():
        cp1 = pltpu.make_async_copy(w1k_hbm.at[hi], w1k_s, sems.at[0])
        cp2 = pltpu.make_async_copy(w1v_hbm.at[hi], w1v_s, sems.at[1])
        cp3 = pltpu.make_async_copy(w2_hbm.at[hi], w2_s, sems.at[2])
        cp1.start()
        cp2.start()
        cp3.start()
        cp1.wait()
        cp2.wait()
        cp3.wait()

    @pl.when(emit == 1)
    def _emit():
        # emission window = the shifted ring = positions [t+1-Bc, t+1);
        # rows before the sequence start are zeroed, intra-block position
        # embeddings are added to every row (matching ops/nsa._compress_kv)
        row_pos = (t + 1 - Bc) + jax.lax.broadcasted_iota(
            jnp.int32, (Bt, Bc, 2 * d), 1
        )
        win = jnp.where(row_pos >= 0, shifted, 0.0)
        win = win + pos_ref[0][None].astype(win.dtype)     # [Bt, Bc, 2d]

        hk = jnp.zeros((Bt, hid), jnp.float32)
        hv = jnp.zeros((Bt, hid), jnp.float32)
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
        hk = jax.nn.relu(hk + b1k_ref[0, 0].astype(jnp.float32))
        hv = jax.nn.relu(hv + b1v_ref[0, 0].astype(jnp.float32))
        hk = hk.astype(cand_s.dtype)
        hv = hv.astype(cand_s.dtype)
        ck = jax.lax.dot_general(
            hk, w2_s[:, :d], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[0, 0, :d].astype(jnp.float32)
        cv = jax.lax.dot_general(
            hv, w2_s[:, d:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[0, 0, d:].astype(jnp.float32)
        cand_s[:, :d] = ck.astype(cand_s.dtype)
        cand_s[:, d:] = cv.astype(cand_s.dtype)
        # The slot dim of the HBM ckv cache is 8-sublane tiled: a 1-row DMA
        # slice is Mosaic-illegal ("slice shape must be aligned to tiling").
        # Read-modify-write the 8-row aligned window containing ``slot``
        # instead; rows above ``slot`` are future emissions (never read
        # while masked) and rows below hold history (preserved by the RMW).
        # _ckv_width pads Wc to a multiple of 8, so Wc-8 is aligned and the
        # multiple_of hint stays honest even if the clamp ever engages.
        Wc = ckv_ref.shape[2]
        base = pl.multiple_of(jnp.minimum((slot // 8) * 8, Wc - 8), 8)
        roff = slot - base
        rd = pltpu.make_async_copy(
            ckv_out.at[pl.ds(bi * Bt, Bt), hi, pl.ds(base, 8), :],
            win_s, sems.at[3],
        )
        rd.start()
        rd.wait()
        ri = jax.lax.broadcasted_iota(jnp.int32, (8, 2 * d), 0)
        for r in range(Bt):
            win_s[r] = jnp.where(ri == roff, cand_s[r:r + 1, :], win_s[r])
        wr = pltpu.make_async_copy(
            win_s,
            ckv_out.at[pl.ds(bi * Bt, Bt), hi, pl.ds(base, 8), :],
            sems.at[3],
        )
        wr.start()
        wr.wait()

    # ---- compressed attention + selection (reads the pre-update ckv) -----
    _select_math(
        t, scal_ref[1], q_ref, ckv_ref,
        memk_ref[0].astype(jnp.float32), memv_ref[0].astype(jnp.float32),
        cout_ref, info_ref, scale=scale, stride=stride, sel_block=sel_block,
        num_sel=num_sel, n_slide=n_slide, max_blocks=max_blocks,
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_blocks", "stride", "sel_block", "num_sel",
                     "n_slide", "scale", "batch_tile", "interpret"),
)
def decode_select_emit(
    q: jnp.ndarray,          # [b, kvh, g, d] UNROTATED queries
    ckv: jnp.ndarray,        # [b, kvh, Wc, 2d] (donated; aliased in place)
    ring: jnp.ndarray,       # [b, kvh, Bc, 2d] (donated; aliased in place)
    kv_new: jnp.ndarray,     # [b, kvh, 1, 2d] unrotated new-token k||v
    mem_kv: jnp.ndarray,     # [2, kvh, M, d]
    pos_kv: jnp.ndarray,     # [kvh, Bc, 2d] packed k_pos||v_pos
    w1k: jnp.ndarray,        # [kvh, Bc*d, hid]
    b1k: jnp.ndarray,        # [kvh, hid]
    w1v: jnp.ndarray,        # [kvh, Bc*d, hid]
    b1v: jnp.ndarray,        # [kvh, hid]
    w2: jnp.ndarray,         # [kvh, hid, 2d] packed w2_k||w2_v
    b2: jnp.ndarray,         # [kvh, 2d] packed b2_k||b2_v
    t: jnp.ndarray,          # scalar int32: tokens already cached
    num_cb: jnp.ndarray,     # scalar int32: compressed blocks cached
    max_blocks: int,
    *, stride: int, sel_block: int, num_sel: int, n_slide: int,
    scale: float, batch_tile: int = 32, interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (c_out [b,kvh,g,d], info [b,kvh*INFO_WIDTH], new_ckv, new_ring).

    Emission happens in-kernel: when ``t+1`` is a stride multiple the
    GroupedMLP compressor runs over the (shifted) ring window and the new
    compressed row lands at ``slot = num_cb`` of the ckv cache, which is
    aliased in place (reference emission: native_sparse_attention.py:418-443).
    """
    b, kvh, g, d = q.shape
    Wc = ckv.shape[2]
    Bc = ring.shape[2]
    hid = w1k.shape[2]
    interpret = resolve_interpret(interpret)
    Bt = _pick_batch_tile(b, batch_tile)

    t = t.astype(jnp.int32)
    num_cb = num_cb.astype(jnp.int32)
    overlap = Bc - stride
    run_fill = overlap + t - num_cb * stride
    emit = (run_fill + 1 == Bc).astype(jnp.int32)
    slot = jnp.clip(num_cb, 0, Wc - 1)
    scal = jnp.stack([t, num_cb, emit, slot])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kvh, b // Bt),
        in_specs=[
            pl.BlockSpec((Bt, 1, g, d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1, Wc, 2 * d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1, Bc, 2 * d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1, 1, 2 * d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mem_kv.shape[2], d), lambda hi, bi, s: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mem_kv.shape[2], d), lambda hi, bi, s: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bc, 2 * d), lambda hi, bi, s: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hid), lambda hi, bi, s: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hid), lambda hi, bi, s: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * d), lambda hi, bi, s: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            _hbm_spec(interpret),     # w1k
            _hbm_spec(interpret),     # w1v
            _hbm_spec(interpret),     # w2
        ],
        out_specs=(
            pl.BlockSpec((Bt, 1, g, d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, INFO_WIDTH), lambda hi, bi, s: (bi, hi),
                         memory_space=pltpu.VMEM),
            _hbm_spec(interpret),     # ckv (aliased)
            pl.BlockSpec((Bt, 1, Bc, 2 * d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),  # ring (aliased)
        ),
        scratch_shapes=[
            pltpu.VMEM((Bc * d, hid), ckv.dtype),
            pltpu.VMEM((Bc * d, hid), ckv.dtype),
            pltpu.VMEM((hid, 2 * d), ckv.dtype),
            pltpu.VMEM((Bt, 2 * d), ckv.dtype),
            pltpu.VMEM((Bt, 8, 2 * d), ckv.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    c_out, info, new_ckv, new_ring = pl.pallas_call(
        functools.partial(
            _select_emit_kernel, scale=scale, stride=stride,
            sel_block=sel_block, num_sel=num_sel, n_slide=n_slide,
            max_blocks=max_blocks, blk_size=sel_block,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, kvh, g, d), q.dtype),
            jax.ShapeDtypeStruct((b, kvh * INFO_WIDTH), jnp.int32),
            jax.ShapeDtypeStruct(ckv.shape, ckv.dtype),
            jax.ShapeDtypeStruct(ring.shape, ring.dtype),
        ),
        # operand numbering includes the scalar-prefetch arg (index 0):
        # ckv is operand 2 -> output 2, ring is operand 3 -> output 3
        input_output_aliases={2: 2, 3: 3},
        interpret=interpret,
    )(scal, q, ckv, ring, kv_new,
      mem_kv[0], mem_kv[1], pos_kv, b1k[:, None], b1v[:, None], b2[:, None],
      w1k, w1v, w2)
    return c_out, info, new_ckv, new_ring


def _attend_math(t, rq_ref, fkv, msk_ref, cout_ref, gates_ref, *,
                 scale, sel_block, window, num_sel, n_slide):
    """Fine + sliding attention + gate combine over gathered blocks.

    ``fkv``: [Bt, J, 2d] float32-convertible array (VMEM value).  ``t`` is
    an int32 VALUE: a scalar, or a [Bt] vector for ragged decode (per-row
    positions) — all position math broadcasts over the row dim.
    Returns the gate-combined [Bt, g, d] float32 output.
    (Same math as nsa_decode._attend_kernel round 2.)
    """
    Bt, _, g, d = rq_ref.shape
    J = fkv.shape[1]
    Bs = sel_block
    tb = jnp.asarray(t).reshape(-1, 1, 1)                  # [1,1,1]|[Bt,1,1]

    rq = rq_ref[:, 0].astype(jnp.float32)                  # [Bt, g, d]
    fk = fkv[:, :, :d].astype(jnp.float32)                 # [Bt, J, d]
    fv = fkv[:, :, d:].astype(jnp.float32)

    sim = jax.lax.dot_general(
        rq, fk, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                                              # [Bt, g, J]

    col = jax.lax.broadcasted_iota(jnp.int32, (Bt, g, J), 2)
    slot = col // Bs
    within = col % Bs

    off = num_sel + n_slide
    sel_ok = jnp.zeros((Bt, g, J), jnp.bool_)
    for s in range(num_sel):
        ok_s = (msk_ref[:, off + s:off + s + 1] != 0)[:, :, None]
        sel_ok = sel_ok | ((slot == s) & ok_s)

    last_blk = tb // Bs
    trail_j = slot - num_sel
    trail_blk = last_blk - (n_slide - 1) + trail_j
    j_global = trail_blk * Bs + within
    is_trail = slot >= num_sel
    trail_valid = is_trail & (trail_blk >= 0)

    fine_ok = sel_ok | (
        trail_valid & (slot == num_sel + n_slide - 1) & (j_global <= tb)
    )
    slide_ok = trail_valid & (j_global >= tb - window) & (j_global <= tb)

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

    c_out = cout_ref[:, 0].astype(jnp.float32)
    # gates arrive RAW as [Bt, g, 3] (3 lanes, padded); the per-branch
    # scalar broadcasts over the d lanes here — the old XLA-side
    # jnp.repeat(gates, d) was a real per-layer device op at decode
    gts = gates_ref[:, 0].astype(jnp.float32)              # [Bt, g, 3]
    return (gts[:, :, 0:1] * c_out
            + gts[:, :, 1:2] * f_out
            + gts[:, :, 2:3] * s_out)                      # [Bt, g, d]


def _erf_f32(x):
    """erf via the Abramowitz–Stegun 7.1.26 polynomial (|err| < 1.5e-7).

    Mosaic has NO erf/erfc lowering (only erf_inv), so
    ``jax.nn.gelu(approximate=False)`` — which JAX lowers through
    ``lax.erfc`` — fails TPU compilation inside a kernel.  The polynomial
    error is ~1 f32 ulp and far below bf16 resolution, so the decode
    equivalence tests' 2e-4 tolerances hold."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(h):
    """Exact GELU 0.5*x*(1+erf(x/sqrt(2))) in f32, rounded to h.dtype."""
    hf = h.astype(jnp.float32)
    out = 0.5 * hf * (1.0 + _erf_f32(hf * 0.7071067811865476))
    return out.astype(h.dtype)


def _ff_tail(y32, resid_dtype, ffnorm, ffb1, ffb2, ffw1_s,
             ffw2_s, *, eps):
    """Feed-forward block over the accumulated residual stream, matching
    models.transformer._ff_apply (gelu kind) op-for-op: the stream is
    cast to the model dtype first (the model adds attn in that dtype),
    RMSNorm runs in f32, the two matmuls round to the model dtype before
    their bias adds, gelu is exact (via the in-kernel erf polynomial)."""
    y16 = y32.astype(resid_dtype)                          # [Bt, dim]
    yf = y16.astype(jnp.float32)
    var = jnp.mean(yf * yf, axis=-1, keepdims=True)
    normed = (yf * jax.lax.rsqrt(var + eps)
              * ffnorm.astype(jnp.float32)).astype(resid_dtype)
    h = jax.lax.dot_general(
        normed, ffw1_s[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(resid_dtype) + ffb1.astype(resid_dtype)
    h = _gelu_exact(h)
    o = jax.lax.dot_general(
        h, ffw2_s[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(resid_dtype) + ffb2.astype(resid_dtype)
    return (y16 + o).astype(jnp.float32)


def _attend_fused_kernel(
    scal_ref,       # SMEM [1]: t
    idx_ref,        # SMEM [b, kvh, n_slots] int32 block ids
    rq_ref,         # [Bt, 1, g, d] rotated queries
    kvnew_ref,      # [Bt, 1, 1, 2d] rotated-k||v of the new token
    msk_ref,        # [Bt, INFO_WIDTH] packed info (vector view)
    cout_ref,       # [Bt, 1, g, d] branch-1 output
    gates_ref,      # [Bt, 1, g, 3] raw branch gates (broadcast in-kernel)
    resid_ref,      # [Bt, 1, dim] residual-stream input x
    wout_ref,       # [1, g, d, dim] this head's slice of w_out
    *rest,
    # operand layout depends on the static with_ff flag:
    #   with_ff: ffnorm [1,dim], ffb1 [1,hid4], ffb2 [1,dim],
    #            ffw1 ANY [dim,hid4], ffw2 ANY [hid4,dim], kv ANY,
    #            out, kv_out, fkv_s, win_s, comb_s, wsem, gsems, ffw1_s,
    #            ffw2_s, fsems
    #   else:    kv ANY, out, kv_out, fkv_s, win_s, comb_s, wsem, gsems
    scale, sel_block, window, num_sel, n_slide, with_ff, eps,
):
    if with_ff:
        (ffnorm_ref, ffb1_ref, ffb2_ref, ffw1_hbm, ffw2_hbm, kv_hbm,
         out_ref, kv_out, fkv_s, win_s, comb_s, wsem, gsems, ffw1_s,
         ffw2_s, fsems) = rest
    else:
        (kv_hbm, out_ref, kv_out, fkv_s, win_s, comb_s, wsem, gsems) = rest
    t = scal_ref[0]
    bi = pl.program_id(0)
    hi = pl.program_id(1)

    if with_ff:
        # stream the FF weights once (first program); waited before the
        # FF tail on the last head step of the first batch tile — scratch
        # persists across grid steps for the later tiles
        @pl.when(jnp.logical_and(bi == 0, hi == 0))
        def _load_ff():
            pltpu.make_async_copy(ffw1_hbm, ffw1_s, fsems.at[0]).start()
            pltpu.make_async_copy(ffw2_hbm, ffw2_s, fsems.at[1]).start()
    Bt, _, g, d = rq_ref.shape
    Bs = sel_block
    n_slots = num_sel + n_slide
    max_blocks = kv_hbm.shape[2] // Bs

    # ---- start the RMW read + all non-diagonal gathers up front ----------
    # The new token's row lands in the aligned 8-row window containing
    # ``t`` (the row dim is 8-sublane tiled; 1-row DMA slices are
    # Mosaic-illegal).  Only the DIAGONAL block read must order after the
    # window write: selected blocks never include the diagonal (its
    # importance score is masked NEG before top-k) and trailing blocks sit
    # strictly below it, so those gathers overlap the RMW round-trip
    # (ADVICE r3 #5).  Early-sequence clipped trailing reads can touch
    # block 0 while the write is in flight, but every such row is masked
    # out of both softmaxes downstream, so torn data is value-free.
    base = pl.multiple_of(jnp.minimum((t // 8) * 8, max_blocks * Bs - 8), 8)
    roff = t - base
    rd = pltpu.make_async_copy(
        kv_out.at[pl.ds(bi * Bt, Bt), hi, pl.ds(base, 8), :], win_s, wsem)
    rd.start()

    pending = []
    for r in range(Bt):
        for s in range(num_sel):
            blk = idx_ref[bi * Bt + r, hi, s]
            cp = pltpu.make_async_copy(
                kv_out.at[bi * Bt + r, hi, pl.ds(blk * Bs, Bs), :],
                fkv_s.at[r, pl.ds(s * Bs, Bs), :],
                gsems.at[s],
            )
            cp.start()
            pending.append(cp)
    # trailing-window blocks (shared indices); blocks before the sequence
    # start are clipped to 0 and masked downstream
    last_blk = t // Bs
    for j in range(n_slide - 1):
        blk = jnp.clip(last_blk - (n_slide - 1 - j), 0, max_blocks - 1)
        cp = pltpu.make_async_copy(
            kv_out.at[pl.ds(bi * Bt, Bt), hi, pl.ds(blk * Bs, Bs), :],
            fkv_s.at[:, pl.ds((num_sel + j) * Bs, Bs), :],
            gsems.at[num_sel + j],
        )
        cp.start()
        pending.append(cp)

    # ---- commit the new token's row (read-modify-write) ------------------
    rd.wait()
    newv = kvnew_ref[:, 0, 0]                              # [Bt, 2d]
    ri = jax.lax.broadcasted_iota(jnp.int32, (8, 2 * d), 0)
    for r in range(Bt):
        win_s[r] = jnp.where(ri == roff, newv[r:r + 1, :], win_s[r])
    wr = pltpu.make_async_copy(
        win_s, kv_out.at[pl.ds(bi * Bt, Bt), hi, pl.ds(base, 8), :], wsem)
    wr.start()
    wr.wait()

    # the diagonal block contains the row the RMW above just committed:
    # read it back so the current token attends to itself
    diag = jnp.clip(last_blk, 0, max_blocks - 1)
    cp = pltpu.make_async_copy(
        kv_out.at[pl.ds(bi * Bt, Bt), hi, pl.ds(diag * Bs, Bs), :],
        fkv_s.at[:, pl.ds((n_slots - 1) * Bs, Bs), :],
        gsems.at[n_slots - 1],
    )
    cp.start()
    pending.append(cp)
    for cp in pending:
        cp.wait()

    # ---- fine + sliding + gate combine -----------------------------------
    combined = _attend_math(
        t, rq_ref, fkv_s[:, :, :], msk_ref, cout_ref, gates_ref,
        scale=scale, sel_block=sel_block, window=window, num_sel=num_sel,
        n_slide=n_slide,
    )                                                      # [Bt, g, d] f32

    # ---- output projection, accumulated across the head grid -------------
    # contract over (g, d) without a lane-crossing reshape or a batched
    # matmul (Mosaic wants batch dims co-located): park combined in VMEM
    # and accumulate g plain 2-D matmuls via ref-collapse slices
    comb_s[...] = combined.astype(comb_s.dtype)
    part = None
    for gi in range(g):
        pg = jax.lax.dot_general(
            comb_s[:, gi, :], wout_ref[0, gi],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [Bt, dim]
        part = pg if part is None else part + pg           # [Bt, dim]

    @pl.when(hi == 0)
    def _init():
        out_ref[:, 0] = resid_ref[:, 0].astype(jnp.float32) + part

    @pl.when(hi != 0)
    def _acc():
        out_ref[:, 0] = out_ref[:, 0] + part

    if with_ff:
        @pl.when(jnp.logical_and(bi == 0, hi == pl.num_programs(1) - 1))
        def _wait_ff():
            pltpu.make_async_copy(ffw1_hbm, ffw1_s, fsems.at[0]).wait()
            pltpu.make_async_copy(ffw2_hbm, ffw2_s, fsems.at[1]).wait()

        @pl.when(hi == pl.num_programs(1) - 1)
        def _ff():
            out_ref[:, 0] = _ff_tail(
                out_ref[:, 0], resid_ref.dtype, ffnorm_ref[0], ffb1_ref[0],
                ffb2_ref[0], ffw1_s, ffw2_s, eps=eps,
            )


@functools.partial(
    jax.jit,
    static_argnames=("sel_block", "window", "num_sel", "n_slide", "scale",
                     "batch_tile", "interpret", "eps"),
)
def decode_attend_fused(
    rq: jnp.ndarray,         # [b, kvh, g, d] rotated queries
    kv: jnp.ndarray,         # [b, kvh, max_len, 2d] cache (donated)
    kv_new: jnp.ndarray,     # [b, kvh, 1, 2d] rotated-k||v new token row
    info: jnp.ndarray,       # [b, kvh*INFO_WIDTH] from decode_select_emit
    c_out: jnp.ndarray,      # [b, kvh, g, d]
    gates: jnp.ndarray,      # [b, kvh, g, 3]
    x: jnp.ndarray,          # [b, 1, dim] residual stream input
    w_out: jnp.ndarray,      # [dim_inner, dim]
    t: jnp.ndarray,
    ff: tuple = (),          # optional (norm_scale, w1, b1, w2, b2)
    *, sel_block: int, window: int, num_sel: int, n_slide: int, scale: float,
    batch_tile: int = 16, interpret: bool | None = None, eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (layer output [b, 1, dim] in x.dtype, new kv cache).

    The kernel gathers the selected + trailing blocks from the HBM cache by
    DMA, writes the new token's row in place (kv is aliased/donated), and
    returns the residual-added, output-projected attention result.  When
    ``ff`` is given (gelu-kind feed-forward params), the whole FF block
    runs in the kernel's last head-grid step and the return value is the
    COMPLETE layer output ``y + FF(norm(y))`` with ``y = x + attn``.
    """
    b, kvh, g, d = rq.shape
    dim = x.shape[-1]
    n_slots = num_sel + n_slide
    J = n_slots * sel_block
    interpret = resolve_interpret(interpret)
    Bt = _pick_batch_tile(b, batch_tile)
    with_ff = bool(ff)

    scal = t.astype(jnp.int32)[None]
    idx = info.reshape(b, kvh, INFO_WIDTH)[:, :, :n_slots].astype(jnp.int32)
    gates_bc = gates.astype(rq.dtype)                      # [b, kvh, g, 3]
    wout3 = w_out.reshape(kvh, g, d, dim)

    in_specs = [
        pl.BlockSpec((Bt, 1, g, d), lambda bi, hi, s, i: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 1, 1, 2 * d), lambda bi, hi, s, i: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, INFO_WIDTH), lambda bi, hi, s, i: (bi, hi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 1, g, d), lambda bi, hi, s, i: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 1, g, 3), lambda bi, hi, s, i: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 1, dim), lambda bi, hi, s, i: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, g, d, dim), lambda bi, hi, s, i: (hi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [scal, idx, rq, kv_new, info, c_out, gates_bc, x, wout3]
    scratch = [
        pltpu.VMEM((Bt, J, 2 * d), kv.dtype),
        pltpu.VMEM((Bt, 8, 2 * d), kv.dtype),
        pltpu.VMEM((Bt, g, d), kv.dtype),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((n_slots,)),
    ]
    if with_ff:
        fnorm, fw1, fb1, fw2, fb2 = ff
        hid4 = fw1.shape[1]
        wdt = x.dtype
        in_specs += [
            pl.BlockSpec((1, dim), lambda bi, hi, s, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid4), lambda bi, hi, s, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda bi, hi, s, i: (0, 0),
                         memory_space=pltpu.VMEM),
            _hbm_spec(interpret),     # ffw1
            _hbm_spec(interpret),     # ffw2
        ]
        operands += [fnorm[None], fb1[None], fb2[None],
                     fw1.astype(wdt), fw2.astype(wdt)]
        scratch += [
            pltpu.VMEM((dim, hid4), wdt),
            pltpu.VMEM((hid4, dim), wdt),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    in_specs.append(_hbm_spec(interpret))    # kv cache
    operands.append(kv)
    kv_idx = len(operands) - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // Bt, kvh),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((Bt, 1, dim), lambda bi, hi, s, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            _hbm_spec(interpret),     # kv (aliased)
        ),
        scratch_shapes=scratch,
    )
    out, new_kv = pl.pallas_call(
        functools.partial(
            _attend_fused_kernel, scale=scale, sel_block=sel_block,
            window=window, num_sel=num_sel, n_slide=n_slide,
            with_ff=with_ff, eps=eps,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, dim), jnp.float32),
            jax.ShapeDtypeStruct(kv.shape, kv.dtype),
        ),
        # operand numbering includes the two scalar-prefetch args
        input_output_aliases={kv_idx: 1},
        interpret=interpret,
    )(*operands)
    return out.astype(x.dtype), new_kv


# ---------------------------------------------------------------------------
# Ragged (per-row-position) variants: the continuous-batching engine's slot
# pool decodes every row at its OWN cache position.  Batching the scalar t
# over slots via vmap would force pallas into an explicit per-slot loop
# (one kernel launch per slot per layer); these kernels take t as a [b]
# vector instead — scalar-prefetched for per-row DMA addressing, and as a
# tiny VMEM int32 column for the vectorized position math.
# ---------------------------------------------------------------------------


def _select_emit_ragged_kernel(
    scal_ref,       # SMEM [5, b]: rows t, num_cb, emit, slot, emit_any
    q_ref,          # [Bt, 1, g, d]
    tn_ref,         # [Bt, 2] int32 VMEM: cols (t, num_cb)
    ckv_ref,        # [Bt, 1, Wc, 2d]
    ring_ref,       # [Bt, 1, Bc, 2d] aliased -> ring_out
    kvnew_ref,      # [Bt, 1, 1, 2d] unrotated
    memk_ref, memv_ref,   # [1, M, d]
    pos_ref,        # [1, Bc, 2d]
    b1k_ref, b1v_ref,     # [1, 1, hid]
    b2_ref,         # [1, 1, 2d]
    w1k_hbm, w1v_hbm, w2_hbm,   # ANY
    cout_ref, info_ref, ckv_out, ring_out,
    w1k_s, w1v_s, w2_s, cand_s, win_s, sems,
    *, scale, stride, sel_block, num_sel, n_slide, max_blocks,
):
    emit_any = scal_ref[4, 0]
    hi = pl.program_id(0)
    bi = pl.program_id(1)
    Bt = q_ref.shape[0]
    Bc = ring_ref.shape[2]
    d = q_ref.shape[3]
    hid = w1k_s.shape[1]
    tv = tn_ref[:, 0]                                      # [Bt]
    ncb_v = tn_ref[:, 1]

    # ---- ring shift (every step, position-independent) -------------------
    ring = ring_ref[:, 0]
    new_row = kvnew_ref[:, 0]
    shifted = jnp.concatenate([ring[:, 1:], new_row], axis=1)
    ring_out[:, 0] = shifted

    # ---- per-row predicated emission -------------------------------------
    @pl.when(jnp.logical_and(emit_any == 1, bi == 0))
    def _load_weights():
        cp1 = pltpu.make_async_copy(w1k_hbm.at[hi], w1k_s, sems.at[0])
        cp2 = pltpu.make_async_copy(w1v_hbm.at[hi], w1v_s, sems.at[1])
        cp3 = pltpu.make_async_copy(w2_hbm.at[hi], w2_s, sems.at[2])
        cp1.start()
        cp2.start()
        cp3.start()
        cp1.wait()
        cp2.wait()
        cp3.wait()

    @pl.when(emit_any == 1)
    def _emit():
        row_pos = (tv.reshape(-1, 1, 1) + 1 - Bc) + jax.lax.broadcasted_iota(
            jnp.int32, (Bt, Bc, 2 * d), 1
        )
        win = jnp.where(row_pos >= 0, shifted, 0.0)
        win = win + pos_ref[0][None].astype(win.dtype)

        hk = jnp.zeros((Bt, hid), jnp.float32)
        hv = jnp.zeros((Bt, hid), jnp.float32)
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
        hk = jax.nn.relu(hk + b1k_ref[0, 0].astype(jnp.float32))
        hv = jax.nn.relu(hv + b1v_ref[0, 0].astype(jnp.float32))
        hk = hk.astype(cand_s.dtype)
        hv = hv.astype(cand_s.dtype)
        ck = jax.lax.dot_general(
            hk, w2_s[:, :d], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[0, 0, :d].astype(jnp.float32)
        cv = jax.lax.dot_general(
            hv, w2_s[:, d:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[0, 0, d:].astype(jnp.float32)
        cand_s[:, :d] = ck.astype(cand_s.dtype)
        cand_s[:, d:] = cv.astype(cand_s.dtype)
        # per-row aligned RMW (see the scalar kernel): the slot dim is
        # 8-sublane tiled, so single-row DMA slices are Mosaic-illegal
        Wc = ckv_ref.shape[2]
        ri = jax.lax.broadcasted_iota(jnp.int32, (8, 2 * d), 0)
        for r in range(Bt):
            row = bi * Bt + r

            @pl.when(scal_ref[2, row] == 1)
            def _write_row(r=r, row=row):
                slot_r = scal_ref[3, row]
                base = pl.multiple_of(jnp.minimum((slot_r // 8) * 8, Wc - 8), 8)
                rd = pltpu.make_async_copy(
                    ckv_out.at[row, hi, pl.ds(base, 8), :],
                    win_s.at[r], sems.at[3],
                )
                rd.start()
                rd.wait()
                win_s[r] = jnp.where(
                    ri == slot_r - base, cand_s[r:r + 1, :], win_s[r])
                wr = pltpu.make_async_copy(
                    win_s.at[r],
                    ckv_out.at[row, hi, pl.ds(base, 8), :],
                    sems.at[3],
                )
                wr.start()
                wr.wait()

    _select_math(
        tv, ncb_v, q_ref, ckv_ref,
        memk_ref[0].astype(jnp.float32), memv_ref[0].astype(jnp.float32),
        cout_ref, info_ref,
        scale=scale, stride=stride, sel_block=sel_block, num_sel=num_sel,
        n_slide=n_slide, max_blocks=max_blocks,
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_blocks", "stride", "sel_block", "num_sel",
                     "n_slide", "scale", "batch_tile", "interpret"),
)
def decode_select_emit_ragged(
    q: jnp.ndarray,          # [b, kvh, g, d] UNROTATED queries
    ckv: jnp.ndarray,        # [b, kvh, Wc, 2d] (donated; aliased in place)
    ring: jnp.ndarray,       # [b, kvh, Bc, 2d] (donated; aliased in place)
    kv_new: jnp.ndarray,     # [b, kvh, 1, 2d]
    mem_kv: jnp.ndarray,     # [2, kvh, M, d]
    pos_kv: jnp.ndarray,     # [kvh, Bc, 2d]
    w1k, b1k, w1v, b1v, w2, b2,
    t: jnp.ndarray,          # [b] int32 per-row positions
    num_cb: jnp.ndarray,     # [b] int32
    max_blocks: int,
    *, stride: int, sel_block: int, num_sel: int, n_slide: int,
    scale: float, batch_tile: int = 16, interpret: bool | None = None,
):
    """Ragged decode_select_emit: -> (c_out, info, new_ckv, new_ring)."""
    b, kvh, g, d = q.shape
    Wc = ckv.shape[2]
    Bc = ring.shape[2]
    hid = w1k.shape[2]
    interpret = resolve_interpret(interpret)
    Bt = _pick_batch_tile(b, batch_tile)

    t = t.astype(jnp.int32)
    num_cb = num_cb.astype(jnp.int32)
    overlap = Bc - stride
    run_fill = overlap + t - num_cb * stride
    emit = (run_fill + 1 == Bc).astype(jnp.int32)
    slot = jnp.clip(num_cb, 0, Wc - 1)
    emit_any = jnp.broadcast_to((jnp.max(emit) > 0).astype(jnp.int32), (b,))
    scal = jnp.stack([t, num_cb, emit, slot, emit_any])    # [5, b]
    tn = jnp.stack([t, num_cb], axis=1)                    # [b, 2]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kvh, b // Bt),
        in_specs=[
            pl.BlockSpec((Bt, 1, g, d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 2), lambda hi, bi, s: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1, Wc, 2 * d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1, Bc, 2 * d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1, 1, 2 * d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mem_kv.shape[2], d), lambda hi, bi, s: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mem_kv.shape[2], d), lambda hi, bi, s: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bc, 2 * d), lambda hi, bi, s: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hid), lambda hi, bi, s: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hid), lambda hi, bi, s: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * d), lambda hi, bi, s: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            _hbm_spec(interpret),
            _hbm_spec(interpret),
            _hbm_spec(interpret),
        ],
        out_specs=(
            pl.BlockSpec((Bt, 1, g, d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, INFO_WIDTH), lambda hi, bi, s: (bi, hi),
                         memory_space=pltpu.VMEM),
            _hbm_spec(interpret),
            pl.BlockSpec((Bt, 1, Bc, 2 * d), lambda hi, bi, s: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bc * d, hid), ckv.dtype),
            pltpu.VMEM((Bc * d, hid), ckv.dtype),
            pltpu.VMEM((hid, 2 * d), ckv.dtype),
            pltpu.VMEM((Bt, 2 * d), ckv.dtype),
            pltpu.VMEM((Bt, 8, 2 * d), ckv.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    c_out, info, new_ckv, new_ring = pl.pallas_call(
        functools.partial(
            _select_emit_ragged_kernel, scale=scale, stride=stride,
            sel_block=sel_block, num_sel=num_sel, n_slide=n_slide,
            max_blocks=max_blocks,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, kvh, g, d), q.dtype),
            jax.ShapeDtypeStruct((b, kvh * INFO_WIDTH), jnp.int32),
            jax.ShapeDtypeStruct(ckv.shape, ckv.dtype),
            jax.ShapeDtypeStruct(ring.shape, ring.dtype),
        ),
        # operand numbering includes the scalar-prefetch arg: ckv is
        # operand 3 (scal, q, tn, ckv) -> output 2; ring operand 4 -> out 3
        input_output_aliases={3: 2, 4: 3},
        interpret=interpret,
    )(scal, q, tn, ckv, ring, kv_new,
      mem_kv[0], mem_kv[1], pos_kv, b1k[:, None], b1v[:, None], b2[:, None],
      w1k, w1v, w2)
    return c_out, info, new_ckv, new_ring


def _attend_fused_ragged_kernel(
    scal_ref,       # SMEM [b]: per-row t
    idx_ref,        # SMEM [b, kvh, n_slots]
    rq_ref,         # [Bt, 1, g, d]
    tvec_ref,       # [Bt, 2] int32 VMEM (col 0 = t)
    kvnew_ref,      # [Bt, 1, 1, 2d]
    msk_ref,        # [Bt, INFO_WIDTH]
    cout_ref,       # [Bt, 1, g, d]
    gates_ref,      # [Bt, 1, g, 3] raw branch gates (broadcast in-kernel)
    resid_ref,      # [Bt, 1, dim]
    wout_ref,       # [1, g, d, dim]
    *rest,          # (+ optional FF operands; see _attend_fused_kernel)
    scale, sel_block, window, num_sel, n_slide, with_ff, eps,
):
    if with_ff:
        (ffnorm_ref, ffb1_ref, ffb2_ref, ffw1_hbm, ffw2_hbm, kv_hbm,
         out_ref, kv_out, fkv_s, win_s, comb_s, wsem, gsems, ffw1_s,
         ffw2_s, fsems) = rest
    else:
        (kv_hbm, out_ref, kv_out, fkv_s, win_s, comb_s, wsem, gsems) = rest
    bi = pl.program_id(0)
    hi = pl.program_id(1)

    if with_ff:
        @pl.when(jnp.logical_and(bi == 0, hi == 0))
        def _load_ff():
            pltpu.make_async_copy(ffw1_hbm, ffw1_s, fsems.at[0]).start()
            pltpu.make_async_copy(ffw2_hbm, ffw2_s, fsems.at[1]).start()
    Bt, _, g, d = rq_ref.shape
    Bs = sel_block
    n_slots = num_sel + n_slide
    max_blocks = kv_hbm.shape[2] // Bs

    # ---- start all non-diagonal gathers, then the per-row RMWs -----------
    # Selected blocks never include the diagonal and trailing blocks sit
    # strictly below it, so these gathers overlap the serialized per-row
    # cache RMWs below (see the scalar kernel's ordering note).
    pending = []
    for r in range(Bt):
        row = bi * Bt + r
        for s in range(num_sel):
            blk = idx_ref[row, hi, s]
            cp = pltpu.make_async_copy(
                kv_out.at[row, hi, pl.ds(blk * Bs, Bs), :],
                fkv_s.at[r, pl.ds(s * Bs, Bs), :],
                gsems.at[s],
            )
            cp.start()
            pending.append(cp)
        t_r = scal_ref[row]
        last_r = t_r // Bs
        for j in range(n_slide - 1):
            blk = jnp.clip(last_r - (n_slide - 1 - j), 0, max_blocks - 1)
            cp = pltpu.make_async_copy(
                kv_out.at[row, hi, pl.ds(blk * Bs, Bs), :],
                fkv_s.at[r, pl.ds((num_sel + j) * Bs, Bs), :],
                gsems.at[num_sel + j],
            )
            cp.start()
            pending.append(cp)

    # ---- per-row cache writes (aligned RMW) ------------------------------
    # Each row's position dim is 8-sublane tiled: single-row DMA slices are
    # Mosaic-illegal, so merge the new row into its aligned 8-row window.
    newv = kvnew_ref[:, 0, 0]                              # [Bt, 2d]
    d2 = newv.shape[1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (8, d2), 0)
    for r in range(Bt):
        row = bi * Bt + r
        t_r = scal_ref[row]
        base = pl.multiple_of(jnp.minimum((t_r // 8) * 8, max_blocks * Bs - 8), 8)
        rd = pltpu.make_async_copy(
            kv_out.at[row, hi, pl.ds(base, 8), :], win_s.at[r], wsem)
        rd.start()
        rd.wait()
        win_s[r] = jnp.where(ri == t_r - base, newv[r:r + 1, :], win_s[r])
        wr = pltpu.make_async_copy(
            win_s.at[r], kv_out.at[row, hi, pl.ds(base, 8), :], wsem)
        wr.start()
        wr.wait()

    # diagonal blocks: contain the rows the RMW above already committed
    for r in range(Bt):
        row = bi * Bt + r
        diag = jnp.clip(scal_ref[row] // Bs, 0, max_blocks - 1)
        cp = pltpu.make_async_copy(
            kv_out.at[row, hi, pl.ds(diag * Bs, Bs), :],
            fkv_s.at[r, pl.ds((n_slots - 1) * Bs, Bs), :],
            gsems.at[n_slots - 1],
        )
        cp.start()
        pending.append(cp)
    for cp in pending:
        cp.wait()

    combined = _attend_math(
        tvec_ref[:, 0], rq_ref, fkv_s[:, :, :], msk_ref, cout_ref,
        gates_ref, scale=scale, sel_block=sel_block, window=window,
        num_sel=num_sel, n_slide=n_slide,
    )

    # contract over (g, d) without a lane-crossing reshape or a batched
    # matmul (Mosaic wants batch dims co-located): park combined in VMEM
    # and accumulate g plain 2-D matmuls via ref-collapse slices
    comb_s[...] = combined.astype(comb_s.dtype)
    part = None
    for gi in range(g):
        pg = jax.lax.dot_general(
            comb_s[:, gi, :], wout_ref[0, gi],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [Bt, dim]
        part = pg if part is None else part + pg

    @pl.when(hi == 0)
    def _init():
        out_ref[:, 0] = resid_ref[:, 0].astype(jnp.float32) + part

    @pl.when(hi != 0)
    def _acc():
        out_ref[:, 0] = out_ref[:, 0] + part

    if with_ff:
        @pl.when(jnp.logical_and(bi == 0, hi == pl.num_programs(1) - 1))
        def _wait_ff():
            pltpu.make_async_copy(ffw1_hbm, ffw1_s, fsems.at[0]).wait()
            pltpu.make_async_copy(ffw2_hbm, ffw2_s, fsems.at[1]).wait()

        @pl.when(hi == pl.num_programs(1) - 1)
        def _ff():
            out_ref[:, 0] = _ff_tail(
                out_ref[:, 0], resid_ref.dtype, ffnorm_ref[0], ffb1_ref[0],
                ffb2_ref[0], ffw1_s, ffw2_s, eps=eps,
            )


@functools.partial(
    jax.jit,
    static_argnames=("sel_block", "window", "num_sel", "n_slide", "scale",
                     "batch_tile", "interpret", "eps"),
)
def decode_attend_fused_ragged(
    rq: jnp.ndarray,         # [b, kvh, g, d]
    kv: jnp.ndarray,         # [b, kvh, max_len, 2d] (donated)
    kv_new: jnp.ndarray,     # [b, kvh, 1, 2d]
    info: jnp.ndarray,       # [b, kvh*INFO_WIDTH]
    c_out: jnp.ndarray,      # [b, kvh, g, d]
    gates: jnp.ndarray,      # [b, kvh, g, 3]
    x: jnp.ndarray,          # [b, 1, dim]
    w_out: jnp.ndarray,      # [dim_inner, dim]
    t: jnp.ndarray,          # [b] int32 per-row positions
    ff: tuple = (),          # optional (norm_scale, w1, b1, w2, b2)
    *, sel_block: int, window: int, num_sel: int, n_slide: int, scale: float,
    batch_tile: int = 8, interpret: bool | None = None, eps: float = 1e-6,
):
    """Ragged decode_attend_fused: -> (layer output, new kv cache).

    With ``ff`` the feed-forward block runs in-kernel on the last
    head-grid step (see decode_attend_fused)."""
    b, kvh, g, d = rq.shape
    dim = x.shape[-1]
    n_slots = num_sel + n_slide
    J = n_slots * sel_block
    interpret = resolve_interpret(interpret)
    Bt = _pick_batch_tile(b, batch_tile)
    with_ff = bool(ff)

    tarr = t.astype(jnp.int32)
    idx = info.reshape(b, kvh, INFO_WIDTH)[:, :, :n_slots].astype(jnp.int32)
    tn = jnp.stack([tarr, tarr], axis=1)                   # [b, 2] VMEM view
    gates_bc = gates.astype(rq.dtype)                      # [b, kvh, g, 3]
    wout3 = w_out.reshape(kvh, g, d, dim)

    in_specs = [
        pl.BlockSpec((Bt, 1, g, d), lambda bi, hi, s, i: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 2), lambda bi, hi, s, i: (bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 1, 1, 2 * d), lambda bi, hi, s, i: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, INFO_WIDTH), lambda bi, hi, s, i: (bi, hi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 1, g, d), lambda bi, hi, s, i: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 1, g, 3), lambda bi, hi, s, i: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 1, dim), lambda bi, hi, s, i: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, g, d, dim), lambda bi, hi, s, i: (hi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [tarr, idx, rq, tn, kv_new, info, c_out, gates_bc, x, wout3]
    scratch = [
        pltpu.VMEM((Bt, J, 2 * d), kv.dtype),
        pltpu.VMEM((Bt, 8, 2 * d), kv.dtype),
        pltpu.VMEM((Bt, g, d), kv.dtype),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((n_slots,)),
    ]
    if with_ff:
        fnorm, fw1, fb1, fw2, fb2 = ff
        hid4 = fw1.shape[1]
        wdt = x.dtype
        in_specs += [
            pl.BlockSpec((1, dim), lambda bi, hi, s, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid4), lambda bi, hi, s, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda bi, hi, s, i: (0, 0),
                         memory_space=pltpu.VMEM),
            _hbm_spec(interpret),
            _hbm_spec(interpret),
        ]
        operands += [fnorm[None], fb1[None], fb2[None],
                     fw1.astype(wdt), fw2.astype(wdt)]
        scratch += [
            pltpu.VMEM((dim, hid4), wdt),
            pltpu.VMEM((hid4, dim), wdt),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    in_specs.append(_hbm_spec(interpret))
    operands.append(kv)
    kv_idx = len(operands) - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // Bt, kvh),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((Bt, 1, dim), lambda bi, hi, s, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            _hbm_spec(interpret),
        ),
        scratch_shapes=scratch,
    )
    out, new_kv = pl.pallas_call(
        functools.partial(
            _attend_fused_ragged_kernel, scale=scale, sel_block=sel_block,
            window=window, num_sel=num_sel, n_slide=n_slide,
            with_ff=with_ff, eps=eps,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, dim), jnp.float32),
            jax.ShapeDtypeStruct(kv.shape, kv.dtype),
        ),
        # operand numbering includes the two scalar-prefetch args
        input_output_aliases={kv_idx: 1},
        interpret=interpret,
    )(*operands)
    return out.astype(x.dtype), new_kv


# ---------------------------------------------------------------------------
# Paged variant: the serving engine's block-pool KV allocator (vLLM-style
# paged attention, TPU-native).  The kv cache is a SHARED physical page pool
# [P, kvh, PAGE, 2d] instead of per-slot dense [b, kvh, max_len, 2d]; a
# host-managed page table [b, max_pages] (scalar-prefetched) maps each
# slot's logical page to a physical page.  HBM *capacity* then scales with
# live tokens instead of max_batch x max_len — the reference models this
# KV saving analytically for bandwidth only (reference:
# evaluation/efficiency.py:349-361); here it is real for footprint too.
# Every kv access in the ragged kernel is already per-block DMA, so paging
# is one extra SMEM indirection per gather; all attention math is
# unchanged (logical positions).
# ---------------------------------------------------------------------------


def _attend_fused_paged_kernel(
    scal_ref,       # SMEM [b]: per-row t
    idx_ref,        # SMEM [b, kvh, n_slots]
    pt_ref,         # SMEM [b, max_pages]: logical page -> physical page
    rq_ref,         # [Bt, 1, g, d]
    tvec_ref,       # [Bt, 2] int32 VMEM (col 0 = t)
    kvnew_ref,      # [Bt, 1, 1, 2d]
    msk_ref,        # [Bt, INFO_WIDTH]
    cout_ref,       # [Bt, 1, g, d]
    gates_ref,      # [Bt, 1, g, 3] raw branch gates (broadcast in-kernel)
    resid_ref,      # [Bt, 1, dim]
    wout_ref,       # [1, g, d, dim]
    *rest,          # (+ optional FF operands; see _attend_fused_kernel)
    scale, sel_block, window, num_sel, n_slide, with_ff, eps,
):
    if with_ff:
        (ffnorm_ref, ffb1_ref, ffb2_ref, ffw1_hbm, ffw2_hbm, kv_hbm,
         out_ref, kv_out, fkv_s, win_s, comb_s, wsem, gsems, ffw1_s,
         ffw2_s, fsems) = rest
    else:
        (kv_hbm, out_ref, kv_out, fkv_s, win_s, comb_s, wsem, gsems) = rest
    bi = pl.program_id(0)
    hi = pl.program_id(1)

    if with_ff:
        @pl.when(jnp.logical_and(bi == 0, hi == 0))
        def _load_ff():
            pltpu.make_async_copy(ffw1_hbm, ffw1_s, fsems.at[0]).start()
            pltpu.make_async_copy(ffw2_hbm, ffw2_s, fsems.at[1]).start()
    Bt, _, g, d = rq_ref.shape
    Bs = sel_block
    n_slots = num_sel + n_slide
    PAGE = kv_hbm.shape[2]                  # tokens per physical page
    bpp = PAGE // Bs                        # selection blocks per page
    max_pages = pt_ref.shape[1]
    max_blocks = max_pages * bpp

    def _blk_window(row, blk):
        """Physical (page, in-page offset) of logical selection block
        ``blk``.  Unmapped logical pages resolve to the trash page (the
        host fills page-table holes with it), whose garbage rows are
        masked out of both softmaxes downstream."""
        blk = jnp.minimum(blk, max_blocks - 1)
        pg = pt_ref[row, blk // bpp]
        off = pl.multiple_of((blk % bpp) * Bs, Bs)
        return pg, off

    # ---- start all non-diagonal gathers, then the per-row RMWs -----------
    # (same DMA ordering as the dense ragged kernel: selected blocks never
    # include the diagonal, trailing blocks sit strictly below it)
    pending = []
    for r in range(Bt):
        row = bi * Bt + r
        for s in range(num_sel):
            pg, off = _blk_window(row, idx_ref[row, hi, s])
            cp = pltpu.make_async_copy(
                kv_out.at[pg, hi, pl.ds(off, Bs), :],
                fkv_s.at[r, pl.ds(s * Bs, Bs), :],
                gsems.at[s],
            )
            cp.start()
            pending.append(cp)
        t_r = scal_ref[row]
        last_r = t_r // Bs
        for j in range(n_slide - 1):
            blk = jnp.clip(last_r - (n_slide - 1 - j), 0, max_blocks - 1)
            pg, off = _blk_window(row, blk)
            cp = pltpu.make_async_copy(
                kv_out.at[pg, hi, pl.ds(off, Bs), :],
                fkv_s.at[r, pl.ds((num_sel + j) * Bs, Bs), :],
                gsems.at[num_sel + j],
            )
            cp.start()
            pending.append(cp)

    # ---- per-row cache writes (aligned RMW into the diagonal page) -------
    # The in-page row dim is 8-sublane tiled; PAGE % 8 == 0 keeps every
    # window inside one page, so no cross-page case exists.  Inactive
    # slots (t = 0, page-table hole) RMW the trash page — garbage in,
    # garbage out, never read by an active slot.
    newv = kvnew_ref[:, 0, 0]                              # [Bt, 2d]
    d2 = newv.shape[1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (8, d2), 0)
    for r in range(Bt):
        row = bi * Bt + r
        t_r = scal_ref[row]
        pg_w = pt_ref[row, t_r // PAGE]
        inpage = t_r % PAGE
        base = pl.multiple_of((inpage // 8) * 8, 8)
        rd = pltpu.make_async_copy(
            kv_out.at[pg_w, hi, pl.ds(base, 8), :], win_s.at[r], wsem)
        rd.start()
        rd.wait()
        win_s[r] = jnp.where(ri == inpage - base, newv[r:r + 1, :], win_s[r])
        wr = pltpu.make_async_copy(
            win_s.at[r], kv_out.at[pg_w, hi, pl.ds(base, 8), :], wsem)
        wr.start()
        wr.wait()

    # diagonal blocks: contain the rows the RMW above already committed
    for r in range(Bt):
        row = bi * Bt + r
        blk = jnp.clip(scal_ref[row] // Bs, 0, max_blocks - 1)
        pg, off = _blk_window(row, blk)
        cp = pltpu.make_async_copy(
            kv_out.at[pg, hi, pl.ds(off, Bs), :],
            fkv_s.at[r, pl.ds((n_slots - 1) * Bs, Bs), :],
            gsems.at[n_slots - 1],
        )
        cp.start()
        pending.append(cp)
    for cp in pending:
        cp.wait()

    combined = _attend_math(
        tvec_ref[:, 0], rq_ref, fkv_s[:, :, :], msk_ref, cout_ref,
        gates_ref, scale=scale, sel_block=sel_block, window=window,
        num_sel=num_sel, n_slide=n_slide,
    )

    comb_s[...] = combined.astype(comb_s.dtype)
    part = None
    for gi in range(g):
        pg = jax.lax.dot_general(
            comb_s[:, gi, :], wout_ref[0, gi],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [Bt, dim]
        part = pg if part is None else part + pg

    @pl.when(hi == 0)
    def _init():
        out_ref[:, 0] = resid_ref[:, 0].astype(jnp.float32) + part

    @pl.when(hi != 0)
    def _acc():
        out_ref[:, 0] = out_ref[:, 0] + part

    if with_ff:
        @pl.when(jnp.logical_and(bi == 0, hi == pl.num_programs(1) - 1))
        def _wait_ff():
            pltpu.make_async_copy(ffw1_hbm, ffw1_s, fsems.at[0]).wait()
            pltpu.make_async_copy(ffw2_hbm, ffw2_s, fsems.at[1]).wait()

        @pl.when(hi == pl.num_programs(1) - 1)
        def _ff():
            out_ref[:, 0] = _ff_tail(
                out_ref[:, 0], resid_ref.dtype, ffnorm_ref[0], ffb1_ref[0],
                ffb2_ref[0], ffw1_s, ffw2_s, eps=eps,
            )


@functools.partial(
    jax.jit,
    static_argnames=("sel_block", "window", "num_sel", "n_slide", "scale",
                     "batch_tile", "interpret", "eps"),
)
def decode_attend_fused_paged(
    rq: jnp.ndarray,          # [b, kvh, g, d]
    kv_pool: jnp.ndarray,     # [P, kvh, PAGE, 2d] physical page pool (donated)
    page_table: jnp.ndarray,  # [b, max_pages] int32 logical -> physical
    kv_new: jnp.ndarray,      # [b, kvh, 1, 2d]
    info: jnp.ndarray,        # [b, kvh*INFO_WIDTH]
    c_out: jnp.ndarray,       # [b, kvh, g, d]
    gates: jnp.ndarray,       # [b, kvh, g, 3]
    x: jnp.ndarray,           # [b, 1, dim]
    w_out: jnp.ndarray,       # [dim_inner, dim]
    t: jnp.ndarray,           # [b] int32 per-row positions
    ff: tuple = (),           # optional (norm_scale, w1, b1, w2, b2)
    *, sel_block: int, window: int, num_sel: int, n_slide: int, scale: float,
    batch_tile: int = 8, interpret: bool | None = None, eps: float = 1e-6,
):
    """Paged decode_attend_fused_ragged: -> (layer output, new kv pool).

    The kv cache is a shared physical page pool; ``page_table`` maps each
    slot's logical page (PAGE = kv_pool.shape[2] tokens) to a physical
    page.  Semantically identical to the dense ragged kernel under any
    valid table (tests/test_serve.py pins engine-level token equality)."""
    b, kvh, g, d = rq.shape
    dim = x.shape[-1]
    n_slots = num_sel + n_slide
    J = n_slots * sel_block
    PAGE = kv_pool.shape[2]
    assert PAGE % sel_block == 0 and PAGE % 8 == 0
    interpret = resolve_interpret(interpret)
    Bt = _pick_batch_tile(b, batch_tile)
    with_ff = bool(ff)

    tarr = t.astype(jnp.int32)
    idx = info.reshape(b, kvh, INFO_WIDTH)[:, :, :n_slots].astype(jnp.int32)
    pt = page_table.astype(jnp.int32)
    tn = jnp.stack([tarr, tarr], axis=1)                   # [b, 2] VMEM view
    gates_bc = gates.astype(rq.dtype)                      # [b, kvh, g, 3]
    wout3 = w_out.reshape(kvh, g, d, dim)

    in_specs = [
        pl.BlockSpec((Bt, 1, g, d), lambda bi, hi, s, i, p: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 2), lambda bi, hi, s, i, p: (bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 1, 1, 2 * d), lambda bi, hi, s, i, p: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, INFO_WIDTH), lambda bi, hi, s, i, p: (bi, hi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 1, g, d), lambda bi, hi, s, i, p: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 1, g, 3), lambda bi, hi, s, i, p: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 1, dim), lambda bi, hi, s, i, p: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, g, d, dim), lambda bi, hi, s, i, p: (hi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [tarr, idx, pt, rq, tn, kv_new, info, c_out, gates_bc, x,
                wout3]
    scratch = [
        pltpu.VMEM((Bt, J, 2 * d), kv_pool.dtype),
        pltpu.VMEM((Bt, 8, 2 * d), kv_pool.dtype),
        pltpu.VMEM((Bt, g, d), kv_pool.dtype),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((n_slots,)),
    ]
    if with_ff:
        fnorm, fw1, fb1, fw2, fb2 = ff
        hid4 = fw1.shape[1]
        wdt = x.dtype
        in_specs += [
            pl.BlockSpec((1, dim), lambda bi, hi, s, i, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid4), lambda bi, hi, s, i, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda bi, hi, s, i, p: (0, 0),
                         memory_space=pltpu.VMEM),
            _hbm_spec(interpret),
            _hbm_spec(interpret),
        ]
        operands += [fnorm[None], fb1[None], fb2[None],
                     fw1.astype(wdt), fw2.astype(wdt)]
        scratch += [
            pltpu.VMEM((dim, hid4), wdt),
            pltpu.VMEM((hid4, dim), wdt),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    in_specs.append(_hbm_spec(interpret))
    operands.append(kv_pool)
    kv_idx = len(operands) - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b // Bt, kvh),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((Bt, 1, dim), lambda bi, hi, s, i, p: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            _hbm_spec(interpret),
        ),
        scratch_shapes=scratch,
    )
    out, new_pool = pl.pallas_call(
        functools.partial(
            _attend_fused_paged_kernel, scale=scale, sel_block=sel_block,
            window=window, num_sel=num_sel, n_slide=n_slide,
            with_ff=with_ff, eps=eps,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, dim), jnp.float32),
            jax.ShapeDtypeStruct(kv_pool.shape, kv_pool.dtype),
        ),
        # operand numbering includes the three scalar-prefetch args
        input_output_aliases={kv_idx: 1},
        interpret=interpret,
    )(*operands)
    return out.astype(x.dtype), new_pool
