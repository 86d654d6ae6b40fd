"""The Native Sparse Attention layer: three branches + learned gate.

TPU-native reimplementation of the reference ``SparseAttention``
(reference: native_sparse_attention.py:188-867):

* branch 1 — compressed attention over learned window compressions of K/V
  (+ one learned "mem" compressed-KV slot), whose pre-softmax logits double
  as block-importance scores;
* branch 2 — fine attention over the top-k selected KV blocks plus the
  block-causal diagonal, with optional straight-through differentiable
  top-k gates;
* branch 3 — sliding-window attention;
* a learned sigmoid gate combines the three branch outputs per head.

Key invariants preserved from the reference:
  - compression inputs (K/V fed to the compressors and kept in the running
    buffer) are NEVER rotary-rotated (reference:
    native_sparse_attention.py:377-385, arXiv 2501.18795);
  - the compressed branch queries are also unrotated; rotary applies only
    to the fine and sliding branches (reference: :643);
  - gate bias initialized to [-2, -2, 2] so the network starts by trusting
    the sliding window (reference: :318-321).

Deliberate deviation: decode applies the same block-diagonal masking of
importance scores as prefill; the reference's decode path omits it
(native_sparse_attention.py:444-476), letting a just-completed diagonal
block be double-counted (selected AND included as the block-causal tail).
Using the prefill semantics in both paths makes them exactly equivalent,
which our tests assert (the reference has no such test, SURVEY.md section 4).

The decode path is a single static-shape step over a structured cache
(``NSADecodeCache``), designed to be jitted whole: no per-token Python, no
dynamic shapes, O(window + k*block + seq/stride) memory traffic per token
instead of O(seq).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .attention import (
    attend,
    blockify_kv,
    fine_attend_core,
    gather_blocks,
    sliding_window_attention,
)
from .common import (
    mask_value,
    merge_heads,
    repeat_kv,
    rms_norm,
    round_down_mult,
    round_up_mult,
    split_heads,
)
from .compress import apply_compressor, init_compressor, split_compress_windows
from .rotary import rotate_at_offset, rotate_qk
from .selection import fine_block_scores, group_importance, select_blocks


class NSADecodeCache(NamedTuple):
    """Per-layer structured sparse KV cache (static shapes).

    Mirrors the reference cache pytree ``((k_rot, v), ((ck, cv),
    (run_k, run_v)))`` (reference: native_sparse_attention.py:346-354) with
    fixed-capacity buffers; the live lengths are derived from the model-level
    ``seq_len`` scalar:

      num_cblocks = seq_len // stride
      run_fill    = overlap + seq_len - num_cblocks * stride
    """

    k: jnp.ndarray       # [b, kvh, max_len, d]   rotary-rotated keys
    v: jnp.ndarray       # [b, kvh, max_len, d]
    ck: jnp.ndarray      # [b, kvh, max_cblocks, d] compressed keys (no mem)
    cv: jnp.ndarray      # [b, kvh, max_cblocks, d]
    run_k: jnp.ndarray   # [b, kvh, compress_block_size, d] unrotated
    run_v: jnp.ndarray   # [b, kvh, compress_block_size, d]


def init_sparse_attention(key: jax.Array, cfg: ModelConfig) -> dict:
    """Initialize one SparseAttention layer's parameters."""
    nsa = cfg.nsa
    d, h, kvh = cfg.dim_head, cfg.heads, cfg.kv_heads
    ks = jax.random.split(key, 6)

    def linear(k_, fan_in, shape):
        bound = 1.0 / (fan_in ** 0.5)
        return jax.random.uniform(k_, shape, jnp.float32, -bound, bound)

    kq, kk, kv_ = jax.random.split(ks[0], 3)
    params = {
        "norm_scale": jnp.ones((cfg.dim,), jnp.float32),
        # separate projections (vs the reference's fused to_qkv,
        # native_sparse_attention.py:244) so each can be column-sharded over
        # the heads mesh axis; XLA fuses the three matmuls regardless
        "w_q": linear(kq, cfg.dim, (cfg.dim, cfg.dim_inner)),
        "w_k": linear(kk, cfg.dim, (cfg.dim, cfg.dim_kv_inner)),
        "w_v": linear(kv_, cfg.dim, (cfg.dim, cfg.dim_kv_inner)),
        "mem_kv": jnp.zeros((2, kvh, nsa.num_compressed_mem_kv, d), jnp.float32),
        "k_pos": jnp.zeros((kvh, nsa.compress_block_size, d), jnp.float32),
        "v_pos": jnp.zeros((kvh, nsa.compress_block_size, d), jnp.float32),
        "k_compress": init_compressor(ks[1], nsa, kvh, d),
        "v_compress": init_compressor(ks[2], nsa, kvh, d),
        # gate: zero weight, bias favors the sliding branch at init
        "gate_w": jnp.zeros((cfg.dim, 3 * h), jnp.float32),
        "gate_b": jnp.tile(jnp.array([-2.0, -2.0, 2.0], jnp.float32), h),
        "w_out": linear(ks[3], cfg.dim_inner, (cfg.dim_inner, cfg.dim)),
    }
    return params


def _compress_kv(params, cfg: ModelConfig, k_windows, v_windows):
    """Apply intra-block positions then the K/V compressors."""
    nsa = cfg.nsa
    kin = k_windows + params["k_pos"].astype(k_windows.dtype)[None, :, None]
    vin = v_windows + params["v_pos"].astype(v_windows.dtype)[None, :, None]
    ck = apply_compressor(params["k_compress"], nsa.compressor, kin)
    cv = apply_compressor(params["v_compress"], nsa.compressor, vin)
    return ck, cv


def _sel_leaves(res):
    """(c_out, Selection) -> flat leaves for lax.map stacking."""
    c_out, sel = res
    gates = sel.gates if sel.gates is not None else jnp.zeros_like(sel.scores)
    return c_out, sel.indices, sel.mask, gates


def _gate_combine(params, cfg: ModelConfig, normed_inp, branch_outs):
    """Sigmoid gate over the three strategies (reference: :313-327,852-856)."""
    b, n, _ = normed_inp.shape
    gates = jax.nn.sigmoid(
        normed_inp @ params["gate_w"].astype(normed_inp.dtype)
        + params["gate_b"].astype(normed_inp.dtype)
    )
    gates = gates.reshape(b, n, cfg.heads, 3).transpose(0, 2, 1, 3)  # [b,h,n,3]
    stacked = jnp.stack(branch_outs, axis=-1)                        # [b,h,n,d,3]
    return jnp.einsum("bhns,bhnds->bhnd", gates.astype(stacked.dtype), stacked)


def sparse_attention_forward(
    params,
    cfg: ModelConfig,
    x: jnp.ndarray,
    *,
    impl: Optional[str] = None,
    return_cache_max_len: Optional[int] = None,
):
    """Training / prefill forward. x: [b, n, dim].

    Returns out [b, n, dim], or (out, NSADecodeCache) when
    ``return_cache_max_len`` is given (prefill).
    """
    nsa = cfg.nsa
    impl = impl or cfg.attn_impl
    b, n, _ = x.shape
    d, h, kvh = cfg.dim_head, cfg.heads, cfg.kv_heads
    g = cfg.num_grouped_queries
    scale = d ** -0.5
    stride = nsa.compress_block_sliding_stride
    num_mem = nsa.num_compressed_mem_kv

    compress_divisible = round_down_mult(n, stride)
    num_cblocks = compress_divisible // stride

    normed = rms_norm(x, params["norm_scale"], cfg.norm_eps)
    q = split_heads(normed @ params["w_q"].astype(normed.dtype), d)  # [b, h, n, d]
    k = split_heads(normed @ params["w_k"].astype(normed.dtype), d)  # [b, kvh, n, d]
    v = split_heads(normed @ params["w_v"].astype(normed.dtype), d)

    # ---- branch 1: compressed attention (queries/keys UNROTATED) --------
    if num_cblocks > 0:
        kw = split_compress_windows(k[:, :, :compress_divisible], nsa.compress_block_size, stride)
        vw = split_compress_windows(v[:, :, :compress_divisible], nsa.compress_block_size, stride)
        ck, cv = _compress_kv(params, cfg, kw, vw)
    else:
        ck = jnp.zeros((b, kvh, 0, d), k.dtype)
        cv = jnp.zeros((b, kvh, 0, d), v.dtype)

    mem_k = jnp.broadcast_to(
        params["mem_kv"][0].astype(k.dtype), (b, kvh, num_mem, d)
    )
    mem_v = jnp.broadcast_to(
        params["mem_kv"][1].astype(v.dtype), (b, kvh, num_mem, d)
    )
    ck_full = jnp.concatenate([mem_k, ck], axis=2)
    cv_full = jnp.concatenate([mem_v, cv], axis=2)

    ck_ends = (jnp.arange(num_cblocks) + 1) * stride - 1
    ck_ends = jnp.concatenate(
        [jnp.full((num_mem,), -1, ck_ends.dtype), ck_ends]
    )

    # ---- rotary for branches 2 and 3 ------------------------------------
    rq, rk = rotate_qk(q, k, cfg.rope_theta)

    # ---- branches 1 + 2 over query chunks --------------------------------
    # Compressed attention, block selection, and fine attention are all
    # row-local given the (cheap, full-sequence) compressed K/V, so they are
    # evaluated per query chunk under lax.map + remat: peak memory is
    # O(chunk * (num_cblocks + k*block)) instead of O(n * ...), which is
    # what makes seq-4096 prefill/training fit on a chip.  The flat
    # 'reference' path (single chunk) is the oracle the chunked path and
    # the Pallas kernels are tested against.
    Hs = kvh if nsa.query_heads_share_selected_kv else h
    kb, vb = blockify_kv(rk, v, nsa.selection_block_size, Hs)

    def compressed_and_select(q_chunk, positions):
        """Branch 1 output + fine-block selection for one query chunk."""
        cmask = None
        if cfg.causal:
            cmask = ck_ends[None, :] < positions[:, None]     # [m, mem+w]
        c_out, csim = attend(
            q_chunk, ck_full, cv_full, mask=cmask, scale=scale, return_sim=True
        )
        importance = group_importance(
            csim, num_mem, g, nsa.query_heads_share_selected_kv
        )
        norm_scores = fine_block_scores(
            importance, positions, nsa.selection_block_size, stride
        )
        sel = select_blocks(norm_scores, nsa.num_selected_blocks, nsa.use_diff_topk)
        return c_out, sel

    def branches_12(q_chunk, rq_chunk, positions):
        c_out, sel = compressed_and_select(q_chunk, positions)
        f_out = fine_attend_core(
            rq_chunk, kb, vb, sel.indices, sel.mask, sel.gates,
            positions, cfg.causal, scale,
        )
        return c_out, f_out

    # The fused Pallas kernel computes fine+sliding in one pass; it covers
    # the shared-selection causal regime with a masked diagonal (the
    # default config). Anything else falls back to the XLA paths.
    S = min(
        nsa.num_selected_blocks,
        max(num_cblocks // nsa.num_compress_per_fine, 0),
    )
    use_fused_kernel = (
        impl == "pallas"
        and cfg.causal
        and nsa.query_heads_share_selected_kv
        and nsa.num_compress_per_fine > 1
        and S > 0
    )

    chunk = cfg.attn_chunk_size
    Nc = round_up_mult(n, chunk)
    C = Nc // chunk

    def to_chunks(t, last):
        pad = [(0, 0)] * t.ndim
        pad[2] = (0, Nc - n)
        t = jnp.pad(t, pad)
        return jnp.moveaxis(t.reshape(*t.shape[:2], C, chunk, last), 2, 0)

    def from_chunks(t, last):
        H = t.shape[2]
        return jnp.moveaxis(t, 0, 2).reshape(b, H, Nc, last)[:, :, :n]

    pos_c = jnp.arange(Nc).reshape(C, chunk)

    if use_fused_kernel:
        from .pallas.nsa_prefill import nsa_fine_sliding_attention

        if n > chunk:
            couts, idxs, msks, gts = jax.lax.map(
                jax.checkpoint(
                    lambda args: _sel_leaves(compressed_and_select(*args))
                ),
                (to_chunks(q, d), pos_c),
            )
            compressed_out = from_chunks(couts, d)
            sel_idx = from_chunks(idxs, S)
            sel_mask = from_chunks(msks, S)
            gates = from_chunks(gts, S) if nsa.use_diff_topk else None
        else:
            compressed_out, sel = compressed_and_select(q, jnp.arange(n))
            sel_idx, sel_mask, gates = sel.indices, sel.mask, sel.gates

        fine_out, sliding_out = nsa_fine_sliding_attention(
            rq, rk, v, sel_idx, sel_mask, gates,
            nsa.selection_block_size, nsa.sliding_window_size, scale,
        )
    else:
        if impl != "reference" and n > chunk:
            couts, fouts = jax.lax.map(
                jax.checkpoint(lambda args: branches_12(*args)),
                (to_chunks(q, d), to_chunks(rq, d), pos_c),
            )
            compressed_out = from_chunks(couts, d)
            fine_out = from_chunks(fouts, d)
        else:
            compressed_out, fine_out = branches_12(q, rq, jnp.arange(n))
        sliding_out = None

    # ---- branch 3: sliding window (unless fused into the kernel) ---------
    if sliding_out is None:
        sliding_out = sliding_window_attention(
            rq, rk, v, nsa.sliding_window_size, causal=cfg.causal, scale=scale
        )

    # ---- gate combine + output projection --------------------------------
    out = _gate_combine(params, cfg, normed, [compressed_out, fine_out, sliding_out])
    out = merge_heads(out) @ params["w_out"].astype(x.dtype)

    if return_cache_max_len is None:
        return out

    # ---- build the decode cache (prefill) --------------------------------
    max_len = return_cache_max_len
    assert max_len >= n and max_len % stride == 0
    max_cb = max_len // stride
    overlap = nsa.compress_overlap_len
    Bc = nsa.compress_block_size

    def pad_to(t, size, axis=2):
        pad = [(0, 0)] * t.ndim
        pad[axis] = (0, size - t.shape[axis])
        return jnp.pad(t, pad)

    # running (unrotated) buffer: original positions [cd - overlap, n),
    # left zero padding when cd < overlap (reference: :605-610)
    run_fill = n - compress_divisible + overlap
    k_padded = jnp.pad(k, ((0, 0), (0, 0), (overlap, 0), (0, 0)))
    v_padded = jnp.pad(v, ((0, 0), (0, 0), (overlap, 0), (0, 0)))
    run_k = k_padded[:, :, compress_divisible:compress_divisible + run_fill]
    run_v = v_padded[:, :, compress_divisible:compress_divisible + run_fill]

    cache = NSADecodeCache(
        k=pad_to(rk, max_len),
        v=pad_to(v, max_len),
        ck=pad_to(ck, max_cb),
        cv=pad_to(cv, max_cb),
        run_k=pad_to(run_k, Bc),
        run_v=pad_to(run_v, Bc),
    )
    return out, cache


def init_decode_cache(
    cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.float32
) -> NSADecodeCache:
    """Empty per-layer cache for decode-from-scratch."""
    nsa = cfg.nsa
    d, kvh = cfg.dim_head, cfg.kv_heads
    assert max_len % nsa.compress_block_sliding_stride == 0
    max_cb = max_len // nsa.compress_block_sliding_stride
    z = lambda s: jnp.zeros((batch, kvh, s, d), dtype)
    return NSADecodeCache(
        k=z(max_len), v=z(max_len), ck=z(max_cb), cv=z(max_cb),
        run_k=z(nsa.compress_block_size), run_v=z(nsa.compress_block_size),
    )


def sparse_attention_decode(
    params,
    cfg: ModelConfig,
    x: jnp.ndarray,
    cache: NSADecodeCache,
    seq_len: jnp.ndarray,
) -> Tuple[jnp.ndarray, NSADecodeCache]:
    """One decode step. x: [b, 1, dim]; seq_len: scalar tokens already cached.

    Static-shape equivalent of the reference ``forward_inference``
    (reference: native_sparse_attention.py:338-547), minus its divergences
    from the prefill path (see module docstring).
    """
    nsa = cfg.nsa
    b = x.shape[0]
    d, h, kvh = cfg.dim_head, cfg.heads, cfg.kv_heads
    g = cfg.num_grouped_queries
    scale = d ** -0.5
    stride = nsa.compress_block_sliding_stride
    Bc = nsa.compress_block_size
    Bs = nsa.selection_block_size
    overlap = nsa.compress_overlap_len
    num_mem = nsa.num_compressed_mem_kv
    window = nsa.sliding_window_size
    max_len = cache.k.shape[2]
    max_cb = cache.ck.shape[2]
    max_fine = max_cb // nsa.num_compress_per_fine if nsa.num_compress_per_fine else 0

    t = seq_len                                   # current query position
    num_cb = t // stride                          # compressed blocks cached
    run_fill = overlap + t - num_cb * stride      # live entries in run buffer

    # profiling-only ablation hooks (scripts/profile_decode.py); read at
    # trace time, never set in production
    ablate = os.environ.get("NSA_ABLATE", "")
    skip_fine = ablate in ("no_fine", "attn_only")
    skip_compressed = ablate in ("no_compressed", "attn_only")
    skip_emit = ablate in ("no_emit", "attn_only")

    normed = rms_norm(x, params["norm_scale"], cfg.norm_eps)
    q = split_heads(normed @ params["w_q"].astype(normed.dtype), d)[:, :, 0]
    k_new = split_heads(normed @ params["w_k"].astype(normed.dtype), d)[:, :, 0]
    v_new = split_heads(normed @ params["w_v"].astype(normed.dtype), d)[:, :, 0]

    # ---- update running (unrotated) compression buffer -------------------
    run_k = jax.lax.dynamic_update_slice(
        cache.run_k, k_new[:, :, None], (0, 0, run_fill, 0)
    )
    run_v = jax.lax.dynamic_update_slice(
        cache.run_v, v_new[:, :, None], (0, 0, run_fill, 0)
    )

    # Predicated (branch-free) compressed-block emission: always compress
    # the current run buffer, but only let the result land when the buffer
    # is exactly full.  A lax.cond here costs ~1.6 ms/step on TPU (it
    # blocks fusion); the unconditional compressor on a [b,kvh,1,Bc,d]
    # window is microseconds.
    if skip_emit:
        ck_cache, cv_cache = cache.ck, cache.cv
    else:
        emit = (run_fill + 1 == Bc)
        cand_ck, cand_cv = _compress_kv(
            params, cfg, run_k[:, :, None], run_v[:, :, None]
        )  # [b, kvh, 1, d]
        slot = jnp.clip(num_cb, 0, cache.ck.shape[2] - 1)
        old_ck = jax.lax.dynamic_slice(
            cache.ck, (0, 0, slot, 0), (b, kvh, 1, d)
        )
        old_cv = jax.lax.dynamic_slice(
            cache.cv, (0, 0, slot, 0), (b, kvh, 1, d)
        )
        ck_cache = jax.lax.dynamic_update_slice(
            cache.ck, jnp.where(emit, cand_ck, old_ck), (0, 0, slot, 0)
        )
        cv_cache = jax.lax.dynamic_update_slice(
            cache.cv, jnp.where(emit, cand_cv, old_cv), (0, 0, slot, 0)
        )
        # retain the (block - stride) overlap tokens on emission
        # (reference: :430-437)
        keep = (jnp.arange(Bc) < overlap)[None, None, :, None]
        kept_k = jnp.where(keep, jnp.roll(run_k, -stride, axis=2), 0.0)
        kept_v = jnp.where(keep, jnp.roll(run_v, -stride, axis=2), 0.0)
        run_k = jnp.where(emit, kept_k, run_k)
        run_v = jnp.where(emit, kept_v, run_v)

    # ---- rotate and append to the main cache ------------------------------
    rq = rotate_at_offset(q[:, :, None], t, cfg.rope_theta)[:, :, 0]
    rk_new = rotate_at_offset(k_new[:, :, None], t, cfg.rope_theta)[:, :, 0]
    k_cache = jax.lax.dynamic_update_slice(
        cache.k, rk_new[:, :, None], (0, 0, t, 0)
    )
    v_cache = jax.lax.dynamic_update_slice(
        cache.v, v_new[:, :, None], (0, 0, t, 0)
    )

    # ---- branch 1: compressed attention (unrotated q) --------------------
    mem_k = params["mem_kv"][0].astype(q.dtype)   # [kvh, mem, d]
    mem_v = params["mem_kv"][1].astype(q.dtype)
    qg = q.reshape(b, kvh, g, d)
    if skip_compressed:
        compressed_out = jnp.zeros((b, h, d), q.dtype)
        csim = jnp.zeros((b, kvh, g, num_mem + max_cb), jnp.float32)
    else:
        compressed_out, csim = _decode_compressed(
            qg, mem_k, mem_v, ck_cache, cv_cache, num_cb, num_mem, scale, b,
            kvh, g, d, h, max_cb,
        )

    # ---- branches 2 + 3: one gather serves fine AND sliding ---------------
    if skip_fine:
        fine_out = jnp.zeros((b, h, d), q.dtype)
        sliding_out = jnp.zeros((b, h, d), q.dtype)
    else:
        fine_out, sliding_out = _decode_fine_sliding(
            cfg, csim, rq, k_cache, v_cache, t, b, h, kvh, g, d,
            num_mem, scale, max_len,
        )

    # ---- gate combine + output projection ---------------------------------
    out = _gate_combine(
        params, cfg, normed,
        [compressed_out[:, :, None], fine_out[:, :, None], sliding_out[:, :, None]],
    )
    out = merge_heads(out) @ params["w_out"].astype(x.dtype)

    new_cache = NSADecodeCache(
        k=k_cache, v=v_cache, ck=ck_cache, cv=cv_cache, run_k=run_k, run_v=run_v
    )
    return out, new_cache


def _decode_compressed(qg, mem_k, mem_v, ck_cache, cv_cache, num_cb, num_mem,
                       scale, b, kvh, g, d, h, max_cb):
    csim_mem = jnp.einsum(
        "bhgd,hmd->bhgm", qg, mem_k, preferred_element_type=jnp.float32
    ) * scale
    csim_blocks = jnp.einsum(
        "bhgd,bhjd->bhgj", qg, ck_cache, preferred_element_type=jnp.float32
    ) * scale
    cb_valid = jnp.arange(max_cb) < num_cb
    csim_blocks = jnp.where(
        cb_valid[None, None, None], csim_blocks, mask_value(jnp.float32)
    )
    csim = jnp.concatenate([csim_mem, csim_blocks], axis=-1)   # [b,kvh,g,mem+maxcb]
    cattn = jax.nn.softmax(csim, axis=-1).astype(qg.dtype)
    cv_all = jnp.concatenate(
        [jnp.broadcast_to(mem_v[None], (b, kvh, num_mem, d)), cv_cache], axis=2
    )
    compressed_out = jnp.einsum("bhgj,bhjd->bhgd", cattn, cv_all)
    compressed_out = compressed_out.reshape(b, h, d)
    return compressed_out, csim


def _decode_fine_sliding(cfg, csim, rq, k_cache, v_cache, t, b, h, kvh, g,
                         d, num_mem, scale, max_len):
    """Fine + sliding branches from ONE gathered block set.

    The sliding window (last ``window + 1`` tokens) is contained in the
    trailing ``ceil(window / Bs) + 1`` selection-size blocks ending at the
    query's own block, and the block-causal diagonal IS that last trailing
    block — so a single gather of ``S + n_slide`` blocks, one q.K matmul,
    and two masked softmaxes produce both branch outputs.  This replaces a
    separate gather + dynamic_slice pair that XLA scheduled ~3x slower.
    """
    nsa = cfg.nsa
    Bs = nsa.selection_block_size
    stride = nsa.compress_block_sliding_stride
    window = nsa.sliding_window_size

    importance = group_importance(
        csim.reshape(b, h, 1, -1), num_mem, g, nsa.query_heads_share_selected_kv
    )
    norm_scores = fine_block_scores(importance, t[None], Bs, stride)
    sel = select_blocks(norm_scores, nsa.num_selected_blocks, use_diff_topk=False)
    S = sel.indices.shape[-1]
    Hs = sel.indices.shape[1]

    n_slide = -(-window // Bs) + 1
    last_blk = t // Bs
    trail = last_blk - jnp.arange(n_slide - 1, -1, -1)          # ascending
    trail_clip = jnp.clip(trail, 0, max_len // Bs - 1)

    idx_all = jnp.concatenate(
        [
            sel.indices[:, :, 0],                               # [b, Hs, S]
            jnp.broadcast_to(trail_clip[None, None], (b, Hs, n_slide)),
        ],
        axis=-1,
    )                                                           # [b,Hs,S+ns]
    n_slots = S + n_slide

    if cfg.attn_impl == "pallas" and Hs == kvh:
        from .pallas.paged_gather import paged_gather

        fk = paged_gather(k_cache, idx_all, Bs).reshape(b, Hs, n_slots, Bs, d)
        fv = paged_gather(v_cache, idx_all, Bs).reshape(b, Hs, n_slots, Bs, d)
    else:
        kb = k_cache.reshape(b, kvh, max_len // Bs, Bs, d)
        vb = v_cache.reshape(b, kvh, max_len // Bs, Bs, d)
        if Hs != kvh:
            kb = repeat_kv(kb.reshape(b, kvh, -1, d), Hs // kvh).reshape(
                b, Hs, -1, Bs, d
            )
            vb = repeat_kv(vb.reshape(b, kvh, -1, d), Hs // kvh).reshape(
                b, Hs, -1, Bs, d
            )
        fk = gather_blocks(kb, idx_all[:, :, None])[:, :, 0]
        fv = gather_blocks(vb, idx_all[:, :, None])[:, :, 0]

    col = jnp.arange(Bs)
    # global positions of the trailing columns (from UNCLIPPED block ids)
    j_trail = trail[:, None] * Bs + col[None, :]                # [ns, Bs]
    trail_ok = (trail >= 0)[:, None]

    # fine mask: selected slots (score-gated), plus causal cols of the
    # diagonal (= last trailing) slot
    fine_sel = jnp.broadcast_to(sel.mask[:, :, 0, :, None], (b, Hs, S, Bs))
    fine_trail = jnp.zeros((n_slide, Bs), bool).at[-1].set(True)
    fine_trail = fine_trail[None, None] & (j_trail <= t)[None, None] & trail_ok[None, None]
    fine_mask = jnp.concatenate(
        [fine_sel, jnp.broadcast_to(fine_trail, (b, Hs, n_slide, Bs))], axis=2
    ).reshape(b, Hs, 1, n_slots * Bs)

    # sliding mask: the exact band over the trailing slots
    slide_trail = (j_trail >= t - window) & (j_trail <= t) & trail_ok
    slide_mask = jnp.concatenate(
        [
            jnp.zeros((b, Hs, S, Bs), bool),
            jnp.broadcast_to(slide_trail[None, None], (b, Hs, n_slide, Bs)),
        ],
        axis=2,
    ).reshape(b, Hs, 1, n_slots * Bs)

    rqg = rq.reshape(b, Hs, h // Hs, d)
    sim = jnp.einsum(
        "bhgd,bhjd->bhgj", rqg, fk.reshape(b, Hs, -1, d),
        preferred_element_type=jnp.float32,
    ) * scale

    fv_flat = fv.reshape(b, Hs, -1, d)

    def masked_out(mask):
        s = jnp.where(mask, sim, mask_value(jnp.float32))
        attn = jax.nn.softmax(s, axis=-1).astype(rq.dtype)
        return jnp.einsum("bhgj,bhjd->bhgd", attn, fv_flat).reshape(b, h, d)

    return masked_out(fine_mask), masked_out(slide_mask)
