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

import math
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
from .rotary import (
    apply_rotary,
    rotate_at_offset,
    rotate_at_row_offsets,
    rotate_qk,
)
from .selection import fine_block_scores, group_importance, select_blocks


class NSADecodeCache(NamedTuple):
    """Per-layer structured sparse KV cache (static shapes, packed).

    Mirrors the reference cache pytree ``((k_rot, v), ((ck, cv),
    (run_k, run_v)))`` (reference: native_sparse_attention.py:346-354) with
    fixed-capacity buffers.  K and V are PACKED along the feature axis
    (``[..., :d]`` = key, ``[..., d:]`` = value): one cache write and one
    block gather per step serve both, and the 2*d=128 lane dimension tiles
    the TPU vector layout exactly.  Live lengths derive from the
    model-level ``seq_len`` scalar:

      num_cblocks = seq_len // stride
      run_fill    = overlap + seq_len - num_cblocks * stride

    The reference's running raw-KV buffer (run_k/run_v, reference:
    :418-437) is replaced by ``ring``: the last ``compress_block_size``
    UNROTATED tokens as a simple shift register (slot j = position
    t - Bc + 1 + j).  The emission window is exactly this ring (zero-masked
    before the sequence start), so emission never reads the big kv cache —
    which matters because any extra read of the carried cache buffer
    defeats XLA's in-place dynamic-update-slice and costs a full-cache
    copy per step.
    """

    kv: jnp.ndarray      # [b, kvh, max_len, 2d]     rotated k ++ v
    ckv: jnp.ndarray     # [b, kvh, max_cblocks, 2d] compressed k ++ v
    ring: jnp.ndarray    # [b, kvh, Bc, 2d]          last Bc unrotated k ++ v


def _ckv_width(max_len: int, stride: int, npf: int) -> int:
    """Width of the compressed-KV cache's slot dim.

    ``max_len // stride`` data rows plus spare rows — the LAST spare row is
    the XLA decode path's trash slot (non-emission steps write their
    discarded candidate there).  The width is rounded up to a multiple of
    BOTH ``num_compress_per_fine`` (the selection regroup pools npf
    compressed blocks per fine block, so the width must divide evenly) and
    8 (the fused decode kernels update emission slots through an aligned
    8-row DMA window; ``pl.multiple_of`` on the window base is only honest
    for every reachable slot when the width itself is 8-aligned —
    ADVICE r3 #1).  Rows past ``num_cb`` are masked out of the compressed
    softmax and never selected, so extra spare rows are semantics-free."""
    npf = max(npf, 1)
    unit = npf * 8 // math.gcd(npf, 8)
    return round_up_mult(max_len // stride + npf, unit)


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
    true_len: Optional[jnp.ndarray] = None,
):
    """Training / prefill forward. x: [b, n, dim].

    Returns out [b, n, dim], or (out, NSADecodeCache) when
    ``return_cache_max_len`` is given (prefill).

    ``true_len`` (traced scalar <= n) supports exact bucketed prefill over a
    right-padded prompt: rows at positions >= true_len are garbage but are
    never read by decode (kv/ckv validity is masked by the model-level
    seq_len and overwritten as decode advances); the only cache leaf whose
    *content* depends on the true length is the unrotated ring buffer,
    which is built here at ``true_len`` via a dynamic slice.
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
    # % 8: the fused decode kernels write the new token's row through an
    # aligned 8-row DMA window (ADVICE r3 #3)
    assert max_len >= n and max_len % stride == 0 and max_len % 8 == 0
    overlap = nsa.compress_overlap_len
    Bc = nsa.compress_block_size

    def pad_to(t, size, axis=2):
        pad = [(0, 0)] * t.ndim
        pad[axis] = (0, size - t.shape[axis])
        return jnp.pad(t, pad)

    # ring: last Bc unrotated tokens, right-aligned (slot j = position
    # L - Bc + j for true length L), zero on the left when L < Bc
    if true_len is None:
        lead = max(Bc - n, 0)
        ring_k = jnp.pad(k[:, :, max(n - Bc, 0):], ((0, 0), (0, 0), (lead, 0), (0, 0)))
        ring_v = jnp.pad(v[:, :, max(n - Bc, 0):], ((0, 0), (0, 0), (lead, 0), (0, 0)))
        ring = jnp.concatenate([ring_k, ring_v], axis=-1)
    else:
        kv_unrot = jnp.concatenate([k, v], axis=-1)        # [b, kvh, n, 2d]
        kv_unrot = jnp.pad(kv_unrot, ((0, 0), (0, 0), (Bc, 0), (0, 0)))
        tl = jnp.asarray(true_len, jnp.int32)
        if tl.ndim == 0:
            ring = jax.lax.dynamic_slice(
                kv_unrot, (0, 0, tl, 0), (b, kvh, Bc, 2 * d),
            )
        else:
            # per-row true lengths (batched serving admission): slot j of
            # row i holds position true_len[i] - Bc + j (offset +Bc from
            # the left-pad above)
            pos = tl[:, None] + jnp.arange(Bc)[None, :]    # [b, Bc]
            ring = jnp.take_along_axis(
                kv_unrot, pos[:, None, :, None], axis=2,
            )
    wc = _ckv_width(max_len, stride, nsa.num_compress_per_fine)
    cache = NSADecodeCache(
        kv=jnp.concatenate([pad_to(rk, max_len), pad_to(v, max_len)], axis=-1),
        ckv=jnp.concatenate([pad_to(ck, wc), pad_to(cv, wc)], axis=-1),
        ring=ring,
    )
    return out, cache


def init_decode_cache(
    cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.float32
) -> NSADecodeCache:
    """Empty per-layer cache for decode-from-scratch."""
    nsa = cfg.nsa
    d, kvh = cfg.dim_head, cfg.kv_heads
    stride = nsa.compress_block_sliding_stride
    # % 8: the fused decode kernels write rows through aligned 8-row DMA
    # windows (kv AND ckv — see _ckv_width)
    assert max_len % stride == 0 and max_len % 8 == 0
    z = lambda s: jnp.zeros((batch, kvh, s, 2 * d), dtype)
    return NSADecodeCache(
        kv=z(max_len),
        ckv=z(_ckv_width(max_len, stride, nsa.num_compress_per_fine)),
        ring=z(nsa.compress_block_size),
    )


def _select_tile(cfg: ModelConfig, max_len: int, stride: int, d: int,
                 dtype) -> int:
    """VMEM-guarded batch tile for the select kernels.

    The select kernel's ckv block is [Bt, Wc, 2d] in the cache dtype and
    Wc = max_len/stride grows with context (tile 32 is 4MB at max_len 4096
    but 16MB at 16384 — a Mosaic compile failure).  Cap the tile so the
    block stays <= ~4MB and double-buffering fits."""
    import numpy as _np

    row_bytes = (max_len // stride) * 2 * d * _np.dtype(dtype).itemsize
    cap = cfg.decode_select_tile
    while cap > 8 and cap * row_bytes > (4 << 20):
        cap //= 2
    return cap


def _use_fused_decode(cfg: ModelConfig, b: int, dtype, max_len: int) -> bool:
    """Whether the fully-fused 2-kernel decode path applies.

    Requires the Pallas impl, shared-KV selection with a masked diagonal,
    the GroupedMLP compressor (the only one implemented in-kernel), and
    Mosaic-legal batch tiles.  ``NSA_NO_FUSED_DECODE=1`` falls back to the
    round-2 path (kept for A/B benchmarking)."""
    nsa = cfg.nsa
    if os.environ.get("NSA_NO_FUSED_DECODE"):
        return False
    if not (
        cfg.attn_impl == "pallas"
        and nsa.query_heads_share_selected_kv
        and nsa.num_compress_per_fine > 1
        and nsa.num_selected_blocks > 0
        and nsa.compressor == "mlp"
    ):
        return False
    from .pallas.nsa_decode import _pick_batch_tile

    stride = nsa.compress_block_sliding_stride
    tiles = (
        _pick_batch_tile(b, _select_tile(cfg, max_len, stride, cfg.dim_head,
                                         dtype)),
        _pick_batch_tile(b, min(cfg.decode_attend_tile, 16)),
    )
    return all(bt % 8 == 0 or bt == b for bt in tiles)


def _ff_apply_gelu(ffp, cfg: ModelConfig, x):
    """Local mirror of models.transformer._ff_apply (gelu kind) so the
    decode step can own the feed-forward when the caller hands it the FF
    params (the fused kernel path runs it in-kernel; fallbacks run this)."""
    h = rms_norm(x, ffp["norm_scale"], cfg.norm_eps)
    h = jax.nn.gelu(
        h @ ffp["w1"].astype(h.dtype) + ffp["b1"].astype(h.dtype),
        approximate=False,
    )
    return h @ ffp["w2"].astype(h.dtype) + ffp["b2"].astype(h.dtype)


def sparse_attention_decode(
    params,
    cfg: ModelConfig,
    x: jnp.ndarray,
    cache: NSADecodeCache,
    seq_len: jnp.ndarray,
    ff_params=None,
    page_table=None,
) -> Tuple[jnp.ndarray, NSADecodeCache]:
    """One decode step. x: [b, 1, dim]; seq_len: scalar tokens already cached.

    Returns ``(x + attn_out, new_cache)`` — the UPDATED residual stream,
    not the bare attention output, so the fully-fused kernel path can fold
    the output projection and residual add into its last grid pass.

    With ``ff_params`` (the layer's gelu feed-forward dict) the step ALSO
    applies the whole FF block and returns the complete layer output: the
    fused kernel path runs it inside decode_attend's last head-grid step
    (one fewer XLA dispatch chain per layer), fallback paths apply it as
    XLA ops — either way the caller must not re-apply it.

    With ``page_table`` ([b, max_pages] int32) the kv leaf of ``cache`` is
    a SHARED physical page pool [P, kvh, PAGE, 2d] instead of per-slot
    dense rows (serve.py's paged allocator); requires ragged seq_len and
    the fused kernel path (the only kv reader/writer that understands the
    indirection).

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
    paged = page_table is not None
    if paged:
        # kv is [P, kvh, PAGE, 2d]; logical capacity comes from the table
        max_len = page_table.shape[1] * cache.kv.shape[2]
    else:
        max_len = cache.kv.shape[2]
    max_cb = cache.ckv.shape[2]
    max_fine = max_cb // nsa.num_compress_per_fine if nsa.num_compress_per_fine else 0

    t = jnp.asarray(seq_len, jnp.int32)           # current query position(s)
    # ragged mode: seq_len is [b] — every row decodes at its own cache
    # position (continuous-batching slot pool, serve.py).  All per-position
    # math below broadcasts over the row dim; cache writes become row
    # scatters; the (scalar-t) kernel paths are bypassed.
    ragged = t.ndim == 1
    num_cb = t // stride                          # compressed blocks cached
    run_fill = overlap + t - num_cb * stride      # live entries in run buffer

    # profiling-only ablation hooks (scripts/profile_decode.py); read at
    # trace time, never set in production
    ablate = os.environ.get("NSA_ABLATE", "")
    skip_fine = ablate in ("no_fine", "attn_only")
    skip_compressed = ablate in ("no_compressed", "attn_only")
    skip_emit = ablate in ("no_emit", "attn_only")

    normed = rms_norm(x, params["norm_scale"], cfg.norm_eps)

    # one fused projection matmul: [q | k | v | gate].  The concatenated
    # weight is precomputed ONCE by models.transformer.fuse_decode_params
    # when present (XLA does NOT hoist the concat out of the decode scan —
    # it showed as a real ~1 MB-copy device op per layer per step in the
    # bs-1 xprof); the in-graph build is the fallback for callers that
    # haven't fused (training-adjacent tests, ad-hoc decode).
    fp = params.get("decode_fused")
    if fp is not None:
        w_fused = fp["w_qkvg"].astype(normed.dtype)
    else:
        w_fused = jnp.concatenate(
            [params["w_q"], params["w_k"], params["w_v"], params["gate_w"]],
            axis=1,
        ).astype(normed.dtype)
    proj = (normed @ w_fused)[:, 0]               # [b, h*d + 2*kvh*d + 3h]
    qkv, gate_logits = (
        proj[:, : cfg.dim_inner + 2 * cfg.dim_kv_inner],
        proj[:, cfg.dim_inner + 2 * cfg.dim_kv_inner:],
    )
    q = qkv[:, : cfg.dim_inner].reshape(b, h, d)
    k_new = qkv[:, cfg.dim_inner: cfg.dim_inner + cfg.dim_kv_inner].reshape(b, kvh, d)
    v_new = qkv[:, cfg.dim_inner + cfg.dim_kv_inner:].reshape(b, kvh, d)

    kv_new = jnp.concatenate([k_new, v_new], axis=-1)          # [b, kvh, 2d]

    # ---- rotate q and k (two calls, NO concat/split: the [b, h+kvh, d]
    # concat + slices were separate device ops; sin/cos depend only on t so
    # XLA CSEs them across the two calls and across layers) ----------------
    rot_fn = rotate_at_row_offsets if ragged else rotate_at_offset
    rq = rot_fn(q[:, :, None], t, cfg.rope_theta)[:, :, 0]
    rk_new = rot_fn(k_new[:, :, None], t, cfg.rope_theta)[:, :, 0]

    gates = jax.nn.sigmoid(
        gate_logits + params["gate_b"].astype(gate_logits.dtype)
    ).reshape(b, h, 3)

    # ---- fully-fused kernel path (2 Pallas launches, caches updated
    # in place): ring shift + conditional emission + ckv write live in
    # decode_select_emit; gather + kv write + attention + output projection
    # + residual live in decode_attend_fused -------------------------------
    # batch-size policy (r4 A/B, exp_result/r4): the fused 2-kernel path
    # wins the dispatch-bound small-batch regime (bs 1: 0.684 vs 0.730
    # ms/step; bs 8: 0.852 vs 0.986) but loses the throughput-bound one
    # (bs 16: 1.002 vs 0.940; bs 64 / prompt 3900 headline: 62.8k vs
    # 67.0k tok/s) — decode_select_emit streams the whole ckv block per
    # batch tile, which the r2 path's batched XLA gather amortizes better
    # at large b.  Crossover sits between 8 and 16.  Ragged (serving)
    # rows always use the fused kernels: the r2 path vmaps scalar-prefetch
    # args into a per-SLOT kernel-launch loop.
    fused_max_b = int(os.environ.get("NSA_FUSED_DECODE_MAX_B", "8"))
    use_fused = _use_fused_decode(cfg, b, cache.ckv.dtype, max_len) and not (
        skip_fine or skip_compressed or skip_emit
    ) and (ragged or b <= fused_max_b)
    if paged and not (use_fused and ragged):
        raise NotImplementedError(
            "paged KV decode requires ragged seq_len and the fused kernel "
            "path (attn_impl='pallas', mlp compressor, shared-KV selection)"
        )
    if use_fused:
        from .pallas import nsa_decode_fused as fused

        nsa_ = cfg.nsa
        S_k = nsa_.num_selected_blocks
        n_slide = -(-window // Bs) + 1
        cdt = cache.ckv.dtype
        kc, vc = params["k_compress"], params["v_compress"]
        if fp is not None:
            # packed once by fuse_decode_params (no per-step concat/cast)
            pos_kv = fp["pos_kv"].astype(cdt)
            w1k_, w1v_ = fp["w1k"].astype(cdt), fp["w1v"].astype(cdt)
            w2 = fp["w2"].astype(cdt)
            b2 = fp["b2"]
            mem_kv_ = fp["mem_kv"].astype(x.dtype)
        else:
            pos_kv = jnp.concatenate(
                [params["k_pos"], params["v_pos"]], axis=-1
            ).astype(cdt)                                   # [kvh, Bc, 2d]
            w1k_, w1v_ = kc["w1"].astype(cdt), vc["w1"].astype(cdt)
            w2 = jnp.concatenate([kc["w2"], vc["w2"]], axis=-1).astype(cdt)
            b2 = jnp.concatenate([kc["b2"], vc["b2"]], axis=-1)
            mem_kv_ = params["mem_kv"].astype(x.dtype)
        num_cb_s = jnp.asarray(num_cb, jnp.int32)
        select_fn = (
            fused.decode_select_emit_ragged if ragged
            else fused.decode_select_emit
        )
        attend_fn = (
            fused.decode_attend_fused_ragged if ragged
            else fused.decode_attend_fused
        )
        ff_tuple = ()
        if ff_params is not None and not os.environ.get("NSA_NO_FF_FUSE"):
            ff_tuple = (
                ff_params["norm_scale"], ff_params["w1"], ff_params["b1"],
                ff_params["w2"], ff_params["b2"],
            )
        c_out4, info, ckv_cache, ring_new = select_fn(
            q.reshape(b, kvh, g, d),
            cache.ckv, cache.ring,
            kv_new[:, :, None].astype(cache.ring.dtype),
            mem_kv_,
            pos_kv,
            w1k_, kc["b1"],
            w1v_, vc["b1"],
            w2, b2,
            t, num_cb_s,
            max_blocks=max_len // Bs,
            stride=stride, sel_block=Bs, num_sel=S_k, n_slide=n_slide,
            scale=scale,
            batch_tile=_select_tile(cfg, max_len, stride, d, cache.ckv.dtype),
        )
        kv_new_rot = jnp.concatenate(
            [rk_new, v_new], axis=-1
        )[:, :, None].astype(cache.kv.dtype)
        if paged:
            out_x, kv_cache = fused.decode_attend_fused_paged(
                rq.reshape(b, kvh, g, d),
                cache.kv, page_table, kv_new_rot,
                info, c_out4,
                gates.reshape(b, kvh, g, 3),
                x, params["w_out"], t, ff_tuple,
                sel_block=Bs, window=window, num_sel=S_k, n_slide=n_slide,
                scale=scale, batch_tile=8, eps=cfg.norm_eps,
            )
        else:
            out_x, kv_cache = attend_fn(
                rq.reshape(b, kvh, g, d),
                cache.kv, kv_new_rot,
                info, c_out4,
                gates.reshape(b, kvh, g, 3),
                x, params["w_out"], t, ff_tuple,
                sel_block=Bs, window=window, num_sel=S_k, n_slide=n_slide,
                scale=scale,
                batch_tile=(8 if ragged else min(cfg.decode_attend_tile, 16)),
                eps=cfg.norm_eps,
            )
        if ff_params is not None and not ff_tuple:
            out_x = out_x + _ff_apply_gelu(ff_params, cfg, out_x)
        new_cache = NSADecodeCache(kv=kv_cache, ckv=ckv_cache, ring=ring_new)
        return out_x, new_cache

    # ---- shift the unrotated ring buffer ---------------------------------
    ring = jnp.concatenate(
        [cache.ring[:, :, 1:], kv_new[:, :, None]], axis=2
    )

    # ---- decode-kernel eligibility (needed before the cache append) -------
    # A tile is Mosaic-legal only if it is a sublane multiple (8) or spans
    # the whole batch (block == array dims); batches like 20 or 36 would
    # otherwise pick tile 4/2 and fail the TPU compile, so they fall back
    # to the XLA path instead.
    from .pallas.nsa_decode import _pick_batch_tile

    _sel_cap = _select_tile(cfg, max_len, stride, d, cache.ckv.dtype)
    _tiles_ok = all(
        bt % 8 == 0 or bt == b
        for bt in (
            _pick_batch_tile(b, _sel_cap),
            _pick_batch_tile(b, cfg.decode_attend_tile),
        )
    )
    use_decode_kernels = (
        cfg.attn_impl == "pallas"
        and not ragged
        and nsa.query_heads_share_selected_kv
        and nsa.num_compress_per_fine > 1
        and _tiles_ok
        and not (skip_compressed or skip_fine)
    )

    # ---- append to the main cache ----------------------------------------
    # Hybrid r2-select + fused-attend path (NSA_HYBRID_DECODE=1, on-chip
    # A/B): keeps the large-batch-winning batched select kernel but
    # replaces the XLA gather + attend + out-proj + FF chain with
    # decode_attend_fused, which also writes the new token's row in-kernel
    # — so the XLA row write must be skipped.
    hybrid = bool(
        os.environ.get("NSA_HYBRID_DECODE")
        and use_decode_kernels
        and nsa.num_selected_blocks > 0
    )
    kv_row = jnp.concatenate([rk_new, v_new], axis=-1)         # [b, kvh, 2d]
    if hybrid:
        kv_cache = cache.kv          # row committed inside decode_attend_fused
    elif ragged:
        # per-row positions: one batched scatter over the slot pool
        kv_cache = cache.kv.at[
            jnp.arange(b)[:, None], jnp.arange(kvh)[None, :], t[:, None]
        ].set(kv_row)
    else:
        kv_cache = jax.lax.dynamic_update_slice(
            cache.kv, kv_row[:, :, None], (0, 0, t, 0)
        )

    # ---- predicated compressed-block emission ----------------------------
    # When the (virtual) run buffer fills — i.e. t+1 is a stride multiple —
    # the emission window is exactly the last Bc tokens [t+1-Bc, t+1)
    # (left-zero-padded before the sequence start).  Those rows live in the
    # kv cache; the unrotated keys the compressor needs (reference:
    # :377-385) are recovered by inverse rotary.  Computing the candidate
    # unconditionally and predicating the write is cheaper here than a
    # lax.cond (branch-call overhead dominates the tiny compressor).
    if skip_emit:
        ckv_cache = cache.ckv
    else:
        emit = (run_fill + 1 == Bc)                # scalar | [b]
        # the ring now holds exactly the window [t+1-Bc, t+1); rows before
        # the sequence start are zero-masked
        row_pos = (t + 1 - Bc)[..., None] + jnp.arange(Bc)  # [Bc] | [b, Bc]
        if ragged:
            valid = row_pos[:, None, :, None] >= 0          # [b, 1, Bc, 1]
        else:
            valid = (row_pos >= 0)[None, None, :, None]
        win = jnp.where(valid, ring, 0.0)
        new_ck, new_cv = _compress_kv(
            params, cfg, win[:, :, None, :, :d], win[:, :, None, :, d:]
        )  # [b, kvh, 1, d] each
        cand = jnp.concatenate([new_ck, new_cv], axis=-1)
        # the ckv buffer carries spare trailing rows: when not emitting,
        # the candidate lands in the last (never-read) trash row instead of
        # requiring an old-value read + select
        trash = cache.ckv.shape[2] - 1
        slot = jnp.where(emit, jnp.clip(num_cb, 0, trash), trash)
        if ragged:
            ckv_cache = cache.ckv.at[
                jnp.arange(b)[:, None], jnp.arange(kvh)[None, :],
                slot[:, None]
            ].set(cand[:, :, 0])
        else:
            ckv_cache = jax.lax.dynamic_update_slice(
                cache.ckv, cand, (0, 0, slot, 0)
            )

    # ---- branches 1 + 2 + 3 ----------------------------------------------
    qg = q.reshape(b, kvh, g, d)
    # The fused decode kernels cover the shared-selection regime with a
    # masked diagonal (num_compress_per_fine > 1; stride == sel_block would
    # let the reference double-count the diagonal block, which a masked
    # union cannot express).  Any batch size works: the kernel wrappers
    # pick the largest power-of-two batch tile dividing b.  mem_kv width is
    # generic in the select kernel (importance excludes mem slots, matching
    # selection.group_importance).  Eligibility (use_decode_kernels) was
    # resolved above, before the cache append.
    if use_decode_kernels:
        from .pallas.nsa_decode import decode_attend, decode_select

        S_k = nsa.num_selected_blocks
        n_slide = -(-window // Bs) + 1
        c_out4, idx_all, msk = decode_select(
            qg, ckv_cache, params["mem_kv"].astype(qg.dtype), t, num_cb,
            max_blocks=max_len // Bs,
            stride=stride, sel_block=Bs, window=window, num_sel=S_k,
            n_slide=n_slide, scale=scale,
            batch_tile=_sel_cap,
        )
        if hybrid:
            # decode_select's packed info is byte-compatible with
            # decode_attend_fused's scalar-prefetched layout: idx in
            # [0, n_slots), validity at [n_slots, n_slots + num_sel)
            from .pallas.nsa_decode_fused import decode_attend_fused

            ff_tuple = ()
            if ff_params is not None and not os.environ.get("NSA_NO_FF_FUSE"):
                ff_tuple = (
                    ff_params["norm_scale"], ff_params["w1"], ff_params["b1"],
                    ff_params["w2"], ff_params["b2"],
                )
            out_x, kv_cache = decode_attend_fused(
                rq.reshape(b, kvh, g, d),
                kv_cache, kv_row[:, :, None].astype(cache.kv.dtype),
                msk, c_out4,
                gates.reshape(b, kvh, g, 3),
                x, params["w_out"], t, ff_tuple,
                sel_block=Bs, window=window, num_sel=S_k, n_slide=n_slide,
                scale=scale, batch_tile=min(cfg.decode_attend_tile, 16),
                eps=cfg.norm_eps,
            )
            if ff_params is not None and not ff_tuple:
                out_x = out_x + _ff_apply_gelu(ff_params, cfg, out_x)
            return out_x, NSADecodeCache(
                kv=kv_cache, ckv=ckv_cache, ring=ring)
        kvb = kv_cache.reshape(b, kvh, max_len // Bs, Bs, 2 * d)
        fkv = gather_blocks(kvb, idx_all[:, :, None])[:, :, 0]
        fkv = fkv.reshape(b, kvh, (S_k + n_slide) * Bs, 2 * d)
        # gate combine happens in-kernel (saves two ~30us dispatches/layer)
        combined = decode_attend(
            rq.reshape(b, kvh, g, d), fkv, msk, c_out4,
            gates.reshape(b, kvh, g, 3), t,
            sel_block=Bs, window=window, num_sel=S_k, n_slide=n_slide,
            scale=scale, batch_tile=cfg.decode_attend_tile,
        )
        out = combined.reshape(b, h, d)
    else:
        if skip_compressed:
            compressed_out = jnp.zeros((b, h, d), q.dtype)
            csim = jnp.zeros((b, kvh, g, num_mem + max_cb), jnp.float32)
        else:
            compressed_out, csim = _decode_compressed(
                params, qg, ckv_cache, num_cb, num_mem, scale, b, kvh, g, d,
                h, max_cb,
            )
        if skip_fine:
            fine_out = jnp.zeros((b, h, d), q.dtype)
            sliding_out = jnp.zeros((b, h, d), q.dtype)
        else:
            fine_out, sliding_out = _decode_fine_sliding(
                cfg, csim, rq, kv_cache, t, b, h, kvh, g, d, num_mem, scale,
                max_len,
            )
        stacked = jnp.stack([compressed_out, fine_out, sliding_out], axis=-1)
        out = jnp.einsum("bhs,bhds->bhd", gates.astype(stacked.dtype), stacked)

    out = out.reshape(b, 1, h * d) @ params["w_out"].astype(x.dtype)

    new_cache = NSADecodeCache(kv=kv_cache, ckv=ckv_cache, ring=ring)
    out_x = x + out
    if ff_params is not None:
        out_x = out_x + _ff_apply_gelu(ff_params, cfg, out_x)
    return out_x, new_cache


def _decode_compressed(params, qg, ckv_cache, num_cb, num_mem, scale, b, kvh,
                       g, d, h, max_cb):
    mem_k = params["mem_kv"][0].astype(qg.dtype)   # [kvh, mem, d]
    mem_v = params["mem_kv"][1].astype(qg.dtype)
    csim_mem = jnp.einsum(
        "bhgd,hmd->bhgm", qg, mem_k, preferred_element_type=jnp.float32
    ) * scale
    csim_blocks = jnp.einsum(
        "bhgd,bhjd->bhgj", qg, ckv_cache[..., :d],
        preferred_element_type=jnp.float32,
    ) * scale
    ncb = jnp.asarray(num_cb)
    if ncb.ndim == 1:                                # ragged: per-row count
        cb_valid = (jnp.arange(max_cb) < ncb[:, None])[:, None, None, :]
    else:
        cb_valid = (jnp.arange(max_cb) < ncb)[None, None, None]
    csim_blocks = jnp.where(cb_valid, csim_blocks, mask_value(jnp.float32))
    csim = jnp.concatenate([csim_mem, csim_blocks], axis=-1)   # [b,kvh,g,mem+maxcb]
    cattn = jax.nn.softmax(csim, axis=-1).astype(qg.dtype)
    cv_all = jnp.concatenate(
        [jnp.broadcast_to(mem_v[None], (b, kvh, num_mem, d)),
         ckv_cache[..., d:]],
        axis=2,
    )
    compressed_out = jnp.einsum("bhgj,bhjd->bhgd", cattn, cv_all)
    compressed_out = compressed_out.reshape(b, h, d)
    return compressed_out, csim


def _decode_fine_sliding(cfg, csim, rq, kv_cache, t, b, h, kvh, g, d,
                         num_mem, scale, max_len):
    """Fine + sliding branches from ONE gathered block set.

    The sliding window (last ``window + 1`` tokens) is contained in the
    trailing ``ceil(window / Bs) + 1`` selection-size blocks ending at the
    query's own block, and the block-causal diagonal IS that last trailing
    block — so a single gather of ``S + n_slide`` packed KV blocks, one q.K
    matmul, and two masked softmaxes produce both branch outputs.
    """
    nsa = cfg.nsa
    Bs = nsa.selection_block_size
    stride = nsa.compress_block_sliding_stride
    window = nsa.sliding_window_size
    ragged = t.ndim == 1                           # per-row positions

    importance = group_importance(
        csim.reshape(b, h, 1, -1), num_mem, g, nsa.query_heads_share_selected_kv
    )
    q_pos = t[:, None] if ragged else t[None]      # [b, 1] | [1]
    norm_scores = fine_block_scores(importance, q_pos, Bs, stride)
    sel = select_blocks(norm_scores, nsa.num_selected_blocks, use_diff_topk=False)
    S = sel.indices.shape[-1]
    Hs = sel.indices.shape[1]

    n_slide = -(-window // Bs) + 1
    last_blk = t // Bs
    trail = last_blk[..., None] - jnp.arange(n_slide - 1, -1, -1)  # ascending
    trail_clip = jnp.clip(trail, 0, max_len // Bs - 1)  # [ns] | [b, ns]
    trail_b = trail_clip[:, None] if ragged else trail_clip[None, None]

    idx_all = jnp.concatenate(
        [
            sel.indices[:, :, 0],                               # [b, Hs, S]
            jnp.broadcast_to(trail_b, (b, Hs, n_slide)),
        ],
        axis=-1,
    )                                                           # [b,Hs,S+ns]
    n_slots = S + n_slide

    if cfg.attn_impl == "pallas" and Hs == kvh:
        from .pallas.paged_gather import paged_gather

        fkv = paged_gather(kv_cache, idx_all, Bs)               # [b,Hs,J,2d]
    else:
        kvb = kv_cache.reshape(b, kvh, max_len // Bs, Bs, 2 * d)
        if Hs != kvh:
            kvb = repeat_kv(kvb.reshape(b, kvh, -1, 2 * d), Hs // kvh).reshape(
                b, Hs, -1, Bs, 2 * d
            )
        fkv = gather_blocks(kvb, idx_all[:, :, None])[:, :, 0]
        fkv = fkv.reshape(b, Hs, n_slots * Bs, 2 * d)

    col = jnp.arange(Bs)
    # global positions of the trailing columns (from UNCLIPPED block ids):
    # [ns, Bs] shared, or [b, ns, Bs] ragged
    j_trail = trail[..., :, None] * Bs + col
    trail_ok = trail[..., :, None] >= 0
    t_b = t[:, None, None] if ragged else t

    def to_bhsb(m):
        """broadcast a [ns, Bs] / [b, ns, Bs] trailing mask to [b,Hs,ns,Bs]."""
        m = m[:, None] if ragged else m[None, None]
        return jnp.broadcast_to(m, (b, Hs, n_slide, Bs))

    # fine mask: selected slots (score-gated), plus causal cols of the
    # diagonal (= last trailing) slot
    fine_sel = jnp.broadcast_to(sel.mask[:, :, 0, :, None], (b, Hs, S, Bs))
    diag_only = jnp.zeros((n_slide, Bs), bool).at[-1].set(True)
    fine_trail = diag_only & (j_trail <= t_b) & trail_ok
    fine_mask = jnp.concatenate(
        [fine_sel, to_bhsb(fine_trail)], axis=2
    ).reshape(b, Hs, 1, n_slots * Bs)

    # sliding mask: the exact band over the trailing slots
    slide_trail = (j_trail >= t_b - window) & (j_trail <= t_b) & trail_ok
    slide_mask = jnp.concatenate(
        [
            jnp.zeros((b, Hs, S, Bs), bool),
            to_bhsb(slide_trail),
        ],
        axis=2,
    ).reshape(b, Hs, 1, n_slots * Bs)

    rqg = rq.reshape(b, Hs, h // Hs, d)
    sim = jnp.einsum(
        "bhgd,bhjd->bhgj", rqg, fkv[..., :d],
        preferred_element_type=jnp.float32,
    ) * scale

    fv_flat = fkv[..., d:]

    def masked_out(mask):
        s = jnp.where(mask, sim, mask_value(jnp.float32))
        attn = jax.nn.softmax(s, axis=-1).astype(rq.dtype)
        return jnp.einsum("bhgj,bhjd->bhgd", attn, fv_flat).reshape(b, h, d)

    return masked_out(fine_mask), masked_out(slide_mask)
