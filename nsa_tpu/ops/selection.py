"""Block selection: importance scores -> normalized scores -> top-k.

Reimplements the reference's selection logic (reference:
native_sparse_attention.py:650-721):

1. importance = compressed-attention logits minus the mem slots;
2. optionally mean over grouped query heads (``query_heads_share_selected_kv``);
3. if the compression stride differs from the selection block size, mean-pool
   groups of ``selection_block_size / stride`` consecutive compressed scores
   into per-fine-block scores and mask the block diagonal;
4. the pad(-1e3) -> softmax -> strip normalization trick
   (reference: native_sparse_attention.py:693-695);
5. static-width top-k with a validity mask (``score > 1e-10``) and optional
   straight-through gates for differentiable top-k.

All functions take an explicit ``q_positions`` vector so the same code
serves prefill (positions 0..n) and single-token decode (position t-1) —
the reference has two divergent copies of this logic
(native_sparse_attention.py:442-476 vs :650-721) which disagree on
diagonal masking; we use the prefill semantics for both so that
prefill/decode equivalence holds exactly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .common import mask_value, round_down_mult, straight_through

SCORE_EPS = 1e-10  # validity threshold, reference: native_sparse_attention.py:721


class Selection(NamedTuple):
    indices: jnp.ndarray     # [b, Hs, n, S] selected fine-block ids
    scores: jnp.ndarray      # [b, Hs, n, S] normalized scores
    mask: jnp.ndarray        # [b, Hs, n, S] score > 1e-10
    gates: Optional[jnp.ndarray]  # straight-through gates or None


def group_importance(
    csim: jnp.ndarray, num_mem_kv: int, num_grouped_queries: int, share: bool
) -> jnp.ndarray:
    """csim [b, h, i, mem+w] -> importance [b, Hs, i, w].

    Drops the mem slots and, when query heads share selection, averages the
    logits across each group of query heads (reference:
    native_sparse_attention.py:652-664).
    """
    scores = csim[..., num_mem_kv:]
    if share and num_grouped_queries > 1:
        b, h, i, w = scores.shape
        scores = scores.reshape(b, h // num_grouped_queries, num_grouped_queries, i, w)
        scores = scores.mean(axis=2)
    return scores


def fine_block_scores(
    importance: jnp.ndarray,
    q_positions: jnp.ndarray,
    selection_block_size: int,
    compress_stride: int,
) -> jnp.ndarray:
    """Regroup per-compressed-block scores to per-fine-block normalized scores.

    importance: [b, Hs, i, w_compress]; q_positions: [i] global positions.
    Returns [b, Hs, i, w_fine] softmax-normalized scores.
    """
    num_per_fine = selection_block_size // compress_stride

    if num_per_fine != 1:
        w = importance.shape[-1]
        w_down = round_down_mult(w, num_per_fine)
        importance = importance[..., :w_down]
        if w_down == 0:
            return importance
        shp = importance.shape[:-1]
        importance = importance.reshape(*shp, w_down // num_per_fine, num_per_fine)
        importance = importance.mean(axis=-1)

        # mask out the block diagonal (reference:
        # native_sparse_attention.py:682-691): the sliding window and the
        # appended block-causal diagonal already cover it.  q_positions is
        # [i] (shared across batch) or [b, i] (ragged decode: every slot
        # sits at its own position).
        j = importance.shape[-1]
        q_blk = q_positions // selection_block_size            # [i] | [b, i]
        diag = q_blk[..., :, None] == jnp.arange(j)            # [i,j]|[b,i,j]
        if diag.ndim == 2:
            diag = diag[None, None]                            # [1, 1, i, j]
        else:
            diag = diag[:, None]                               # [b, 1, i, j]
        importance = jnp.where(
            diag, mask_value(importance.dtype), importance
        )

    # pad(-1e3) -> softmax -> strip (reference: native_sparse_attention.py:693-695)
    pad_shape = (*importance.shape[:-1], 1)
    padded = jnp.concatenate(
        [jnp.full(pad_shape, -1e3, importance.dtype), importance], axis=-1
    )
    normed = jax.nn.softmax(padded, axis=-1)
    return normed[..., 1:]


def iterative_top_k(scores: jnp.ndarray, k: int):
    """Top-k by k passes of (max, mask) — no sort.

    For the tiny k of NSA selection (k ~ 4) this is far cheaper on the TPU
    VPU than lax.top_k's sort-based lowering, and returns values in
    descending order with ties broken by lowest index (same contract).
    """
    vals, idxs = [], []
    cur = scores
    for _ in range(k):
        v = jnp.max(cur, axis=-1)
        i = jnp.argmax(cur, axis=-1)
        vals.append(v)
        idxs.append(i)
        cur = jnp.where(
            jax.nn.one_hot(i, cur.shape[-1], dtype=bool), -jnp.inf, cur
        )
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def select_blocks(
    scores: jnp.ndarray, num_selected_blocks: int, use_diff_topk: bool,
    top_k_impl: str = "iterative",
) -> Selection:
    """Static-width top-k over normalized fine-block scores.

    Unlike the reference's dynamic ``min(num_selected, num_blocks)`` top-k
    (reference: native_sparse_attention.py:654,703), the width here is
    static for jit friendliness; surplus slots land on blocks whose score is
    <= 1e-10 and are excluded by ``mask`` exactly as the reference's fmask
    excludes them.
    """
    w = scores.shape[-1]
    S = min(num_selected_blocks, w) if w > 0 else 0
    if S == 0:
        shape = (*scores.shape[:-1], 0)
        empty = jnp.zeros(shape, scores.dtype)
        return Selection(
            indices=jnp.zeros(shape, jnp.int32),
            scores=empty,
            mask=jnp.zeros(shape, bool),
            gates=empty if use_diff_topk else None,
        )
    if top_k_impl == "iterative" and S <= 8:
        vals, idx = iterative_top_k(scores, S)
    else:
        vals, idx = jax.lax.top_k(scores, S)
    gates = straight_through(vals, 1.0) if use_diff_topk else None
    return Selection(
        indices=idx.astype(jnp.int32),
        scores=vals,
        mask=vals > SCORE_EPS,
        gates=gates,
    )
