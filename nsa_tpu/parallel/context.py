"""Context (sequence) parallelism for long-context prefill and training.

The reference has no distributed execution of any kind (SURVEY.md section
2.4); long-context scaling there comes only from the NSA algorithm.  This
module adds the TPU-native mechanism on top: shard the SEQUENCE axis of
activations across a 1-D ``seq`` device mesh with ``shard_map``.

Per layer, every device

* computes Q/K/V for its local slab of positions,
* all-gathers the (small) K/V rows over ICI — at dim-head 64 and 4 KV
  heads that is 2 MB per 4k tokens, negligible next to the q-side compute,
* computes the compressed K/V from the gathered rows (replicated compute:
  ``n/stride`` tiny matmuls — cheaper than a second collective round),
* runs all three NSA branches only for its LOCAL query rows at their
  GLOBAL positions (every branch helper is positions-parameterized), and
* applies gate combine / output projection / FF position-locally.

Embedding, norms, logits, and loss are position-local; the loss is a
``psum`` of per-shard NLL sums.  The q-side attention work — the actual
long-context prefill bottleneck — therefore splits N ways while weights
stay replicated (the right trade for a ~19M-parameter model; compose with
the (data, heads) TP mesh by reserving devices per axis).

Semantics are pinned by tests/test_context_parallel.py: logits, loss, and
gradients on an 8-device virtual ``seq`` mesh must match the single-device
``transformer_forward`` / ``transformer_loss`` exactly.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import ModelConfig
from ..models.transformer import _ff_apply, _layers_homogeneous
from ..ops.attention import attend, blockify_kv, fine_attend_core
from ..ops.nsa import _compress_kv, _gate_combine
from ..ops.rotary import apply_rotary
from ..ops.selection import fine_block_scores, group_importance, select_blocks
from ..ops.compress import split_compress_windows
from ..ops.common import rms_norm, split_heads, merge_heads

AXIS_SEQ = "seq"


def make_seq_mesh(n_devices: Optional[int] = None,
                  devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh whose single axis carries the sequence."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (AXIS_SEQ,))


def _sliding_local(rq, rk_full, v_full, offset, n_loc, window, scale):
    """Exact banded attention for local query rows at global positions
    ``offset + [0, n_loc)`` over full-sequence keys: query i attends keys j
    with ``0 <= i - j <= window``.  Only the ``n_loc + window`` keys that
    can fall in any local row's band are sliced (left-pad by ``window`` so
    the dynamic-slice start is simply ``offset``)."""
    b, kvh, n, d = rk_full.shape
    pad = ((0, 0), (0, 0), (window, 0), (0, 0))
    ks = jax.lax.dynamic_slice(
        jnp.pad(rk_full, pad), (0, 0, offset, 0), (b, kvh, n_loc + window, d)
    )
    vs = jax.lax.dynamic_slice(
        jnp.pad(v_full, pad), (0, 0, offset, 0), (b, kvh, n_loc + window, d)
    )
    qi = offset + jnp.arange(n_loc)                       # global q positions
    kj = offset - window + jnp.arange(n_loc + window)     # global key positions
    delta = qi[:, None] - kj[None, :]
    mask = (delta >= 0) & (delta <= window) & (kj >= 0)[None, :]
    return attend(rq, ks, vs, mask=mask, scale=scale)


def cp_sparse_attention(params, cfg: ModelConfig, x_local, *, axis=AXIS_SEQ):
    """One NSA layer on a sequence shard (inside ``shard_map``).

    x_local: [b, n_loc, dim] — this device's slab of positions.  Same math
    as :func:`nsa_tpu.ops.nsa.sparse_attention_forward` (reference:
    native_sparse_attention.py:549-867), with K/V all-gathered over the
    ``axis`` mesh axis and every branch evaluated at global positions.
    """
    nsa = cfg.nsa
    b, n_loc, _ = x_local.shape
    d, h, kvh = cfg.dim_head, cfg.heads, cfg.kv_heads
    g = cfg.num_grouped_queries
    scale = d ** -0.5
    stride = nsa.compress_block_sliding_stride
    num_mem = nsa.num_compressed_mem_kv

    shard = jax.lax.axis_index(axis)
    n_shards = jax.lax.psum(1, axis)
    offset = shard * n_loc
    n = n_loc * n_shards                                  # global length
    positions = offset + jnp.arange(n_loc)

    normed = rms_norm(x_local, params["norm_scale"], cfg.norm_eps)
    q = split_heads(normed @ params["w_q"].astype(normed.dtype), d)
    k = split_heads(normed @ params["w_k"].astype(normed.dtype), d)
    v = split_heads(normed @ params["w_v"].astype(normed.dtype), d)

    # rotate local rows at their global positions, then gather: rotary is
    # position-wise, so local-rotate + all-gather == gather + full-rotate
    rq = apply_rotary(q, positions, cfg.rope_theta)
    rk = apply_rotary(k, positions, cfg.rope_theta)

    k_full = jax.lax.all_gather(k, axis, axis=2, tiled=True)
    v_full = jax.lax.all_gather(v, axis, axis=2, tiled=True)
    rk_full = jax.lax.all_gather(rk, axis, axis=2, tiled=True)

    # ---- branch 1: compressed attention (UNROTATED inputs; reference:
    # native_sparse_attention.py:377-385) — replicated compute off the
    # gathered rows
    compress_divisible = (n // stride) * stride
    num_cblocks = compress_divisible // stride
    if num_cblocks > 0:
        kw = split_compress_windows(
            k_full[:, :, :compress_divisible], nsa.compress_block_size, stride
        )
        vw = split_compress_windows(
            v_full[:, :, :compress_divisible], nsa.compress_block_size, stride
        )
        ck, cv = _compress_kv(params, cfg, kw, vw)
    else:
        ck = jnp.zeros((b, kvh, 0, d), k.dtype)
        cv = jnp.zeros((b, kvh, 0, d), v.dtype)
    mem_k = jnp.broadcast_to(params["mem_kv"][0].astype(k.dtype),
                             (b, kvh, num_mem, d))
    mem_v = jnp.broadcast_to(params["mem_kv"][1].astype(v.dtype),
                             (b, kvh, num_mem, d))
    ck_full = jnp.concatenate([mem_k, ck], axis=2)
    cv_full = jnp.concatenate([mem_v, cv], axis=2)
    ck_ends = (jnp.arange(num_cblocks) + 1) * stride - 1
    ck_ends = jnp.concatenate(
        [jnp.full((num_mem,), -1, ck_ends.dtype), ck_ends]
    )

    cmask = None
    if cfg.causal:
        cmask = ck_ends[None, :] < positions[:, None]
    c_out, csim = attend(
        q, ck_full, cv_full, mask=cmask, scale=scale, return_sim=True
    )

    # ---- branch 2: selection + fine attention at global positions -------
    importance = group_importance(
        csim, num_mem, g, nsa.query_heads_share_selected_kv
    )
    norm_scores = fine_block_scores(
        importance, positions, nsa.selection_block_size, stride
    )
    sel = select_blocks(norm_scores, nsa.num_selected_blocks, nsa.use_diff_topk)
    Hs = kvh if nsa.query_heads_share_selected_kv else h
    kb, vb = blockify_kv(rk_full, v_full, nsa.selection_block_size, Hs)
    f_out = fine_attend_core(
        rq, kb, vb, sel.indices, sel.mask, sel.gates, positions,
        cfg.causal, scale,
    )

    # ---- branch 3: sliding window over the gathered rows ----------------
    s_out = _sliding_local(
        rq, rk_full, v_full, offset, n_loc, nsa.sliding_window_size, scale
    )

    out = _gate_combine(params, cfg, normed, [c_out, f_out, s_out])
    return merge_heads(out) @ params["w_out"].astype(x_local.dtype)


def cp_full_attention(params, cfg: ModelConfig, x_local, *, axis=AXIS_SEQ):
    """Full-attention baseline layer on a sequence shard: local queries at
    global positions over all-gathered K/V with an explicit causal mask."""
    b, n_loc, _ = x_local.shape
    d = cfg.dim_head
    shard = jax.lax.axis_index(axis)
    offset = shard * n_loc
    positions = offset + jnp.arange(n_loc)

    normed = rms_norm(x_local, params["norm_scale"], cfg.norm_eps)
    q = split_heads(normed @ params["w_q"].astype(x_local.dtype), d)
    k = split_heads(normed @ params["w_k"].astype(x_local.dtype), d)
    v = split_heads(normed @ params["w_v"].astype(x_local.dtype), d)
    rq = apply_rotary(q, positions, cfg.rope_theta)
    rk = apply_rotary(k, positions, cfg.rope_theta)
    rk_full = jax.lax.all_gather(rk, axis, axis=2, tiled=True)
    v_full = jax.lax.all_gather(v, axis, axis=2, tiled=True)

    mask = None
    if cfg.causal:
        kj = jnp.arange(rk_full.shape[2])
        mask = positions[:, None] >= kj[None, :]
    out = attend(rq, rk_full, v_full, mask=mask, scale=d ** -0.5)
    return merge_heads(out) @ params["w_out"].astype(x_local.dtype)


def _cp_forward_local(params, cfg: ModelConfig, ids_local, *, axis=AXIS_SEQ):
    """Transformer forward on a sequence shard (inside ``shard_map``)."""
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    x = params["token_emb"][ids_local].astype(dtype)

    attn_fn = cp_sparse_attention if cfg.use_sparse_attn else cp_full_attention

    def layer_step(h, layer):
        h = h + attn_fn(layer["attn"], cfg, h, axis=axis)
        h = h + _ff_apply(layer["ff"], cfg, h)
        return h, None

    if cfg.scan_layers and _layers_homogeneous(params):
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *params["layers"]
        )
        x, _ = jax.lax.scan(jax.checkpoint(layer_step), x, stacked)
    else:
        for layer in params["layers"]:
            x, _ = layer_step(x, layer)
    x = rms_norm(x, params["norm_scale"], cfg.norm_eps)
    return (x @ params["to_logits"].astype(dtype)).astype(jnp.float32)


def context_parallel_forward(params, cfg: ModelConfig, ids, mesh: Mesh):
    """Logits [b, n, vocab] with the sequence axis sharded over ``mesh``.

    ``n`` must divide by the mesh's ``seq`` axis size.
    """
    n_shards = mesh.shape[AXIS_SEQ]
    assert ids.shape[1] % n_shards == 0, (ids.shape, n_shards)
    f = shard_map(
        lambda p, i: _cp_forward_local(p, cfg, i),
        mesh=mesh,
        in_specs=(P(), P(None, AXIS_SEQ)),
        out_specs=P(None, AXIS_SEQ, None),
        check_vma=False,
    )
    return f(params, ids)


def context_parallel_loss(params, cfg: ModelConfig, ids, mesh: Mesh):
    """Mean CE on shifted ids, sequence-sharded (matches
    ``transformer_loss`` exactly; labels cross shard boundaries via the
    global shift *before* sharding)."""
    inp, labels = ids[:, :-1], ids[:, 1:]
    n_shards = mesh.shape[AXIS_SEQ]
    assert inp.shape[1] % n_shards == 0, (inp.shape, n_shards)

    def local(params, inp_l, labels_l):
        logits = _cp_forward_local(params, cfg, inp_l)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels_l[..., None], axis=-1)[..., 0]
        total = jax.lax.psum(nll.sum(), AXIS_SEQ)
        count = jax.lax.psum(nll.size, AXIS_SEQ)
        return total / count

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, AXIS_SEQ), P(None, AXIS_SEQ)),
        out_specs=P(),
        check_vma=False,
    )
    return f(params, inp, labels)
