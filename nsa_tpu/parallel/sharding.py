"""Parameter / cache partition specs for the (data, heads) mesh.

Sharding layout (tensor parallelism over attention heads):

* q/k/v projections   [dim, h*dh]      -> P(None, "heads")   (column)
* output projection   [h*dh, dim]      -> P("heads", None)   (row, psum out)
* gate projection     [dim, 3*h]       -> P(None, "heads")   (h-major layout)
* per-head compressor weights [kvh, ...] -> P("heads", ...)
* mem_kv [2, kvh, m, d], intra-block positions [kvh, Bc, d] -> heads axis
* FF w1 [dim, hidden] -> column, w2 [hidden, dim] -> row
* norms, embeddings, logits head     -> replicated
* decode caches  [b, kvh, ...]        -> P("data", "heads")
* token batches  [b, n] / [accum, b, n] -> batch axis on "data"

Because NSA selection is per KV head, every selected-block gather reads
only the local KV shard; cross-device traffic is limited to the usual TP
psum after the output projection and the data-parallel gradient reduction.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from .mesh import AXIS_DATA, AXIS_HEADS

_COLUMN = {"w_q", "w_k", "w_v", "gate_w", "w1"}
_ROW = {"w_out", "w2"}
_HEAD_VEC = {"gate_b", "b1"}
_REPLICATED = {"norm_scale", "b2", "token_emb", "to_logits"}


def param_spec(path, leaf) -> P:
    """PartitionSpec for one parameter, keyed on its tree path."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    name = names[-1] if names else ""
    in_compressor = any(n in ("k_compress", "v_compress") for n in names)

    # precomputed fused decode weights (transformer.fuse_decode_params):
    # per-KV-head packs shard over heads; the concatenated qkv+gate
    # projection mixes head-major segments with different head strides, so
    # it replicates (1.5 MB/layer — the TP proj matmul then runs whole-W
    # per shard, which decode's [b, 1] activations make negligible)
    if any(n == "decode_fused" for n in names):
        if name == "w_qkvg":
            return P()
        if name == "mem_kv":
            return P(None, AXIS_HEADS)
        if hasattr(leaf, "ndim") and leaf.ndim >= 2:
            return P(AXIS_HEADS, *([None] * (leaf.ndim - 1)))
        return P(AXIS_HEADS)

    # grouped compressor weights carry a leading kv_heads axis; check this
    # FIRST so their w1/w2 names don't collide with the FF column/row sets
    # (which would shard dim_in over heads and force resharding traffic)
    if in_compressor:
        if hasattr(leaf, "ndim") and leaf.ndim >= 2:
            return P(AXIS_HEADS, *([None] * (leaf.ndim - 1)))
        return P()
    if name in _COLUMN:
        return P(None, AXIS_HEADS)
    if name in _ROW:
        return P(AXIS_HEADS, None)
    if name in _HEAD_VEC:
        return P(AXIS_HEADS)
    if name == "mem_kv":
        return P(None, AXIS_HEADS)
    if name in ("k_pos", "v_pos"):
        return P(AXIS_HEADS)
    return P()


def params_pspecs(params) -> Any:
    return jax.tree_util.tree_map_with_path(param_spec, params)


def shard_params(params, mesh: Mesh):
    """Place parameters on the mesh according to the TP layout."""
    specs = params_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_batch(batch, mesh: Mesh, batch_axis: int = 0):
    """Shard a token batch along its batch dimension over the data axis
    (and the DCN axis too on a hierarchical multi-host-shaped mesh)."""
    spec = [None] * batch.ndim
    if "dcn" in mesh.axis_names:
        spec[batch_axis] = ("dcn", AXIS_DATA)
    else:
        spec[batch_axis] = AXIS_DATA
    return jax.device_put(batch, NamedSharding(mesh, P(*spec)))


def cache_spec(leaf) -> P:
    """Decode-cache arrays are [b, kvh, ...]: batch on data, heads on TP."""
    if hasattr(leaf, "ndim") and leaf.ndim >= 2:
        return P(AXIS_DATA, AXIS_HEADS, *([None] * (leaf.ndim - 2)))
    return P()


def shard_cache(cache, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: (
            jax.device_put(x, NamedSharding(mesh, cache_spec(x)))
            if getattr(x, "ndim", 0) >= 2
            else jax.device_put(x, NamedSharding(mesh, P()))
        ),
        cache,
    )
