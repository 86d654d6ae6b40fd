"""KV compression: overlapping window split + the compressor zoo.

TPU-native reimplementation of the reference's compression plumbing
(reference: native_sparse_attention.py:270-296) and compressor networks
(reference: compress_networks.py):

* ``split_compress_windows`` — overlapping window split, equivalent to the
  reference's Rearrange -> ZeroPad2d(left pad = block - stride) -> Unfold
  pipeline (reference: native_sparse_attention.py:270-275).
* compressors mapping ``[b, h, w, n, d] -> [b, h, w, d]``:
  - ``mlp``        GroupedMLP, per-head two-layer MLP over the flattened
                   window (reference: compress_networks.py:95-123)
  - ``conv``       grouped Conv1d, one dxd kernel per head (reference:
                   compress_networks.py:19-44)
  - ``attn``       attention pooling with identity-initialized logits
                   (reference: compress_networks.py:48-69)
  - ``mean``       parameter-free mean pool (reference:
                   compress_networks.py:72-91)
  - ``shared_mlp`` the reference's default inline MLP shared across heads
                   (reference: native_sparse_attention.py:284-293)
  - ``single``     single projection (reference: compress_networks.py:127-158)

All compressors are expressed as head-batched einsums so XLA tiles them
onto the MXU; the per-head weights carry an explicit leading ``h`` axis
which is also the tensor-parallel sharding axis.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import NSAConfig


def split_compress_windows(
    kv: jnp.ndarray, block_size: int, stride: int
) -> jnp.ndarray:
    """[b, h, n, d] -> [b, h, w, block_size, d] overlapping windows.

    ``n`` must be divisible by ``stride``; window ``i`` covers original
    positions ``[i*stride - (block - stride), i*stride + stride)`` with left
    zero padding, so window ``i`` ends at position ``(i+1)*stride - 1``
    (which is what the compressed-attention causal mask assumes, reference:
    native_sparse_attention.py:633-637).
    """
    b, h, n, d = kv.shape
    assert n % stride == 0, (n, stride)
    pad = block_size - stride
    if pad:
        kv = jnp.pad(kv, ((0, 0), (0, 0), (pad, 0), (0, 0)))
    w = n // stride
    idx = jnp.arange(w)[:, None] * stride + jnp.arange(block_size)[None, :]
    return kv[:, :, idx, :]


# -- initialization helpers ----------------------------------------------

def _uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_compressor(
    key: jax.Array, nsa: NSAConfig, kv_heads: int, dim_head: int
) -> Dict[str, jnp.ndarray]:
    """Initialize one compressor's parameters (called twice: K and V)."""
    block = nsa.compress_block_size
    kind = nsa.compressor
    keys = jax.random.split(key, 4)

    if kind == "mean":
        return {}

    if kind == "mlp":
        dim_in = dim_head * block
        hidden = int(dim_in * nsa.compress_mlp_expand_factor)
        return {
            "w1": _uniform(keys[0], (kv_heads, dim_in, hidden), dim_in),
            "b1": _uniform(keys[1], (kv_heads, hidden), dim_in),
            "w2": _uniform(keys[2], (kv_heads, hidden, dim_head), hidden),
            "b2": _uniform(keys[3], (kv_heads, dim_head), hidden),
        }

    if kind == "conv":
        fan_in = dim_head * block
        return {
            # [h, d_out, d_in, block]
            "w": _uniform(keys[0], (kv_heads, dim_head, dim_head, block), fan_in),
            "b": _uniform(keys[1], (kv_heads, dim_head), fan_in),
        }

    if kind == "attn":
        return {"w_logits": jnp.eye(dim_head, dtype=jnp.float32)}

    if kind == "shared_mlp":
        dim_in = dim_head * block
        hidden = int(dim_in * nsa.compress_mlp_expand_factor)
        return {
            "w1": _uniform(keys[0], (dim_in, hidden), dim_in),
            "b1": _uniform(keys[1], (hidden,), dim_in),
            "w2": _uniform(keys[2], (hidden, dim_head), hidden),
            "b2": _uniform(keys[3], (dim_head,), hidden),
        }

    if kind == "single":
        dim_in = dim_head * block
        return {"w": _uniform(keys[0], (dim_in, dim_head), dim_in)}

    if kind == "transformer":
        # stacked mini-transformer over the window tokens with last-token
        # readout (reference: compress_networks.py:227-269).  Heads are
        # mixed into one model dim = kv_heads * dim_head, so this
        # compressor is replicated (not head-sharded) under TP.
        dim = kv_heads * dim_head
        hidden = dim * 4
        num_layers = 2
        layers = []
        lk = jax.random.split(keys[0], num_layers)
        for i in range(num_layers):
            ks = jax.random.split(lk[i], 8)
            layers.append({
                "norm1": jnp.ones((dim,), jnp.float32),
                "norm2": jnp.ones((dim,), jnp.float32),
                "w_q": _uniform(ks[0], (dim, dim), dim),
                "b_q": _uniform(ks[1], (dim,), dim),
                "w_k": _uniform(ks[2], (dim, dim), dim),
                "b_k": _uniform(ks[3], (dim,), dim),
                "w_v": _uniform(ks[4], (dim, dim), dim),
                "b_v": _uniform(ks[5], (dim,), dim),
                "w_o": _uniform(ks[6], (dim, dim), dim),
                "b_o": jnp.zeros((dim,), jnp.float32),
                "w_f1": _uniform(ks[7], (dim, hidden), dim),
                "b_f1": jnp.zeros((hidden,), jnp.float32),
                "w_f2": _uniform(jax.random.fold_in(lk[i], 9), (hidden, dim), hidden),
                "b_f2": jnp.zeros((dim,), jnp.float32),
            })
        return {"layers": layers}

    raise ValueError(f"unknown compressor '{kind}'")


# -- application ----------------------------------------------------------

def apply_compressor(
    params: Dict[str, jnp.ndarray], kind: str, kv: jnp.ndarray
) -> jnp.ndarray:
    """Compress windows: [b, h, w, n, d] -> [b, h, w, d]."""
    b, h, w, n, d = kv.shape
    dtype = kv.dtype

    if kind == "mean":
        return kv.mean(axis=-2)

    if kind == "mlp":
        flat = kv.reshape(b, h, w, n * d)
        hid = jnp.einsum(
            "bhwi,hio->bhwo", flat, params["w1"].astype(dtype),
            preferred_element_type=jnp.float32,
        ) + params["b1"].astype(jnp.float32)[None, :, None, :]
        hid = jax.nn.relu(hid).astype(dtype)
        out = jnp.einsum(
            "bhwi,hio->bhwo", hid, params["w2"].astype(dtype),
            preferred_element_type=jnp.float32,
        ) + params["b2"].astype(jnp.float32)[None, :, None, :]
        return out.astype(dtype)

    if kind == "conv":
        out = jnp.einsum(
            "bhwnd,hodn->bhwo", kv, params["w"].astype(dtype),
            preferred_element_type=jnp.float32,
        ) + params["b"].astype(jnp.float32)[None, :, None, :]
        return out.astype(dtype)

    if kind == "attn":
        logits = jnp.einsum(
            "bhwnd,de->bhwne", kv, params["w_logits"].astype(dtype),
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(logits, axis=-2).astype(dtype)
        # per-output-dim pooling weights, matching the reference einsum
        # 'b h w n d, b h w n d -> b h w d' (compress_networks.py:67)
        return jnp.einsum("bhwnd,bhwnd->bhwd", kv, attn)

    if kind == "shared_mlp":
        flat = kv.reshape(b, h, w, n * d)
        hid = jax.nn.relu(
            flat @ params["w1"].astype(dtype)
            + params["b1"].astype(dtype)
        )
        return hid @ params["w2"].astype(dtype) + params["b2"].astype(dtype)

    if kind == "single":
        flat = kv.reshape(b, h, w, n * d)
        return flat @ params["w"].astype(dtype)

    if kind == "transformer":
        return _compress_transformer(params, kv)

    raise ValueError(f"unknown compressor '{kind}'")


def _rms(x, scale, eps=1e-6):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps) *
            scale.astype(jnp.float32)).astype(x.dtype)


def _compress_transformer(params, kv):
    """Mini-transformer over window tokens, last-token readout
    (reference: compress_networks.py:227-269)."""
    b, h, w, n, d = kv.shape
    dim = h * d
    num_heads = h
    dh = dim // num_heads
    # [b, h, w, n, d] -> [(b w), n, (h d)]
    x = kv.transpose(0, 2, 3, 1, 4).reshape(b * w, n, dim)
    layers = params["layers"]

    def attn(p, inp):
        q = (inp @ p["w_q"].astype(inp.dtype) + p["b_q"].astype(inp.dtype))
        k = (inp @ p["w_k"].astype(inp.dtype) + p["b_k"].astype(inp.dtype))
        v = (inp @ p["w_v"].astype(inp.dtype) + p["b_v"].astype(inp.dtype))
        bw = inp.shape[0]
        def split(t):
            return t.reshape(bw, n, num_heads, dh).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                         preferred_element_type=jnp.float32) * dh ** -0.5
        a = jax.nn.softmax(sim, -1).astype(inp.dtype)
        o = jnp.einsum("bhij,bhjd->bhid", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(bw, n, dim)
        return o @ p["w_o"].astype(inp.dtype) + p["b_o"].astype(inp.dtype)

    def ff(p, inp):
        hmid = jax.nn.gelu(
            inp @ p["w_f1"].astype(inp.dtype) + p["b_f1"].astype(inp.dtype),
            approximate=False,
        )
        return hmid @ p["w_f2"].astype(inp.dtype) + p["b_f2"].astype(inp.dtype)

    for p in layers[:-1]:
        x = x + attn(p, _rms(x, p["norm1"]))
        x = x + ff(p, _rms(x, p["norm2"]))
    last = layers[-1]
    x = x + attn(last, _rms(x, last["norm1"]))
    tok = x[:, -1]                                   # last-token readout
    tok = tok + ff(last, _rms(tok[:, None], last["norm2"]))[:, 0]
    # [(b w), dim] -> [b, h, w, d]
    return tok.reshape(b, w, h, d).transpose(0, 2, 1, 3)
