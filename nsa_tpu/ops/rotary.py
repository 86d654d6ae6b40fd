"""Rotary position embeddings.

JAX reimplementation of the subset of ``rotary_embedding_torch`` used by the
reference (reference: native_sparse_attention.py:14,238,384-385,643):

* ``rotate_queries_or_keys(t, offset)`` — rotate with an absolute position
  offset (used by the decode path, reference: native_sparse_attention.py:384).
* ``rotate_queries_with_cached_keys(q, k)`` — rotate q and k jointly at
  positions ``0..n`` (training/prefill, reference:
  native_sparse_attention.py:643).

Uses the interleaved-pair convention of ``rotary_embedding_torch`` where
adjacent feature pairs ``(x0, x1)`` are rotated together.  The NSA-specific
rule that **compression inputs are never rotated** (reference:
native_sparse_attention.py:377-385, arXiv 2501.18795) lives at the call
sites in :mod:`nsa_tpu.ops.nsa`, not here.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_frequencies(dim_head: int, theta: float = 10000.0) -> jnp.ndarray:
    """Per-pair inverse frequencies, shape [dim_head // 2]."""
    exponent = jnp.arange(0, dim_head, 2, dtype=jnp.float32) / dim_head
    return 1.0 / (theta ** exponent)


def rope_angles(
    positions: jnp.ndarray, dim_head: int, theta: float = 10000.0
) -> jnp.ndarray:
    """Angles for given integer positions; shape [*positions.shape, dim_head // 2]."""
    inv_freq = rope_frequencies(dim_head, theta)
    return positions.astype(jnp.float32)[..., None] * inv_freq


def apply_rotary(x: jnp.ndarray, positions: jnp.ndarray, theta: float = 10000.0):
    """Rotate the last dim of ``x`` ([..., n, d]) at integer ``positions`` ([n]).

    Interleaved convention: pairs (x[..., 2i], x[..., 2i+1]) rotate by
    angle positions * inv_freq[i].
    """
    d = x.shape[-1]
    angles = rope_angles(positions, d, theta)  # [n, d//2]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_pairs = xf.reshape(*xf.shape[:-1], d // 2, 2)
    x0 = x_pairs[..., 0]
    x1 = x_pairs[..., 1]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    out = jnp.stack([r0, r1], axis=-1).reshape(xf.shape)
    return out.astype(orig_dtype)


def rotate_at_offset(x: jnp.ndarray, offset, theta: float = 10000.0):
    """Rotate [..., n, d] starting at absolute position ``offset``.

    ``offset`` may be a traced scalar (decode path).
    """
    n = x.shape[-2]
    positions = jnp.arange(n) + offset
    return apply_rotary(x, positions, theta)


def rotate_at_row_offsets(x: jnp.ndarray, offsets: jnp.ndarray,
                          theta: float = 10000.0):
    """Rotate x [b, H, 1, d] with PER-ROW absolute positions offsets [b].

    The ragged-decode equivalent of ``rotate_at_offset``: row i rotates at
    its own cache position (continuous-batching slots each have their own
    sequence length)."""
    b, H, n, d = x.shape
    assert n == 1 and offsets.shape == (b,)
    angles = rope_angles(offsets, d, theta)        # [b, d//2]
    cos = jnp.cos(angles)[:, None, None]           # [b, 1, 1, d//2]
    sin = jnp.sin(angles)[:, None, None]
    xf = x.astype(jnp.float32)
    x_pairs = xf.reshape(b, H, n, d // 2, 2)
    x0 = x_pairs[..., 0]
    x1 = x_pairs[..., 1]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    out = jnp.stack([r0, r1], axis=-1).reshape(b, H, n, d)
    return out.astype(x.dtype)


def rotate_qk(q: jnp.ndarray, k: jnp.ndarray, theta: float = 10000.0):
    """Rotate q and k jointly at positions [0, n) (training / prefill)."""
    n = q.shape[-2]
    positions = jnp.arange(n)
    return apply_rotary(q, positions, theta), apply_rotary(k, positions, theta)
