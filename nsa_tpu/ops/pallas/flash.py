"""Fused flash attention (forward) for TPU in Pallas.

Online-softmax attention with GQA and causal masking, replacing the dense
XLA attention for the full-attention baseline (reference: torch SDPA,
transformer.py:138-141,175-178) and serving as the template for the NSA
prefill kernel.

Design (v5e):
* grid (b, h, n_q_tiles); each program owns one [block_q, d] query tile of
  one query head and streams the K/V of its KV head (index map ``h -> h //
  group``) through VMEM in [block_k, d] tiles with a fori_loop carrying the
  online-softmax state (m, l, acc) — the classic flash recurrence;
* causal programs stop the K loop at the diagonal tile, so work is
  triangular, not square;
* logits and the accumulator stay in fp32 (MXU ``preferred_element_type``),
  inputs may be bf16.

K/V for one (batch, kv-head) are held in VMEM whole (n * d * 2 bytes;
4096 x 64 bf16 = 512 KB), which is the right trade below ~16k context;
longer contexts should tile K/V through the grid instead.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..common import round_up_mult

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, causal, block_k,
                  n_q, n_k):
    """One [block_q, d] query tile vs all K/V of its kv head."""
    qi = pl.program_id(2)
    block_q = q_ref.shape[2]
    d = q_ref.shape[3]

    q = q_ref[0, 0].astype(jnp.float32) * scale            # [Tq, d]
    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    num_kb = pl.cdiv(n_k, block_k)
    if causal:
        # last tile index that intersects the causal triangle for this q tile
        num_kb_live = jnp.minimum(
            num_kb, ((qi + 1) * block_q + block_k - 1) // block_k
        )
    else:
        num_kb_live = num_kb

    def body(i, carry):
        m, l, acc = carry
        kblk = k_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vblk = v_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # [Tq, Bk]
        k_pos = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        valid = k_pos < n_k
        if causal:
            valid = valid & (q_pos >= k_pos)
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # explicit zero under the mask: a fully-masked tile with m == NEG_INF
        # would otherwise contribute exp(0) = 1 per column
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, vblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb_live, body, (m0, l0, acc0))

    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "scale", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """q [b, h, n, d]; k, v [b, kvh, nk, d] -> [b, h, n, d]."""
    from .runtime import resolve_interpret
    interpret = resolve_interpret(interpret)
    b, h, n, d = q.shape
    _, kvh, n_k, _ = k.shape
    group = h // kvh
    scale = d ** -0.5 if scale is None else scale

    block_q = min(block_q, round_up_mult(n, 128))
    block_k = min(block_k, round_up_mult(n_k, 128))
    n_pad = round_up_mult(n, block_q)
    nk_pad = round_up_mult(n_k, block_k)
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    if nk_pad != n_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, nk_pad - n_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, nk_pad - n_k), (0, 0)))

    grid = (b, h, n_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, causal=causal, block_k=block_k,
            n_q=n, n_k=n_k,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk_pad, d), lambda bi, hi, qi: (bi, hi // group, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk_pad, d), lambda bi, hi, qi: (bi, hi // group, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :n]
