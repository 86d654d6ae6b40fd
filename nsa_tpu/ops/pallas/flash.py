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
4096 x 64 bf16 = 512 KB), which is the right trade below ~16k context.
At ``STREAM_MIN_NK`` and beyond the kernel switches to a streaming
variant: K/V packed as ``k||v`` on the lane dim (2d, 128-aligned — Mosaic
requires manual-DMA slices to be 128-aligned in the lane dim) stay in HBM
and flow through a double-buffered VMEM scratch, so per-program VMEM is
O(block_q + block_k) and context is bounded only by HBM.  q is zero-padded
to 2d lanes so the v half contracts to zero in q @ kv^T; the v-half
columns of p @ kv are the output, sliced outside the kernel.
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


# K/V rows at least this long use the HBM-streaming kernel
from .runtime import STREAM_MIN_NK  # noqa: E402  (shared threshold)


def _flash_kernel_stream(q_ref, kv_ref, o_ref, kv_s, sem_kv, *, scale,
                         causal, block_k, n_q, n_k, group):
    """Long-context variant: kv_ref is k||v packed on the lane dim
    ([b, kvh, nk_pad, 2d]) in HBM, streamed through double-buffered VMEM
    scratch; q arrives zero-padded to 2d lanes, so q @ kv^T = q @ k^T and
    the v-half columns of p @ kv are the output."""
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    qi = pl.program_id(2)
    kv_head = hi // group
    block_q = q_ref.shape[2]
    d2 = q_ref.shape[3]                                    # 2 * d

    q = q_ref[0, 0].astype(jnp.float32) * scale            # [Tq, 2d]
    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    num_kb = pl.cdiv(n_k, block_k)
    if causal:
        num_kb_live = jnp.minimum(
            num_kb, ((qi + 1) * block_q + block_k - 1) // block_k
        )
    else:
        num_kb_live = num_kb

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            kv_ref.at[bi, kv_head, pl.ds(i * block_k, block_k), :],
            kv_s.at[slot],
            sem_kv.at[slot],
        )

    get_dma(0, 0).start()

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < num_kb_live)
        def _():
            get_dma(1 - slot, i + 1).start()

        get_dma(slot, i).wait()
        kvblk = kv_s[slot].astype(jnp.float32)             # [Bk, 2d]
        s = jax.lax.dot_general(
            q, kvblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [Tq, Bk] = q @ k^T
        k_pos = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        valid = k_pos < n_k
        if causal:
            valid = valid & (q_pos >= k_pos)
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, kvblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [Tq, 2d]
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d2), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb_live, body, (m0, l0, acc0))

    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "interpret",
                     "stream"),
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
    stream: Optional[bool] = None,
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

    if stream is None:
        stream = n_k >= STREAM_MIN_NK
    stream = stream and (2 * d) % 128 == 0
    grid = (b, h, n_pad // block_q)
    d_out = 2 * d if stream else d
    q_spec = pl.BlockSpec((1, 1, block_q, d_out),
                          lambda bi, hi, qi: (bi, hi, qi, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, 1, block_q, d_out),
                          lambda bi, hi, qi: (bi, hi, qi, 0),
                          memory_space=pltpu.VMEM)
    if stream:
        kvpack = jnp.concatenate([k, v], axis=-1)          # [b,kvh,nk_pad,2d]
        qp = jnp.pad(q, ((0, 0),) * 3 + ((0, d),))         # zero v-half lanes
        kernel = functools.partial(
            _flash_kernel_stream, scale=scale, causal=causal,
            block_k=block_k, n_q=n, n_k=n_k, group=group,
        )
        in_specs = [q_spec, pl.BlockSpec(memory_space=pl.ANY)]
        operands = (qp, kvpack)
        scratch = [pltpu.VMEM((2, block_k, 2 * d), k.dtype),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        kernel = functools.partial(
            _flash_kernel, scale=scale, causal=causal, block_k=block_k,
            n_q=n, n_k=n_k,
        )
        kv_spec = pl.BlockSpec((1, 1, nk_pad, d),
                               lambda bi, hi, qi: (bi, hi // group, 0, 0),
                               memory_space=pltpu.VMEM)
        in_specs = [q_spec, kv_spec, kv_spec]
        operands = (q, k, v)
        scratch = []

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d_out), q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    if stream:
        out = out[..., d:]                                 # v-half columns
    return out[:, :, :n]
