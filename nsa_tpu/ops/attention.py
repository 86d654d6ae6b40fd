"""Pure-JAX attention primitives: the correctness oracle for the Pallas kernels.

These implement, in straightforward XLA-friendly JAX:

* ``attend``                      — masked softmax attention with GQA
                                    (reference: native_sparse_attention.py:153-184)
* ``sliding_window_attention``    — exact banded causal local attention,
                                    replacing ``local_attention.LocalAttention``
                                    (reference: native_sparse_attention.py:250-257,850)
* ``fine_attention_reference``    — the NSA fine branch via block gather,
                                    the "vanilla" path of the reference
                                    (reference: native_sparse_attention.py:741-837)
* ``full_attention``              — dense causal attention for the baseline
                                    model (reference: transformer.py:138-141,175-178)

Everything here uses static shapes and no data-dependent Python control
flow, so it jits cleanly; the Pallas kernels in :mod:`nsa_tpu.ops.pallas`
are validated against these functions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .common import mask_value, repeat_kv, round_up_mult


def attend(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    return_sim: bool = False,
):
    """Masked softmax attention with grouped-query support.

    q: [b, h, i, d]; k, v: [b, kvh, j, d] with h divisible by kvh.
    ``mask`` broadcastable to [b, h, i, j]; True = attend.
    Returns out [b, h, i, d] (and, if requested, the *masked, scaled*
    logits [b, h, i, j] which NSA reuses as importance scores).
    """
    b, h, i, d = q.shape
    kvh = k.shape[1]
    g = h // kvh
    scale = d ** -0.5 if scale is None else scale

    qg = q.reshape(b, kvh, g, i, d)
    sim = jnp.einsum(
        "bhgid,bhjd->bhgij", qg, k, preferred_element_type=jnp.float32
    ) * scale

    if mask is not None:
        m = mask if mask.ndim == 2 else mask.reshape(b, kvh, g, i, -1)
        sim = jnp.where(m, sim, mask_value(jnp.float32))

    attn = jax.nn.softmax(sim, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgij,bhjd->bhgid", attn, v)
    out = out.reshape(b, h, i, d)

    if not return_sim:
        return out
    return out, sim.reshape(b, h, i, -1)


def full_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = True,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Dense (full) attention baseline with GQA. q [b,h,n,d], k/v [b,kvh,m,d]."""
    i, j = q.shape[-2], k.shape[-2]
    mask = None
    if causal and i > 1:
        # queries are the last i positions of the j keys
        qi = jnp.arange(i) + (j - i)
        kj = jnp.arange(j)
        mask = qi[:, None] >= kj[None, :]
    return attend(q, k, v, mask=mask, scale=scale)


def full_attention_chunked(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = True,
    scale: Optional[float] = None,
    chunk: int = 256,
) -> jnp.ndarray:
    """Dense attention evaluated per query chunk (exact, memory-bounded).

    Peak memory O(chunk * n) logits instead of O(n^2); the stop-gap for the
    full-attention baseline until the Pallas flash kernel, and the fallback
    for shapes the kernel does not cover.
    """
    b, h, n, d = q.shape
    if n <= chunk:
        return full_attention(q, k, v, causal=causal, scale=scale)
    Nc = round_up_mult(n, chunk)
    C = Nc // chunk
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Nc - n), (0, 0)))
    q_chunks = jnp.moveaxis(qp.reshape(b, h, C, chunk, d), 2, 0)
    pos = jnp.arange(Nc).reshape(C, chunk)
    kj = jnp.arange(n)

    def one(args):
        qc, pc = args
        mask = (pc[:, None] >= kj[None, :]) if causal else None
        return attend(qc, k, v, mask=mask, scale=scale)

    # remat per chunk: without it the backward saves every chunk's [chunk, n]
    # attention weights -> O(n^2) per layer residency, which OOMs seq-4096
    # full-attention training; recomputing them is the flash-style trade
    outs = jax.lax.map(jax.checkpoint(one), (q_chunks, pos))
    return jnp.moveaxis(outs, 0, 2).reshape(b, h, Nc, d)[:, :, :n]


def sliding_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window_size: int,
    causal: bool = True,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact banded local attention: query i attends keys j with
    ``0 <= i - j <= window_size`` (causal) or ``|i - j| <= window_size``.

    Equivalent to the reference's ``LocalAttention(exact_windowsize=True,
    causal=True)`` branch and its flex sliding mask (reference:
    native_sparse_attention.py:46-59).  Computed tile-wise so cost is
    O(n * window) rather than O(n^2).
    """
    b, h, n, d = q.shape
    kvh = k.shape[1]
    scale = d ** -0.5 if scale is None else scale

    T = max(min(window_size, n), 1)
    N = round_up_mult(n, T)
    W = N // T
    num_ctx = 2 if causal else 3

    pad_n = N - n
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad_n), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad_n), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad_n), (0, 0)))

    qt = qp.reshape(b, h, W, T, d)
    kt = kp.reshape(b, kvh, W, T, d)
    vt = vp.reshape(b, kvh, W, T, d)

    def shift(x, amt):
        # amt=+1: tile w sees tile w-1 (zeros for w=0)
        return jnp.roll(x, amt, axis=2).at[:, :, :max(amt, 0)].set(0.0) if amt > 0 else (
            jnp.roll(x, amt, axis=2).at[:, :, amt:].set(0.0) if amt < 0 else x
        )

    if causal:
        kctx = jnp.concatenate([shift(kt, 1), kt], axis=3)
        vctx = jnp.concatenate([shift(vt, 1), vt], axis=3)
        ctx_start = -T
    else:
        kctx = jnp.concatenate([shift(kt, 1), kt, shift(kt, -1)], axis=3)
        vctx = jnp.concatenate([shift(vt, 1), vt, shift(vt, -1)], axis=3)
        ctx_start = -T

    g = h // kvh
    qg = qt.reshape(b, kvh, g, W, T, d)
    sim = jnp.einsum(
        "bhgwrd,bhwcd->bhgwrc", qg, kctx, preferred_element_type=jnp.float32
    ) * scale

    r = jnp.arange(T)
    c = jnp.arange(num_ctx * T)
    w_ids = jnp.arange(W)
    qi = w_ids[:, None] * T + r[None, :]                      # [W, T]
    kj = w_ids[:, None] * T + ctx_start + c[None, :]          # [W, C]
    delta = qi[:, :, None] - kj[:, None, :]                   # [W, T, C]
    if causal:
        valid = (delta >= 0) & (delta <= window_size)
    else:
        valid = (delta >= -window_size) & (delta <= window_size)
    valid &= (kj >= 0)[:, None, :] & (kj < n)[:, None, :]

    sim = jnp.where(valid[None, None, None], sim, mask_value(jnp.float32))
    attn = jax.nn.softmax(sim, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgwrc,bhwcd->bhgwrd", attn, vctx)
    out = out.reshape(b, h, N, d)
    return out[:, :, :n]


def gather_blocks(blocks: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """blocks [b, H, W, B, d], idx [b, H, n, S] -> [b, H, n, S, B, d]."""
    return jax.vmap(jax.vmap(lambda bl, ix: bl[ix]))(blocks, idx)


def blockify_kv(k: jnp.ndarray, v: jnp.ndarray, block_size: int, Hs: int):
    """Pad K/V to a block multiple and reshape to [b, Hs, W, B, d]."""
    b, kvh, n, d = k.shape
    N = round_up_mult(n, block_size)
    pad = ((0, 0), (0, 0), (0, N - n), (0, 0))
    kb = jnp.pad(k, pad).reshape(b, kvh, N // block_size, block_size, d)
    vb = jnp.pad(v, pad).reshape(b, kvh, N // block_size, block_size, d)
    if Hs != kvh:
        W = N // block_size
        kb = repeat_kv(kb.reshape(b, kvh, N, d), Hs // kvh).reshape(b, Hs, W, block_size, d)
        vb = repeat_kv(vb.reshape(b, kvh, N, d), Hs // kvh).reshape(b, Hs, W, block_size, d)
    return kb, vb


def fine_attend_core(
    q: jnp.ndarray,
    kb: jnp.ndarray,
    vb: jnp.ndarray,
    sel_idx: jnp.ndarray,
    sel_mask: jnp.ndarray,
    gates: Optional[jnp.ndarray],
    positions: jnp.ndarray,
    causal: bool,
    scale: float,
) -> jnp.ndarray:
    """Fine attention for an arbitrary set of query rows.

    q: [b, h, m, d] (rotated queries at global ``positions`` [m]);
    kb/vb: [b, Hs, W, B, d] blockified keys/values;
    sel_idx / sel_mask / gates: [b, Hs, m, S].

    One softmax over the union of the selected blocks and (if causal) the
    block-causal diagonal at each query's own position.
    """
    b, h, m, d = q.shape
    _, Hs, W, B, _ = kb.shape
    S = sel_idx.shape[-1]

    if causal:
        diag_idx = jnp.clip(positions // B, 0, W - 1)
        sel_idx = jnp.concatenate(
            [sel_idx, jnp.broadcast_to(diag_idx[None, None, :, None], (b, Hs, m, 1))],
            axis=-1,
        )
        col = jnp.arange(B)
        # global column index of the diagonal block vs the query position
        diag_cols = (diag_idx[:, None] * B + col[None, :]) <= positions[:, None]
        slot_mask = jnp.concatenate(
            [
                jnp.broadcast_to(sel_mask[..., None], (b, Hs, m, S, B)),
                jnp.broadcast_to(diag_cols[None, None, :, None, :], (b, Hs, m, 1, B)),
            ],
            axis=-2,
        )                                                            # [b,Hs,m,S+1,B]
        if gates is not None:
            gates = jnp.concatenate(
                [gates, jnp.ones((b, Hs, m, 1), gates.dtype)], axis=-1
            )
        S_tot = S + 1
    else:
        slot_mask = jnp.broadcast_to(sel_mask[..., None], (b, Hs, m, S, B))
        S_tot = S

    fk = gather_blocks(kb, sel_idx)                                  # [b,Hs,m,S_tot,B,d]
    fv = gather_blocks(vb, sel_idx)
    if gates is not None:
        fk = fk * gates[..., None, None].astype(fk.dtype)

    G = h // Hs
    qg = q.reshape(b, Hs, G, m, d)
    fk = fk.reshape(b, Hs, m, S_tot * B, d)
    fv = fv.reshape(b, Hs, m, S_tot * B, d)
    slot_mask = slot_mask.reshape(b, Hs, 1, m, S_tot * B)

    sim = jnp.einsum(
        "bhgnd,bhnjd->bhgnj", qg, fk, preferred_element_type=jnp.float32
    ) * scale
    sim = jnp.where(slot_mask, sim, mask_value(jnp.float32))
    attn = jax.nn.softmax(sim, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgnj,bhnjd->bhgnd", attn, fv)
    return out.reshape(b, h, m, d)


def fine_attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    sel_idx: jnp.ndarray,
    sel_mask: jnp.ndarray,
    gates: Optional[jnp.ndarray],
    selection_block_size: int,
    causal: bool = True,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """NSA fine branch over all rows at once: the correctness oracle.

    Mirrors the reference's "vanilla" gather path (reference:
    native_sparse_attention.py:741-837) including the straight-through
    top-k gates multiplying the gathered keys (reference:
    native_sparse_attention.py:793-797).

    q: [b, h, n, d] (already rotary-rotated); k, v: [b, kvh, n, d].
    sel_idx / sel_mask / gates: [b, Hs, n, S] where Hs = kv_heads when
    query heads share selection, else Hs = heads.
    """
    n, d = q.shape[2], q.shape[3]
    Hs = sel_idx.shape[1]
    scale = d ** -0.5 if scale is None else scale
    kb, vb = blockify_kv(k, v, selection_block_size, Hs)
    return fine_attend_core(
        q, kb, vb, sel_idx, sel_mask, gates, jnp.arange(n), causal, scale
    )
