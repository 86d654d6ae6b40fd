"""Attention primitive tests: dense oracles for sliding / fine / full paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_tpu.ops.attention import (
    attend,
    fine_attention_reference,
    full_attention,
    sliding_window_attention,
)


def dense_reference(q, k, v, mask, scale=None):
    """Plain softmax attention with a boolean mask, numpy."""
    q, k, v = map(np.asarray, (q, k, v))
    b, h, n, d = q.shape
    kvh = k.shape[1]
    g = h // kvh
    scale = d ** -0.5 if scale is None else scale
    out = np.zeros_like(q)
    for bi in range(b):
        for hi in range(h):
            kh = hi // g
            sim = q[bi, hi] @ k[bi, kh].T * scale
            sim = np.where(mask[bi, hi], sim, -1e30)
            sim = sim - sim.max(-1, keepdims=True)
            p = np.exp(sim)
            p = p / p.sum(-1, keepdims=True)
            out[bi, hi] = p @ v[bi, kh]
    return out


class TestAttend:
    def test_gqa_matches_dense(self):
        b, h, kvh, n, d = 2, 4, 2, 6, 8
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, h, n, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, kvh, n, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, kvh, n, d))
        mask = jnp.tril(jnp.ones((n, n), bool))
        out = attend(q, k, v, mask=mask)
        want = dense_reference(q, k, v, np.broadcast_to(np.asarray(mask), (b, h, n, n)))
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)

    def test_returns_masked_scaled_sim(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 3, 4))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 5, 4))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 5, 4))
        _, sim = attend(q, k, v, return_sim=True)
        want = np.einsum("bhid,bhjd->bhij", q, k) * 4 ** -0.5
        np.testing.assert_allclose(np.asarray(sim), want, rtol=1e-4, atol=1e-5)


class TestFullAttention:
    def test_causal(self):
        b, h, kvh, n, d = 1, 4, 2, 7, 8
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, kvh, n, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, kvh, n, d))
        out = full_attention(q, k, v, causal=True)
        mask = np.broadcast_to(np.tril(np.ones((n, n), bool)), (b, h, n, n))
        want = dense_reference(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


class TestSlidingWindow:
    @pytest.mark.parametrize("n,window", [(16, 4), (13, 4), (8, 16), (20, 7), (5, 1)])
    def test_matches_dense_band(self, n, window):
        b, h, kvh, d = 2, 4, 2, 8
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, kvh, n, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, kvh, n, d))
        out = sliding_window_attention(q, k, v, window, causal=True)
        i = np.arange(n)[:, None]
        j = np.arange(n)[None, :]
        band = (i - j >= 0) & (i - j <= window)
        want = dense_reference(q, k, v, np.broadcast_to(band, (b, h, n, n)))
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)

    def test_noncausal(self):
        b, h, n, d, window = 1, 2, 12, 4, 3
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, n, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, n, d))
        out = sliding_window_attention(q, k, v, window, causal=False)
        i = np.arange(n)[:, None]
        j = np.arange(n)[None, :]
        band = np.abs(i - j) <= window
        want = dense_reference(q, k, v, np.broadcast_to(band, (b, h, n, n)))
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def fine_oracle(q, k, v, sel_idx, sel_mask, gates, B, causal, scale=None):
    """Brute-force per-query fine attention over (selected ∪ diagonal)."""
    q, k, v = map(np.asarray, (q, k, v))
    sel_idx = np.asarray(sel_idx)
    sel_mask = np.asarray(sel_mask)
    gates = None if gates is None else np.asarray(gates)
    b, h, n, d = q.shape
    kvh = k.shape[1]
    Hs, S = sel_idx.shape[1], sel_idx.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    out = np.zeros_like(q)
    for bi in range(b):
        for hi in range(h):
            hs = hi // (h // Hs)
            kh = hi // (h // kvh)
            for i in range(n):
                cols, ws = [], []
                for s in range(S):
                    if sel_mask[bi, hs, i, s]:
                        blk = int(sel_idx[bi, hs, i, s])
                        gate = 1.0 if gates is None else float(gates[bi, hs, i, s])
                        for j in range(blk * B, blk * B + B):
                            cols.append(j)
                            ws.append(gate)
                if causal:
                    blk = i // B
                    for j in range(blk * B, i + 1):
                        cols.append(j)
                        ws.append(1.0)
                kk = np.array(
                    [k[bi, kh, j] * w if j < n else np.zeros(d) for j, w in zip(cols, ws)]
                )
                vv = np.array([v[bi, kh, j] if j < n else np.zeros(d) for j in cols])
                sim = kk @ q[bi, hi, i] * scale
                sim -= sim.max()
                p = np.exp(sim)
                p /= p.sum()
                out[bi, hi, i] = p @ vv
    return out


class TestFineAttention:
    @pytest.mark.parametrize("n", [16, 13, 7])
    @pytest.mark.parametrize("use_gates", [False, True])
    def test_matches_oracle_shared(self, n, use_gates):
        b, h, kvh, d, B, S = 2, 4, 2, 8, 4, 2
        W = -(-n // B)
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, h, n, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, kvh, n, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, kvh, n, d))
        # random, valid (strictly-past complete blocks) selection per query
        rng = np.random.RandomState(0)
        sel_idx = np.zeros((b, kvh, n, S), np.int32)
        sel_mask = np.zeros((b, kvh, n, S), bool)
        for bi in range(b):
            for hh in range(kvh):
                for i in range(n):
                    avail = max(i // B, 0)
                    for s in range(S):
                        if avail > 0 and rng.rand() > 0.3:
                            sel_idx[bi, hh, i, s] = rng.randint(0, avail)
                            sel_mask[bi, hh, i, s] = True
        gates = (
            jnp.asarray(rng.rand(b, kvh, n, S).astype(np.float32)) if use_gates else None
        )
        # forward value of straight-through gates is 1.0; emulate by passing
        # ones (gradient path is tested separately)
        fwd_gates = None if gates is None else jnp.ones_like(gates)
        out = fine_attention_reference(
            q, k, v, jnp.asarray(sel_idx), jnp.asarray(sel_mask), fwd_gates, B,
            causal=True,
        )
        want = fine_oracle(q, k, v, sel_idx, sel_mask, None, B, causal=True)
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)

    def test_no_selection_is_block_causal(self):
        b, h, n, d, B = 1, 2, 11, 4, 4
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, n, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, n, d))
        empty_i = jnp.zeros((b, h, n, 0), jnp.int32)
        empty_m = jnp.zeros((b, h, n, 0), bool)
        out = fine_attention_reference(q, k, v, empty_i, empty_m, None, B, causal=True)
        i = np.arange(n)[:, None]
        j = np.arange(n)[None, :]
        mask = (i // B == j // B) & (i >= j)
        want = dense_reference(q, k, v, np.broadcast_to(mask, (b, h, n, n)))
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)

    def test_gate_gradient_flows_to_gates(self):
        b, h, n, d, B, S = 1, 2, 8, 4, 4, 1
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, n, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, n, d))
        sel_idx = jnp.zeros((b, h, n, S), jnp.int32)
        sel_mask = jnp.ones((b, h, n, S), bool)
        def f(g):
            return fine_attention_reference(
                q, k, v, sel_idx, sel_mask, g, B, causal=True
            ).sum()
        g = jax.grad(f)(jnp.ones((b, h, n, S)))
        assert float(jnp.abs(g).max()) > 0


class TestFullAttentionChunked:
    @pytest.mark.parametrize("n,chunk", [(300, 64), (128, 64), (60, 64)])
    def test_matches_flat(self, n, chunk):
        from nsa_tpu.ops.attention import full_attention_chunked

        b, h, kvh, d = 1, 4, 2, 8
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, kvh, n, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, kvh, n, d))
        got = full_attention_chunked(q, k, v, causal=True, chunk=chunk)
        want = full_attention(q, k, v, causal=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )
