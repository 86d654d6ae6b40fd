"""Pallas kernels vs pure-JAX oracles (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_tpu.ops.attention import full_attention
from nsa_tpu.ops.pallas.flash import flash_attention
from nsa_tpu.ops.pallas.paged_gather import paged_gather


class TestFlashAttention:
    @pytest.mark.parametrize("n,causal", [(256, True), (300, True), (256, False),
                                          (128, True)])
    def test_matches_oracle(self, n, causal):
        b, h, kvh, d = 2, 4, 2, 64
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, kvh, n, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, kvh, n, d))
        got = flash_attention(
            q, k, v, causal=causal, interpret=True, block_q=128, block_k=128
        )
        want = full_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    def test_bf16(self):
        b, h, n, d = 1, 2, 256, 64
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, n, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, n, d), jnp.bfloat16)
        got = flash_attention(q, k, v, causal=True, interpret=True)
        want = full_attention(q, k, v, causal=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=5e-2, atol=5e-2,
        )


class TestFlashStreaming:
    """HBM-streaming long-context flash variant (k||v packed on the lane
    dim, double-buffered DMA) must match the whole-row VMEM kernel
    bit-for-bit given the same tiling — the math is identical, only the
    K/V residency changes."""

    @pytest.mark.parametrize("n,causal", [(512, True), (384, False)])
    def test_stream_matches_resident(self, n, causal):
        b, h, kvh, d = 1, 4, 2, 64
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, kvh, n, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, kvh, n, d))
        kw = dict(causal=causal, interpret=True, block_q=128, block_k=128)
        want = flash_attention(q, k, v, stream=False, **kw)
        got = flash_attention(q, k, v, stream=True, **kw)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
        )


class TestPagedGather:
    def test_matches_numpy(self):
        b, kvh, L, d, B = 2, 3, 64, 16, 8
        cache = jax.random.normal(jax.random.PRNGKey(0), (b, kvh, L, d))
        idx = jax.random.randint(jax.random.PRNGKey(1), (b, kvh, 5), 0, L // B)
        got = paged_gather(cache, idx, B, interpret=True)
        kb = np.asarray(cache).reshape(b, kvh, L // B, B, d)
        idx_np = np.asarray(idx)
        want = np.stack([
            [kb[bi, hi][idx_np[bi, hi]].reshape(-1, d) for hi in range(kvh)]
            for bi in range(b)
        ])
        np.testing.assert_array_equal(np.asarray(got), want)


class TestPallasDecodePath:
    def test_decode_matches_xla_impl(self):
        """attn_impl='pallas' decode (paged gather) == 'xla' decode."""
        from nsa_tpu.config import tiny_test_config
        from nsa_tpu.models.transformer import (
            init_transformer,
            transformer_decode_step,
            transformer_prefill,
        )

        cfg_x = tiny_test_config()
        cfg_p = tiny_test_config(attn_impl="pallas")
        params = init_transformer(jax.random.PRNGKey(0), cfg_x)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 18), 0, 256)

        import jax.experimental.pallas as _pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu

        def run(cfg):
            logits, cache = transformer_prefill(params, cfg, ids[:, :10], 32)
            outs = []
            for t in range(10, 18):
                logits, cache = transformer_decode_step(params, cfg, ids[:, t], cache)
                outs.append(np.asarray(logits))
            return np.stack(outs)

        want = run(cfg_x)
        with pltpu.force_tpu_interpret_mode():
            got = run(cfg_p)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestFineSlidingMultiTile:
    """The streamed fused kernel across MULTIPLE q and k tiles (slot
    cycling, kv-major qt0 offsets): forward and gradients must match the
    XLA oracle.  Default blocks (128/512) make small tests single-tile, so
    block sizes are forced down here."""

    def _inputs(self, n=160, d=16, S=2, sel_block=8):
        b, h, kvh = 1, 4, 2
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 5)
        rq = jax.random.normal(ks[0], (b, h, n, d)) * 0.5
        rk = jax.random.normal(ks[1], (b, kvh, n, d)) * 0.5
        v = jax.random.normal(ks[2], (b, kvh, n, d)) * 0.5
        # kernel contract: selection never includes the diagonal block and
        # indices are DISTINCT per row (the masked union cannot express the
        # gather path's double-counting of duplicate/diagonal blocks), so
        # draw distinct strictly-past blocks and invalidate the rest
        assert S == 2
        q_blk = jnp.arange(n) // sel_block                      # [n]
        avail = jnp.maximum(q_blk, 1)[None, None, :]
        raw = jax.random.randint(ks[3], (b, kvh, n, 2), 0, 1 << 30)
        idx0 = raw[..., 0] % avail
        idx1 = (idx0 + 1 + raw[..., 1] % jnp.maximum(avail - 1, 1)) % avail
        sel_idx = jnp.stack([idx0, idx1], axis=-1)
        bern = jax.random.bernoulli(ks[4], 0.8, (b, kvh, n, S))
        ok0 = (q_blk > 0)[None, None, :]
        ok1 = (q_blk > 1)[None, None, :]
        sel_mask = bern & jnp.stack([ok0, ok1], axis=-1)
        return rq, rk, v, sel_idx.astype(jnp.int32), sel_mask

    def test_forward_and_grads_match_oracle(self):
        from nsa_tpu.ops.pallas import nsa_prefill as mod

        rq, rk, v, sel_idx, sel_mask = self._inputs()
        sel_block, window, scale = 8, 12, 0.25

        def run(impl_oracle):
            def f(q_, k_, v_):
                if impl_oracle:
                    fo, so = mod._oracle(
                        q_, k_, v_, sel_idx, sel_mask, None, sel_block,
                        window, scale,
                    )
                else:
                    fo, so = mod.nsa_fine_sliding_attention(
                        q_, k_, v_, sel_idx, sel_mask, None, sel_block,
                        window, scale, 32, 64, True,
                    )
                return (fo ** 2).sum() + (so * 0.5).sum()

            return jax.value_and_grad(f, argnums=(0, 1, 2))(rq, rk, v)

        want, gw = run(True)
        got, gg = run(False)
        assert float(want) == pytest.approx(float(got), rel=1e-4)
        for a, b_ in zip(gw, gg):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=5e-4, atol=1e-4
            )


class TestNSAPrefillStreaming:
    """FORCE_STREAM drives the HBM-streaming NSA forward (d=64 so k||v
    packs to 128 lanes); value and straight-through grads must match the
    VMEM-resident kernel, and the VJP (block-mapped backward over the
    streamed forward's residuals) must match the oracle."""

    def test_stream_matches_resident_with_grads(self, monkeypatch):
        from nsa_tpu.ops.pallas import nsa_prefill as mod

        b, h, kvh, n, d, S, sel_block = 1, 4, 2, 256, 64, 2, 16
        key = jax.random.PRNGKey(7)
        ks = jax.random.split(key, 5)
        rq = jax.random.normal(ks[0], (b, h, n, d)) * 0.5
        rk = jax.random.normal(ks[1], (b, kvh, n, d)) * 0.5
        v = jax.random.normal(ks[2], (b, kvh, n, d)) * 0.5
        q_blk = jnp.arange(n) // sel_block
        avail = jnp.maximum(q_blk, 1)[None, None, :]
        raw = jax.random.randint(ks[3], (b, kvh, n, 2), 0, 1 << 30)
        idx0 = raw[..., 0] % avail
        idx1 = (idx0 + 1 + raw[..., 1] % jnp.maximum(avail - 1, 1)) % avail
        sel_idx = jnp.stack([idx0, idx1], axis=-1).astype(jnp.int32)
        bern = jax.random.bernoulli(ks[4], 0.8, (b, kvh, n, S))
        ok = jnp.stack([(q_blk > 0)[None, None, :],
                        (q_blk > 1)[None, None, :]], axis=-1)
        sel_mask = bern & ok

        def f(q_, k_, v_):
            fo, so = mod.nsa_fine_sliding_attention(
                q_, k_, v_, sel_idx, sel_mask, None, sel_block, 24, 0.125,
                64, 128, True,
            )
            return (fo ** 2).sum() + (so * 0.5).sum()

        monkeypatch.setattr(mod, "FORCE_STREAM", False)
        want, gw = jax.value_and_grad(f, argnums=(0, 1, 2))(rq, rk, v)
        monkeypatch.setattr(mod, "FORCE_STREAM", True)
        got, gg = jax.value_and_grad(f, argnums=(0, 1, 2))(rq, rk, v)
        assert float(want) == pytest.approx(float(got), rel=1e-5)
        for a, b_ in zip(gw, gg):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-5
            )
