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
