"""Prefill/decode equivalence: the training-path forward at position t must
equal the incremental cached decode at position t.

The reference has two independent codepaths that can silently drift
(native_sparse_attention.py:338 ``forward_inference`` vs :549 ``forward``)
and no test that they agree (SURVEY.md section 4); these tests pin our two
paths together exactly, across awkward sequence lengths that exercise the
compression run-buffer overlap retention and partial fine blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_tpu.config import NSAConfig, tiny_test_config
from nsa_tpu.models.transformer import (
    init_transformer,
    transformer_decode_step,
    transformer_forward,
    transformer_prefill,
)


def decode_logits(params, cfg, ids, prompt_len, max_len):
    """Prefill ``prompt_len`` tokens then decode the rest one at a time.

    Returns logits for every position >= prompt_len - 1 (the prefill's last
    logit plus each decode step's logit).
    """
    _, n = ids.shape
    logits_p, cache = transformer_prefill(params, cfg, ids[:, :prompt_len], max_len)
    outs = [np.asarray(logits_p[:, -1])]
    step = jax.jit(
        lambda tok, c: transformer_decode_step(params, cfg, tok, c),
    )
    for t in range(prompt_len, n):
        logits, cache = step(ids[:, t], cache)
        outs.append(np.asarray(logits))
    return np.stack(outs, axis=1)  # [b, n - prompt_len + 1, vocab]


@pytest.mark.parametrize("use_sparse", [True, False])
@pytest.mark.parametrize("n,prompt_len", [(24, 8), (19, 5), (17, 16)])
def test_prefill_decode_matches_full_forward(use_sparse, n, prompt_len):
    cfg = tiny_test_config(use_sparse_attn=use_sparse)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, n), 0, cfg.vocab_size)

    full = np.asarray(transformer_forward(params, cfg, ids))
    max_len = 32
    inc = decode_logits(params, cfg, ids, prompt_len, max_len)

    want = full[:, prompt_len - 1:]
    np.testing.assert_allclose(inc, want, rtol=2e-4, atol=2e-4)


def test_decode_across_compress_emission_boundary():
    """Decoding across the point where the run buffer fills and a new
    compressed block is emitted (with overlap retention) must stay exact."""
    cfg = tiny_test_config()
    nsa = cfg.nsa
    # choose lengths so decode crosses several emission points
    n = nsa.compress_block_size * 4 + 3
    params = init_transformer(jax.random.PRNGKey(2), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, n), 0, cfg.vocab_size)
    full = np.asarray(transformer_forward(params, cfg, ids))
    inc = decode_logits(params, cfg, ids, prompt_len=2, max_len=32)
    np.testing.assert_allclose(inc, full[:, 1:], rtol=2e-4, atol=2e-4)


def test_decode_no_overlap_config():
    """compress stride == block size (no overlap retention)."""
    cfg = tiny_test_config(
        nsa=NSAConfig(
            sliding_window_size=8,
            compress_block_size=4,
            compress_block_sliding_stride=4,
            selection_block_size=4,
            num_selected_blocks=2,
            compressor="mean",
        )
    )
    params = init_transformer(jax.random.PRNGKey(4), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, 21), 0, cfg.vocab_size)
    full = np.asarray(transformer_forward(params, cfg, ids))
    inc = decode_logits(params, cfg, ids, prompt_len=3, max_len=32)
    np.testing.assert_allclose(inc, full[:, 2:], rtol=2e-4, atol=2e-4)


def test_decode_from_scratch_prefill_of_one():
    """Prefill of a single token then decode everything."""
    cfg = tiny_test_config()
    params = init_transformer(jax.random.PRNGKey(6), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(7), (1, 15), 0, cfg.vocab_size)
    full = np.asarray(transformer_forward(params, cfg, ids))
    inc = decode_logits(params, cfg, ids, prompt_len=1, max_len=16)
    np.testing.assert_allclose(inc, full[:, 0:], rtol=2e-4, atol=2e-4)


class TestRaggedDecode:
    """transformer_decode_step_ragged (per-row positions) vs the scalar
    step: uniform lengths must match exactly; mixed lengths must match
    per-row scalar steps on singleton slices."""

    @pytest.mark.parametrize("impl", ["xla", "pallas"])
    def test_uniform_ragged_matches_scalar(self, impl):
        from nsa_tpu.models.transformer import (
            init_model_cache,
            transformer_decode_step,
            transformer_decode_step_ragged,
        )

        cfg = tiny_test_config(attn_impl=impl)
        params = init_transformer(jax.random.PRNGKey(0), cfg)
        b, t0, max_len = 4, 13, 32
        ids = jax.random.randint(jax.random.PRNGKey(1), (b, t0), 0, 256)
        _, cache = transformer_prefill(params, cfg, ids, max_len)
        tok = jnp.asarray(np.arange(b), jnp.int32)

        logits_s, cache_s = transformer_decode_step(params, cfg, tok, cache)
        seq_lens = jnp.full((b,), t0, jnp.int32)
        logits_r, layers_r = transformer_decode_step_ragged(
            params, cfg, tok, cache.layers, seq_lens
        )
        np.testing.assert_allclose(
            np.asarray(logits_r), np.asarray(logits_s), rtol=2e-4, atol=2e-4
        )
        for lr, ls in zip(
            jax.tree_util.tree_leaves(layers_r),
            jax.tree_util.tree_leaves(cache_s.layers),
        ):
            np.testing.assert_allclose(
                np.asarray(lr), np.asarray(ls), rtol=2e-4, atol=2e-4
            )

    @pytest.mark.parametrize("impl", ["xla", "pallas"])
    def test_mixed_ragged_matches_per_row_scalar(self, impl):
        from nsa_tpu.models.transformer import (
            ModelCache,
            transformer_decode_step,
            transformer_decode_step_ragged,
        )

        cfg = tiny_test_config(attn_impl=impl)
        params = init_transformer(jax.random.PRNGKey(0), cfg)
        b, max_len = 4, 32
        lens = [13, 9, 17, 6]
        ids = jax.random.randint(jax.random.PRNGKey(1), (b, max(lens)), 0, 256)

        # per-row scalar references: prefill each row alone at its length
        want_logits, want_layers = [], []
        for i, L in enumerate(lens):
            _, c = transformer_prefill(params, cfg, ids[i:i + 1, :L], max_len)
            lg, c2 = transformer_decode_step(
                params, cfg, jnp.asarray([i], jnp.int32), c
            )
            want_logits.append(np.asarray(lg)[0])
            want_layers.append(c2.layers)

        # pooled ragged: build the pool from the same per-row prefills
        pooled = []
        for i, L in enumerate(lens):
            _, c = transformer_prefill(params, cfg, ids[i:i + 1, :L], max_len)
            pooled.append(c.layers)
        pool = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *pooled
        )
        logits_r, layers_r = transformer_decode_step_ragged(
            params, cfg, jnp.asarray(np.arange(b), jnp.int32), pool,
            jnp.asarray(lens, jnp.int32),
        )
        for i in range(b):
            np.testing.assert_allclose(
                np.asarray(logits_r)[i], want_logits[i], rtol=2e-4, atol=2e-4
            )
            got_i = jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(lambda x: x[i:i + 1], layers_r)
            )
            want_i = jax.tree_util.tree_leaves(want_layers[i])
            for a, w in zip(got_i, want_i):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(w), rtol=2e-4, atol=2e-4
                )
