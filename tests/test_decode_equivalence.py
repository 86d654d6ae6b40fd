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
