"""Hybrid decode path (r2 select kernel + fused attend kernel) equivalence.

NSA_HYBRID_DECODE=1 keeps the batched select kernel that wins the
large-batch regime but routes the gather/attend/out-proj/FF chain through
decode_attend_fused (ops/nsa.py).  This pins it token-for-token against
the default path across emission boundaries.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from nsa_tpu.config import tiny_test_config
from nsa_tpu.models.transformer import (
    init_transformer,
    transformer_decode_step,
    transformer_prefill,
)


def _rollout(cfg, params, prompt, steps, max_len=64):
    logits, cache = transformer_prefill(params, cfg, prompt, max_len)
    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    outs = []
    for _ in range(steps):
        lg, cache = transformer_decode_step(params, cfg, tok, cache)
        outs.append(np.asarray(lg))
        tok = jnp.argmax(lg, -1).astype(jnp.int32)
    return outs, cache


def test_hybrid_matches_default_decode():
    # batch 16 > fused-path cutoff, so the default takes the r2 path and
    # the flag flips only the attend half — the regime the hybrid targets
    cfg = tiny_test_config(attn_impl="pallas")
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (16, 9), 0, 256)

    os.environ.pop("NSA_HYBRID_DECODE", None)
    os.environ["NSA_FUSED_DECODE_MAX_B"] = "0"   # force the r2 path
    try:
        ref, ref_cache = _rollout(cfg, params, prompt, steps=8)
        os.environ["NSA_HYBRID_DECODE"] = "1"
        hyb, hyb_cache = _rollout(cfg, params, prompt, steps=8)
    finally:
        os.environ.pop("NSA_HYBRID_DECODE", None)
        os.environ.pop("NSA_FUSED_DECODE_MAX_B", None)

    for i, (a, h) in enumerate(zip(ref, hyb)):
        np.testing.assert_allclose(a, h, rtol=2e-4, atol=2e-4,
                                   err_msg=f"step {i}")
    for l, (rc, hc) in enumerate(zip(ref_cache.layers, hyb_cache.layers)):
        np.testing.assert_allclose(
            np.asarray(rc.kv), np.asarray(hc.kv), rtol=2e-4, atol=2e-4,
            err_msg=f"kv layer {l}")
