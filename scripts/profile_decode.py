#!/usr/bin/env python
"""Branch-level timing of the NSA decode step on TPU.

Ablates each branch of ``sparse_attention_decode`` to find where decode
time goes, by monkeypatching pieces to zeros and timing the full 6-layer
decode scan each time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nsa_tpu.config import reference_model_config
from nsa_tpu.models.transformer import (
    init_transformer,
    transformer_decode_step,
    transformer_prefill,
)

BATCH, PROMPT, GEN = 64, 128, 50


def time_step(params, cfg, max_len=4096):
    ids = jnp.zeros((BATCH, PROMPT), jnp.int32)
    logits, cache = jax.block_until_ready(
        jax.jit(lambda i: transformer_prefill(params, cfg, i, max_len))(ids)
    )
    first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

    @jax.jit
    def scan(first, cache):
        def step(carry, _):
            tok, cache = carry
            logits, cache = transformer_decode_step(params, cfg, tok, cache)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache), ()
        (tok, cache), _ = jax.lax.scan(step, (first, cache), None, length=GEN)
        return tok
    jax.block_until_ready(scan(first, cache))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(scan(first, cache))
        ts.append(time.perf_counter() - t0)
    return min(ts) / GEN * 1000  # ms per step


def main():
    import sys
    impl = "pallas" if "--pallas" in sys.argv else "xla"
    cfg = reference_model_config("mlp").replace(dtype="bfloat16", attn_impl=impl)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    import nsa_tpu.ops.nsa as nsa_mod

    orig_decode = nsa_mod.sparse_attention_decode

    ms = time_step(params, cfg)
    print(f"full step: {ms:.3f} ms  ({BATCH/ms*1000:.0f} tok/s)")

    # ablations: patch sparse_attention_decode wrapper pieces via env flags
    if "--full-only" in sys.argv:
        return
    for name in ["no_fine", "no_compressed", "no_emit", "attn_only"]:
        os.environ["NSA_ABLATE"] = name
        try:
            ms = time_step(params, cfg)
            print(f"{name}: {ms:.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: failed {type(e).__name__}: {e}")
        finally:
            os.environ.pop("NSA_ABLATE", None)


if __name__ == "__main__":
    main()
