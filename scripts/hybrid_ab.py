#!/usr/bin/env python
"""Headline-config A/B for the hybrid decode path (NSA_HYBRID_DECODE).

Measures sparse decode tokens/s at the exact bench.py configuration
(bs 64, prompt 3900, gen 100, trained seq-4096 checkpoint when present)
with whatever NSA_* env flags are set, printing one line.  Run once per
flag state:

  python scripts/hybrid_ab.py                      # r2 path (default)
  NSA_HYBRID_DECODE=1 python scripts/hybrid_ab.py  # hybrid
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import _load_trained
from nsa_tpu.config import reference_model_config
from nsa_tpu.eval.efficiency import measure_decode

BATCH, PROMPT, GEN = 64, 3900, 100


def main():
    batch = int(os.environ.get("AB_BATCH", BATCH))
    cfg = reference_model_config("mlp").replace(
        dtype="bfloat16", attn_chunk_size=128, attn_impl="pallas")
    params, src = _load_trained("sparse_mlp", cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    tps = measure_decode(params, cfg, batch, PROMPT, GEN, iters=3)
    flags = {k: v for k, v in os.environ.items() if k.startswith("NSA_")}
    print(f"hybrid_ab: bs={batch} prompt={PROMPT} gen={GEN} "
          f"weights={src} flags={flags} -> {tps:.1f} tok/s", flush=True)


if __name__ == "__main__":
    main()
