#!/usr/bin/env python
"""Serving-engine throughput benchmark (continuous batching).

Measures end-to-end engine tokens/s — admission (exact bucketed whole-
prompt prefill, one jit call per request) + ragged decode — for the
reference NSA model.  The reference has no serving loop at all (its decode
is a per-token Python loop over one fixed batch, reference:
transformer.py:273-312).

    python scripts/serve_bench.py --max-batch 8 --requests 16 \
        --prompt-len 480 --gen 64 [--steps-per-sync 8] [--ckpt ckpt/...]

Timing is wall clock over the whole run() (prefills + decode + host
bookkeeping), so host<->device sync cost is included — steps_per_sync > 1
amortizes it via the on-device multi-token scan.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nsa_tpu.config import reference_model_config
from nsa_tpu.models.transformer import init_transformer
from nsa_tpu.serve import ContinuousBatchingEngine
from nsa_tpu.utils.checkpoint import (
    latest_checkpoint,
    model_config_from_checkpoint,
    restore_checkpoint,
)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--requests", type=int, default=16)
    p.add_argument("--prompt-len", type=int, default=480)
    p.add_argument("--gen", type=int, default=64)
    p.add_argument("--steps-per-sync", type=int, default=8)
    p.add_argument("--full-attention", action="store_true")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir to load trained weights from")
    p.add_argument("--attn-impl", default="pallas",
                   choices=["reference", "xla", "pallas"])
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--paged-pages", type=int, default=None,
                   help="use the paged KV pool with this many pages "
                        "(HBM capacity scales with live tokens)")
    p.add_argument("--page-tokens", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="float32 for CPU dry-runs (CPU XLA lacks bf16 dots)")
    args = p.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    if args.ckpt:
        # accept either a run dir (ckpt/foo) or a step dir (ckpt/foo/step_N)
        if not os.path.exists(os.path.join(args.ckpt, "meta.json")):
            args.ckpt = latest_checkpoint(args.ckpt) or args.ckpt
        cfg = model_config_from_checkpoint(args.ckpt).replace(
            attn_impl=args.attn_impl, dtype=args.dtype
        )
        params = init_transformer(jax.random.PRNGKey(0), cfg)
        state, _ = restore_checkpoint(args.ckpt, {"params": params})
        params = state["params"]
    else:
        cfg = reference_model_config(
            use_sparse_attn=not args.full_attention
        ).replace(attn_impl=args.attn_impl, dtype=args.dtype)
        params = init_transformer(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(0)
    prompts = [
        rng.randint(32, 127, size=args.prompt_len).astype(np.int32)
        for _ in range(args.requests)
    ]

    def run_once():
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=args.max_batch, max_len=args.max_len,
            prefill_buckets=(128, 256, 512),
            dtype=dtype, steps_per_sync=args.steps_per_sync,
            temperature=args.temperature,
            paged_pool_pages=args.paged_pages, page_tokens=args.page_tokens,
        )
        kv_bytes = sum(
            c.kv.size * c.kv.dtype.itemsize for c in eng.cache_layers
        )
        for pr in prompts:
            eng.add_request(pr, max_new_tokens=args.gen)
        t0 = time.perf_counter()
        outs = eng.run()
        dt = time.perf_counter() - t0
        total_new = sum(len(v) for v in outs.values())
        return dt, total_new, kv_bytes

    # warmup compiles (prefill bucket + decode scan), then measure
    run_once()
    dt, total_new, kv_bytes = run_once()
    print({
        "requests": args.requests,
        "prompt_len": args.prompt_len,
        "gen": args.gen,
        "max_batch": args.max_batch,
        "steps_per_sync": args.steps_per_sync,
        "paged_pages": args.paged_pages,
        "kv_pool_mib": round(kv_bytes / 2**20, 1),
        "wall_s": round(dt, 3),
        "new_tokens_per_s": round(total_new / dt, 1),
        "requests_per_s": round(args.requests / dt, 2),
    })


if __name__ == "__main__":
    main()
