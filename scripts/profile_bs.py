#!/usr/bin/env python
"""Decode-step timing at a given batch size, without prefill.

Decode cost depends on max_len (static cache width), not on the current
position, so this initializes an EMPTY cache and stamps seq_len=PROMPT —
no prefill program is compiled at all.  Valid timing on this backend
requires perturbing an input each call and materializing the result
(eval/efficiency._time_fn).

Usage: python scripts/profile_bs.py [--batch N] [--paths xla,pallas,full]
       [--trace PATH_KEY] [--max-len 4096] [--gen 50]
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nsa_tpu.ops.common import lazy_jit
from nsa_tpu.config import reference_model_config
from nsa_tpu.models.transformer import (
    fuse_decode_params,
    init_model_cache,
    init_transformer,
    transformer_decode_step,
)


def build_scan(cfg, gen):
    def scan(params, first, cache):
        def step(carry, _):
            tok, cache = carry
            logits, cache = transformer_decode_step(params, cfg, tok, cache)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache), ()
        (tok, _), _ = jax.lax.scan(step, (first, cache), None, length=gen)
        return tok
    return lazy_jit(scan)


def time_path(params, cfg, batch, max_len, prompt, gen, reps=5):
    params = fuse_decode_params(params, cfg)
    cache = init_model_cache(cfg, batch, max_len, jnp.bfloat16)
    cache = cache._replace(seq_len=jnp.asarray(prompt, jnp.int32))
    scan = build_scan(cfg, gen)
    first = jnp.zeros((batch,), jnp.int32)
    t0 = time.perf_counter()
    np.asarray(scan(params, first, cache))
    compile_s = time.perf_counter() - t0
    ts = []
    for i in range(reps):
        f = jnp.full((batch,), i % 251, jnp.int32)   # perturb input
        t0 = time.perf_counter()
        out = scan(params, f, cache)
        np.asarray(out)                              # materialize
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / gen * 1000
    return ms, compile_s, scan, first, cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--paths", default="pallas,full")
    ap.add_argument("--trace", default=None, help="path key to xprof-trace")
    ap.add_argument("--max-len", type=int, default=4096)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--gen", type=int, default=50)
    args = ap.parse_args()

    results = {}
    for key in args.paths.split(","):
        sparse = key != "full"
        impl = key if sparse else "xla"
        cfg = reference_model_config("mlp", use_sparse_attn=sparse).replace(
            dtype="bfloat16", attn_impl=impl
        )
        params = init_transformer(jax.random.PRNGKey(0), cfg)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params
        )
        ms, compile_s, scan, first, cache = time_path(
            params, cfg, args.batch, args.max_len, args.prompt, args.gen
        )
        results[key] = ms
        print(
            f"[bs {args.batch}] {key}: {ms:.4f} ms/step "
            f"({args.batch / ms * 1000:.0f} tok/s, compile {compile_s:.0f}s)",
            flush=True,
        )
        if args.trace == key:
            tdir = f"/tmp/trace_bs{args.batch}_{key}"
            os.system(f"rm -rf {tdir}")
            with jax.profiler.trace(tdir):
                np.asarray(scan(params, first, cache))
            xplanes = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
            print("xplane:", xplanes, flush=True)
            if xplanes:
                from xprof.convert import raw_to_tool_data
                data, _ = raw_to_tool_data.xspace_to_tool_data(
                    xplanes, "framework_op_stats", params={}
                )
                out = f"/tmp/opstats_bs{args.batch}_{key}.csv"
                with open(out, "wb" if isinstance(data, bytes) else "w") as f:
                    f.write(data)
                print("wrote", out, flush=True)
    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
