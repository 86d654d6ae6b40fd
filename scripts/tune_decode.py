#!/usr/bin/env python
"""Decode-kernel batch-tile sweep on TPU.

Times the full 6-layer decode scan for combinations of the decode_select /
decode_attend batch tiles (bigger tile = fewer sequential grid programs on
this ~30us-per-kernel backend, at the cost of per-program VMEM) and prints
ms/step + tok/s per combination.  Run after training queues drain — only
one process may hold the TPU.
"""

import argparse
import os
import sys


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nsa_tpu.config import reference_model_config
from nsa_tpu.models.transformer import (
    init_transformer,
    transformer_decode_step,
    transformer_prefill,
)


def time_step(params, cfg, batch, prompt, gen, max_len):
    # params as jit ARGUMENTS (a closure inlines ~19M weights as HLO
    # constants -> remote-compile HTTP 413, see eval/efficiency.py)
    ids = jnp.zeros((batch, prompt), jnp.int32)
    prefill = jax.jit(lambda p, i: transformer_prefill(p, cfg, i, max_len))
    logits, cache = jax.block_until_ready(prefill(params, ids))
    first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

    @jax.jit
    def scan(p, first, cache, salt):
        def step(carry, _):
            tok, cache = carry
            logits, cache = transformer_decode_step(p, cfg, tok, cache)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache), ()

        (tok, cache), _ = jax.lax.scan(
            step, (first + salt, cache), None, length=gen
        )
        return tok

    # _time_fn perturbs the salt every call AND materializes the result:
    # on this backend block_until_ready alone returns at dispatch time and
    # identical requests are short-circuited (eval/efficiency.py:41-46)
    from nsa_tpu.eval.efficiency import _time_fn

    dt = _time_fn(scan, params, first, cache, jnp.int32(0),
                  warmup=1, iters=3, vary=3)
    return dt / gen * 1000


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--prompt", type=int, default=128)
    p.add_argument("--gen", type=int, default=50)
    p.add_argument("--max-len", type=int, default=4096)
    p.add_argument("--select-tiles", nargs="+", type=int, default=[16, 32, 64])
    p.add_argument("--attend-tiles", nargs="+", type=int, default=[16, 32, 64])
    args = p.parse_args()

    base = reference_model_config().replace(
        dtype="bfloat16", attn_impl="pallas"
    )
    params = init_transformer(jax.random.PRNGKey(0), base)

    best = None
    for st in args.select_tiles:
        for at in args.attend_tiles:
            cfg = base.replace(decode_select_tile=st, decode_attend_tile=at)
            try:
                ms = time_step(params, cfg, args.batch, args.prompt,
                               args.gen, args.max_len)
            except Exception as e:  # VMEM overflow etc.
                print(f"select_tile={st} attend_tile={at}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}")
                continue
            tps = args.batch / ms * 1000
            print(f"select_tile={st} attend_tile={at}: {ms:.3f} ms/step "
                  f"{tps:,.0f} tok/s")
            if best is None or ms < best[0]:
                best = (ms, st, at)
    if best:
        print(f"BEST: select_tile={best[1]} attend_tile={best[2]} "
              f"{best[0]:.3f} ms/step")


if __name__ == "__main__":
    main()
