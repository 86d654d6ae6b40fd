#!/usr/bin/env python
"""Long-context streaming-kernel validation on the real chip.

Compiles and runs the HBM-streaming forwards (flash + fused NSA
fine+sliding) at a context length past STREAM_MIN_NK, checks them against
the chunked XLA paths, and prints timings.  Interpret-mode equivalence is
already pinned by tests/test_pallas_kernels.py; this drives the Mosaic
compile + DMA path that interpret mode cannot validate.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seq-len", type=int, default=16384)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--kv-heads", type=int, default=4)
    p.add_argument("--dim-head", type=int, default=64)
    p.add_argument("--force-cpu", action="store_true")
    args = p.parse_args()
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from nsa_tpu.config import reference_model_config
    from nsa_tpu.models.transformer import init_transformer
    from nsa_tpu.ops.attention import full_attention_chunked
    from nsa_tpu.ops.nsa import sparse_attention_forward
    from nsa_tpu.ops.pallas.flash import STREAM_MIN_NK, flash_attention

    b, h, kvh, n, d = (args.batch, args.heads, args.kv_heads,
                       args.seq_len, args.dim_head)
    assert n >= STREAM_MIN_NK, (n, STREAM_MIN_NK)
    dt = jnp.bfloat16

    # ---- flash streaming vs chunked XLA ---------------------------------
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, n, d), dt)
    k = jax.random.normal(ks[1], (b, kvh, n, d), dt)
    v = jax.random.normal(ks[2], (b, kvh, n, d), dt)

    t0 = time.time()
    out_s = jax.block_until_ready(flash_attention(q, k, v, causal=True))
    t_compile = time.time() - t0
    t0 = time.time()
    out_s = jax.block_until_ready(flash_attention(q, k, v, causal=True))
    t_run = time.time() - t0
    want = jax.block_until_ready(
        jax.jit(lambda *a: full_attention_chunked(*a, causal=True))(q, k, v)
    )
    err = float(jnp.max(jnp.abs(out_s.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    print(f"flash stream n={n}: compile {t_compile:.1f}s run {t_run*1e3:.1f}ms "
          f"max|err| {err:.4f}")
    assert err < 0.1, err  # bf16 accumulation-order tolerance

    # ---- fused NSA forward (streaming) vs chunked XLA, model level ------
    cfg = reference_model_config().replace(dtype="bfloat16", depth=1)
    params = init_transformer(jax.random.PRNGKey(1), cfg)
    attn = params["layers"][0]["attn"]
    x = jax.random.normal(jax.random.PRNGKey(2), (b, n, cfg.dim), dt) * 0.1

    run_p = jax.jit(lambda pp, xx: sparse_attention_forward(
        pp, cfg, xx, impl="pallas"))
    run_x = jax.jit(lambda pp, xx: sparse_attention_forward(
        pp, cfg, xx, impl="xla"))
    t0 = time.time()
    out_p = jax.block_until_ready(run_p(attn, x))
    t_compile = time.time() - t0
    t0 = time.time()
    out_p = jax.block_until_ready(run_p(attn, x))
    t_run = time.time() - t0
    out_x = jax.block_until_ready(run_x(attn, x))
    err = float(jnp.max(jnp.abs(out_p.astype(jnp.float32)
                                - out_x.astype(jnp.float32))))
    print(f"nsa stream n={n}: compile {t_compile:.1f}s run {t_run*1e3:.1f}ms "
          f"max|err| {err:.4f}")
    assert err < 0.1, err
    print("STREAMING VALIDATION OK")


if __name__ == "__main__":
    main()
