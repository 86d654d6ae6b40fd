#!/usr/bin/env python
"""Capture a jax.profiler trace of the decode step and print top device ops.

Uses the installed xprof/tensorboard-plugin-profile converters to turn the
xplane into framework op stats, avoiding the need for a TensorBoard UI.
"""

import glob
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

BATCH = int(os.environ.get("TRACE_BATCH", "64"))
PROMPT, GEN = 128, 30
TRACE_DIR = "/tmp/jax_decode_trace"


def main():
    sparse = "--full" not in sys.argv
    impl = "pallas" if "--pallas" in sys.argv else "xla"
    cfg = reference_model_config("mlp", use_sparse_attn=sparse).replace(
        dtype="bfloat16", attn_impl=impl
    )
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    ids = jnp.zeros((BATCH, PROMPT), jnp.int32)
    logits, cache = jax.block_until_ready(
        jax.jit(lambda i: transformer_prefill(params, cfg, i, 4096))(ids)
    )
    first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

    @jax.jit
    def scan(first, cache):
        def step(carry, _):
            tok, cache = carry
            logits, cache = transformer_decode_step(params, cfg, tok, cache)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache), ()
        (tok, _), _ = jax.lax.scan(step, (first, cache), None, length=GEN)
        return tok

    jax.block_until_ready(scan(first, cache))     # compile + warm
    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        jax.block_until_ready(scan(first, cache))

    xplanes = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane:", xplanes)
    if not xplanes:
        return
    from xprof.convert import raw_to_tool_data

    for tool in ["framework_op_stats", "op_profile"]:
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                xplanes, tool, params={}
            )
            out = f"/tmp/decode_{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print(f"wrote {out} ({len(data)} bytes)")
        except Exception as e:  # noqa: BLE001
            print(f"{tool} failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
