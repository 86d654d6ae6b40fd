"""A/B the full-attention quick-bench cell against the scoped-VMEM limit.

The r5 policy commit raised the global per-jit scoped-VMEM limit from
64 MiB to 96 MiB (ops/common.tpu_compiler_options) for the bs-16
megakernel; the limit is documented as a check, not a reservation, but
the first quick bench after it measured full attention at bs 8 ~14x
slower than its r5 baseline (1,013 tok/s vs ~14,700).  This script
measures ONLY that cell so the limit can be A/B'd via
NSA_SCOPED_VMEM_KIB without paying the sparse model's compile.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nsa_tpu.config import reference_model_config
from nsa_tpu.eval.efficiency import measure_decode
from nsa_tpu.models.transformer import init_transformer


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=500)
    ap.add_argument("--gen", type=int, default=100)
    args = ap.parse_args()
    cfg = reference_model_config(
        compressor="mlp", use_sparse_attn=False,
    ).replace(dtype="bfloat16", attn_chunk_size=128, attn_impl="xla")
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    lim = os.environ.get("NSA_SCOPED_VMEM_KIB", "(default 98304)")
    tps = measure_decode(params, cfg, args.batch, args.prompt, args.gen,
                         iters=3, seq_len=4096)
    print(f"full_attn bs{args.batch} prompt{args.prompt} gen{args.gen} "
          f"seq4096: {tps:.1f} tok/s = "
          f"{args.batch * args.gen / tps * 1e3 / args.gen:.4f} ms/step "
          f"(scoped_vmem_kib={lim})", flush=True)


if __name__ == "__main__":
    main()
