"""Headline benchmark: NSA sparse decode throughput at seq 4096 on one chip.

Measures decode tokens/s for the reference model configuration (6-layer
byte GPT, dim 512, 8 heads / 4 KV heads) at batch 64, prompt 3900,
gen_len 100 with the structured sparse KV cache — the reference's own
headline efficiency configuration (reference: evaluation/
run_pretrain_efficiency_test.sh:31-33, efficiency_step5000_seq4096.csv).

Prints ONE JSON line:
  value        = sparse decode tokens/s on this chip
  vs_baseline  = value / 1080.2 (the reference's best sparse decode tok/s
                 at the same config on its NVIDIA L40, BASELINE.md)
Also includes the full-attention number and the sparse/full ratio (the
north-star metric: >= 3x at seq 4096) as extra keys.
"""

import json
import os
import sys

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nsa_tpu.config import reference_model_config
from nsa_tpu.eval.efficiency import measure_decode
from nsa_tpu.models.transformer import init_transformer

REFERENCE_SPARSE_DECODE_TPS = 1080.2   # BASELINE.md: best sparse, bs64/prompt3900
BATCH = 64
PROMPT = 3900
GEN = 100


def _load_trained(name: str, cfg):
    """Prefer the trained seq-4096 checkpoint (selection-index/gather
    locality under trained gates is the honest distribution to time);
    fall back to random init when absent."""
    from nsa_tpu.utils.checkpoint import (
        import_params_npz,
        latest_checkpoint,
        restore_checkpoint,
    )

    params = init_transformer(jax.random.PRNGKey(0), cfg)
    for d in (f"ckpt/{name}_seq4096", f"ckpt/{name}_seq512"):
        ckpt = latest_checkpoint(d)
        if ckpt:
            state, _ = restore_checkpoint(ckpt, {"params": params})
            print(f"# {name}: loaded {ckpt}", file=sys.stderr)
            return state["params"], "trained"
    # committed single-file export survives host migrations (ckpt/ is
    # gitignored and has been wiped twice) — see utils/checkpoint.py
    for npz in (f"ckpt_export/{name}_seq4096.npz",
                f"ckpt_export/{name}_seq512.npz"):
        if os.path.isfile(npz):
            loaded, meta = import_params_npz(npz, params)
            print(f"# {name}: loaded {npz} (step {meta.get('step')})",
                  file=sys.stderr)
            return loaded, "trained"
    print(f"# {name}: WARNING no checkpoint found, RANDOM INIT — selection "
          "distribution is untrained; retrain with scripts/pretrain.py",
          file=sys.stderr)
    return params, "random"


def main():
    quick = "--quick" in sys.argv
    # quick gen is 100, not 20: each timed call carries a ~23 ms
    # dispatch+readback constant through the tunnel (RESULTS.md r4), so
    # gen-20 numbers are constant-dominated and do not rank decode paths
    batch, prompt, gen = (8, 500, 100) if quick else (BATCH, PROMPT, GEN)

    results = {}
    weights = {}
    for name, sparse in [("sparse_mlp", True), ("full_attn", False)]:
        cfg = reference_model_config(
            compressor="mlp", use_sparse_attn=sparse,
        ).replace(
            dtype="bfloat16", attn_chunk_size=128,
            attn_impl="pallas" if sparse else "xla",
        )
        params, weights[name] = _load_trained(name, cfg)
        if cfg.dtype == "bfloat16":
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16), params
            )
        # seq_len pins the cache at 4096 in BOTH modes: the quick cell is
        # the reference's (bs 8, prompt 500, seq 4096) row, not an
        # easier auto-shrunk 640-row cache
        tps = measure_decode(params, cfg, batch, prompt, gen, iters=3,
                             seq_len=4096)
        results[name] = tps
        print(f"# {name}: {tps:.1f} decode tok/s", file=sys.stderr)
        del params

    sparse_tps = results["sparse_mlp"]
    full_tps = results["full_attn"]
    print(json.dumps({
        "metric": f"NSA sparse decode tokens/s (bs {batch}, prompt {prompt}, gen {gen})",
        "value": round(sparse_tps, 1),
        "unit": "tokens/s",
        "vs_baseline": round(sparse_tps / REFERENCE_SPARSE_DECODE_TPS, 3),
        "full_attn_tokens_per_s": round(full_tps, 1),
        "sparse_over_full": round(sparse_tps / full_tps, 3),
        "weights": ("trained" if all(w == "trained" for w in weights.values())
                    else "random"),
    }))


if __name__ == "__main__":
    main()
