#!/usr/bin/env python
"""Full-budget ID/OOD PPL for the round-3 CPT checkpoints.

Round-2 protocol: ID = last 500k bytes of the training corpus (val slice),
OOD = the full CS441 QA test byte stream, seq-4096 windows.  Both models
ran the IDENTICAL round-3 CPT recipe (600 steps, lr 3e-5, mix 0.5,
seq 512), so the sparse-vs-full comparison is apples to apples.

  python scripts/eval_cpt_r3.py [--force-cpu] [--steps 5450 5600]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--force-cpu", action="store_true")
    ap.add_argument("--steps", nargs="+", type=int, default=[5450, 5600])
    ap.add_argument("--csv", default="exp_result/cpt_r3_ppl.csv")
    ap.add_argument("--max-tokens", type=int, default=500_000)
    ap.add_argument("--dtype", default=None)
    args = ap.parse_args()
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from nsa_tpu.config import DataConfig
    from nsa_tpu.eval.perplexity import compute_ppl
    from nsa_tpu.models.transformer import init_transformer
    from nsa_tpu.train.data import load_byte_corpus, load_cs441_qa_bytes
    from nsa_tpu.utils.checkpoint import (
        model_config_from_checkpoint,
        restore_checkpoint,
    )
    from nsa_tpu.utils.metrics import CSVLogger

    corpus, _ = load_byte_corpus(DataConfig())
    val = corpus[-2_000_000:]
    qa_test = load_cs441_qa_bytes(split="test")

    for model in ("sparse_mlp", "full_attn"):
        for step in args.steps:
            ck = f"ckpt/{model}_seq4096_cpt_r3/step_{step:08d}"
            if not os.path.exists(ck):
                print("missing", ck)
                continue
            cfg = model_config_from_checkpoint(ck)
            if args.dtype:
                cfg = cfg.replace(dtype=args.dtype)
            params = init_transformer(jax.random.PRNGKey(0), cfg)
            state, _ = restore_checkpoint(ck, {"params": params})
            params = state["params"]
            ppl_id, n_id = compute_ppl(params, cfg, val, 4096, batch_size=4,
                                       max_tokens=args.max_tokens)
            ppl_ood, n_ood = compute_ppl(params, cfg, qa_test, 4096,
                                         batch_size=2, max_tokens=None)
            row = {"model_type": model, "step": step, "seq_len": 4096,
                   "ppl_id": round(ppl_id, 4), "ppl_ood": round(ppl_ood, 4),
                   "id_tokens": int(n_id), "ood_tokens": int(n_ood)}
            CSVLogger(args.csv).append(row)
            print(row, flush=True)


if __name__ == "__main__":
    main()
