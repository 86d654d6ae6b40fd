#!/usr/bin/env python
"""Evaluation sweep driver (reference E4 shell wrappers, as one CLI).

Mirrors the reference's run_pretrain_{efficiency_test,ppl_test,example}.sh
sweeps (reference: evaluation/pretrain/run_pretrain_efficiency_test.sh:31-33
sweeps bs in {1,8,16,32,64} x prompt in {500..3900}): loads checkpoints,
runs efficiency / perplexity / generation, appends the same CSV schemas,
then renders the plots.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from nsa_tpu.config import DataConfig, reference_model_config
from nsa_tpu.eval.efficiency import run_efficiency_sweep
from nsa_tpu.eval.generate import generate_samples
from nsa_tpu.eval.perplexity import run_ppl_eval
from nsa_tpu.eval.visualize import plot_efficiency, plot_ppl, ppl_markdown_table
from nsa_tpu.models.transformer import init_transformer
from nsa_tpu.train.data import load_byte_corpus, load_cs441_qa_bytes
from nsa_tpu.utils.checkpoint import (
    latest_checkpoint,
    model_config_from_checkpoint,
    restore_checkpoint,
)


def load_model(ckpt_dir, fallback_type):
    """Restore (params, cfg, name) from a checkpoint dir, or init fresh."""
    ckpt = latest_checkpoint(ckpt_dir) if ckpt_dir else None
    if ckpt:
        cfg = model_config_from_checkpoint(ckpt)
        params = init_transformer(jax.random.PRNGKey(0), cfg)
        state, meta = restore_checkpoint(ckpt, {"params": params})
        return state["params"], cfg, meta.get("step", 0)
    cfg = reference_model_config(
        compressor=fallback_type if fallback_type not in ("full",) else "mlp",
        use_sparse_attn=fallback_type != "full",
    ).replace(dtype="bfloat16")
    return init_transformer(jax.random.PRNGKey(0), cfg), cfg, 0


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="+", default=["full", "mlp"],
                   help="model types (checkpoint dirs ckpt/<name>_seqN or fresh)")
    p.add_argument("--ckpt-root", default="ckpt")
    p.add_argument("--ckpt-suffix", default="",
                   help="suffix after _seqN in checkpoint dir names "
                        "(e.g. _s5000 or _cpt)")
    p.add_argument("--seq-len", type=int, default=512)
    p.add_argument("--out-dir", default="exp_result")
    p.add_argument("--batch-sizes", nargs="+", type=int, default=[1, 8, 64])
    p.add_argument("--prompt-lens", nargs="+", type=int, default=[500, 2000, 3900])
    p.add_argument("--gen-len", type=int, default=100)
    p.add_argument("--skip-efficiency", action="store_true")
    p.add_argument("--skip-ppl", action="store_true")
    p.add_argument("--skip-generate", action="store_true")
    p.add_argument("--max-id-tokens", type=int, default=200_000)
    p.add_argument("--attn-impl", default=None,
                   help="override attention impl (e.g. pallas) for all models")
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    eff_csv = os.path.join(args.out_dir, f"efficiency_seq{args.seq_len}.csv")
    ppl_csv = os.path.join(args.out_dir, f"ppl_seq{args.seq_len}.csv")
    gen_csv = os.path.join(args.out_dir, f"generation_seq{args.seq_len}.csv")

    _, val = load_byte_corpus(DataConfig())
    ood = load_cs441_qa_bytes()

    for mt in args.models:
        name = "full_attn" if mt == "full" else f"sparse_{mt}"
        ckpt_dir = os.path.join(
            args.ckpt_root, f"{name}_seq{args.seq_len}{args.ckpt_suffix}"
        )
        params, cfg, step = load_model(ckpt_dir, mt)
        if args.attn_impl and cfg.use_sparse_attn:
            cfg = cfg.replace(attn_impl=args.attn_impl)
        print(f"== {name} (step {step}) ==")

        if not args.skip_ppl:
            row = run_ppl_eval(
                params, cfg, name, args.seq_len, val, ood, csv_path=ppl_csv,
                step=step, max_id_tokens=args.max_id_tokens,
            )
            print("ppl:", row)

        if not args.skip_efficiency:
            run_efficiency_sweep(
                params, cfg, name, args.batch_sizes, args.prompt_lens,
                args.gen_len, seq_len=args.seq_len, csv_path=eff_csv,
                step=step,
            )

        if not args.skip_generate:
            row = generate_samples(
                params, cfg, name, gen_len=128, id_snippet=val[:64],
                csv_path=gen_csv, step=step,
            )
            print("generated id sample:", row["id_generation"][:80])

    if not args.skip_ppl and os.path.exists(ppl_csv):
        print(ppl_markdown_table(ppl_csv))
        plot_ppl(ppl_csv, os.path.join(args.out_dir, "ppl_plots.png"))
    if not args.skip_efficiency and os.path.exists(eff_csv):
        plot_efficiency(eff_csv, os.path.join(args.out_dir, "efficiency_plots.png"))


if __name__ == "__main__":
    main()
