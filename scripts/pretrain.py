#!/usr/bin/env python
"""Pretrain the byte-level GPT (full or sparse attention) from the CLI.

Replaces the reference's edit-the-constants workflow (reference:
pretrain/train.py:31-102) with flags over the typed configs.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nsa_tpu.config import DataConfig, TrainConfig, reference_model_config
from nsa_tpu.train.pretrain import run_pretrain


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--compressor", default="mlp",
                   choices=["mlp", "conv", "attn", "mean", "shared_mlp", "single"])
    p.add_argument("--full-attention", action="store_true")
    p.add_argument("--seq-len", type=int, default=4096)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--grad-accum", type=int, default=4)
    p.add_argument("--num-batches", type=int, default=5000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--attn-impl", default="xla",
                   choices=["reference", "xla", "pallas"])
    p.add_argument("--data", default="data/enwik8.gz")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--ckpt-every", type=int, default=2500)
    p.add_argument("--log-csv", default=None)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--generate-every", type=int, default=500)
    args = p.parse_args()

    name = "full_attn" if args.full_attention else f"sparse_{args.compressor}"
    ckpt_dir = args.ckpt_dir or f"ckpt/{name}_seq{args.seq_len}"

    model_cfg = reference_model_config(
        compressor=args.compressor,
        use_sparse_attn=not args.full_attention,
    ).replace(dtype=args.dtype, attn_impl=args.attn_impl)
    train_cfg = TrainConfig(
        num_batches=args.num_batches,
        batch_size=args.batch_size,
        grad_accum_every=args.grad_accum,
        learning_rate=args.lr,
        seq_len=args.seq_len,
        ckpt_dir=ckpt_dir,
        ckpt_every=args.ckpt_every,
        seed=args.seed,
        log_csv=args.log_csv or f"{ckpt_dir}/train_log.csv",
        generate_every=args.generate_every,
    )
    data_cfg = DataConfig(path=args.data)
    run_pretrain(model_cfg, train_cfg, data_cfg, resume=not args.no_resume)


if __name__ == "__main__":
    main()
