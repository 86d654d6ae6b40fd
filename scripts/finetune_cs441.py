#!/usr/bin/env python
"""CS441 adapter fine-tune + QA-accuracy evaluation (reference F4 + E6).

End-to-end exercise of the adapter/distillation line on real task data:
freeze a pretrained full-attention teacher, train NSA adapters on the
CS441 train split (answer-span supervised, cosine-restarts, grad-clip
0.1 — reference: fine_tune/train_sparse_attention.py:416-478), then
measure QA accuracy base-vs-adapted on the test split with greedy
generation + regex answer extraction (reference:
evaluation/fine_tune/evaluate_sparse_attention_finetune.py:25-160).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from nsa_tpu.eval.finetune_eval import evaluate_qa_accuracy
from nsa_tpu.models.transformer import init_transformer, transformer_forward
from nsa_tpu.train.data import load_cs441_qa_pairs
from nsa_tpu.train.finetune import run_finetune
from nsa_tpu.utils.checkpoint import (
    latest_checkpoint,
    model_config_from_checkpoint,
    restore_checkpoint,
)
from nsa_tpu.utils.metrics import MetricsLogger


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--teacher-ckpt", default="ckpt/full_attn_seq4096")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seq-len", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--mode", default="kl_output_only",
                   choices=["kl_output_only", "kl_logits", "mse_hidden",
                            "mixed", "ce"])
    p.add_argument("--gen-len", type=int, default=32)
    p.add_argument("--max-samples", type=int, default=84)
    p.add_argument("--out", default="exp_result/finetune_cs441.json")
    p.add_argument("--log-csv", default=None)
    p.add_argument("--force-cpu", action="store_true",
                   help="force the CPU backend (the axon plugin ignores "
                        "JAX_PLATFORMS=cpu set via env var)")
    args = p.parse_args()

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    ckpt = latest_checkpoint(args.teacher_ckpt)
    assert ckpt, f"no checkpoint under {args.teacher_ckpt}"
    cfg_teacher = model_config_from_checkpoint(ckpt)
    if args.force_cpu:
        # the CPU backend has no bf16 dot; params are f32 masters anyway
        cfg_teacher = cfg_teacher.replace(dtype="float32")
    teacher_params = init_transformer(jax.random.PRNGKey(0), cfg_teacher)
    state, meta = restore_checkpoint(ckpt, {"params": teacher_params})
    teacher_params = state["params"]
    print(f"teacher: {ckpt} (step {meta.get('step')}, "
          f"sparse={cfg_teacher.use_sparse_attn})")

    cfg_student = cfg_teacher.replace(use_sparse_attn=True)
    train_pairs = load_cs441_qa_pairs(split="train")
    test_pairs = load_cs441_qa_pairs(split="test")
    print(f"CS441 pairs: {len(train_pairs)} train / {len(test_pairs)} test")

    logger = MetricsLogger(csv_path=args.log_csv)
    adapters, final_loss = run_finetune(
        teacher_params, cfg_teacher, cfg_student, train_pairs,
        num_steps=args.steps, batch_size=args.batch_size,
        seq_len=args.seq_len, lr=args.lr, mode=args.mode, logger=logger,
    )
    print(f"fine-tune done: final loss {final_loss:.4f}")

    # params as jit arguments (a closure would inline them as HLO
    # constants -> remote-compile HTTP 413)
    _base_jit = jax.jit(
        lambda tp, ids: transformer_forward(tp, cfg_teacher, ids)
    )

    def base_fn(ids):
        return _base_jit(teacher_params, ids)

    result = evaluate_qa_accuracy(
        adapters, teacher_params, cfg_student, test_pairs,
        gen_len=args.gen_len, max_samples=args.max_samples,
        json_path=args.out, compare_base=base_fn,
        fixed_len=args.seq_len,
    )
    print(json.dumps({
        "adapted_accuracy": result["accuracy"],
        "adapted_ci95": result["accuracy_ci95"],
        "base_accuracy": result.get("base_accuracy"),
        "base_ci95": result.get("base_accuracy_ci95"),
        "num_samples": result["num_samples"],
        "mode": args.mode,
        "steps": args.steps,
    }))


if __name__ == "__main__":
    main()
