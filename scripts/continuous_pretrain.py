#!/usr/bin/env python
"""Continuous pretraining (mid-training) on the CS441 QA byte stream.

The reference planned this stage but left it empty (reference:
continuous_pretrain/continuous_pretrain.py is 0 lines; readme.md:105-106
describes middle-training on the CS441 synthetic data).  Implemented here:
resume a pretrained checkpoint and continue training on the QA byte
serialization (optionally mixed with the original corpus to reduce
forgetting).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nsa_tpu.config import DataConfig, TrainConfig
from nsa_tpu.models.transformer import init_transformer
from nsa_tpu.train.data import load_byte_corpus, load_cs441_qa_bytes
from nsa_tpu.train.pretrain import eval_step, make_optimizer, train_step
from nsa_tpu.utils.checkpoint import (
    latest_checkpoint,
    model_config_from_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from nsa_tpu.utils.metrics import MetricsLogger


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt-dir", required=True,
                   help="pretrained checkpoint dir to continue from")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--num-batches", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seq-len", type=int, default=512)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--mix-original", type=float, default=0.5,
                   help="fraction of each batch drawn from the original corpus")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-every", type=int, default=0,
                   help="every N steps, log ID/OOD PPL (small budget) and "
                        "save a checkpoint — one run sweeps the whole "
                        "steps axis of the CPT recipe")
    p.add_argument("--eval-seq-len", type=int, default=None,
                   help="PPL window (default: the model's training seq len "
                        "passed via --seq-len)")
    p.add_argument("--eval-max-tokens", type=int, default=200_000)
    p.add_argument("--force-cpu", action="store_true",
                   help="run the CPT on the CPU backend (f32): identical "
                        "recipe for every model keeps the sparse-vs-full "
                        "comparison fair when the TPU is unavailable")
    p.add_argument("--dtype", default=None,
                   help="override the checkpoint's compute dtype")
    p.add_argument("--mesh", action="store_true",
                   help="run the CPT step over a (data, heads) mesh "
                        "(with --force-cpu: the 8 virtual CPU devices)")
    args = p.parse_args()

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    ckpt = latest_checkpoint(args.ckpt_dir)
    assert ckpt, f"no checkpoint under {args.ckpt_dir}"
    cfg = model_config_from_checkpoint(ckpt)
    if args.dtype:
        cfg = cfg.replace(dtype=args.dtype)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    state, meta = restore_checkpoint(ckpt, {"params": params})
    params = state["params"]
    print(f"continuing from {ckpt} (step {meta['step']})")

    qa = load_cs441_qa_bytes(split="train")
    corpus, _ = load_byte_corpus(DataConfig())
    print(f"QA bytes: {len(qa):,}; corpus bytes: {len(corpus):,}")

    train_cfg = TrainConfig(
        batch_size=args.batch_size, learning_rate=args.lr,
        seq_len=args.seq_len, grad_accum_every=1,
    )
    mesh = None
    if args.mesh:
        from nsa_tpu.parallel.mesh import auto_mesh
        from nsa_tpu.parallel.sharding import shard_params

        mesh = auto_mesh(kv_heads=cfg.kv_heads)
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
        params = shard_params(params, mesh)

    optimizer = make_optimizer(train_cfg)
    opt_state = jax.jit(optimizer.init)(params)
    out_dir = args.out_dir or (args.ckpt_dir.rstrip("/") + "_cpt")
    logger = MetricsLogger(csv_path=os.path.join(out_dir, "cpt_log.csv"))

    rng = np.random.RandomState(args.seed)
    n_mix = int(args.batch_size * args.mix_original)

    def sample(data, count):
        # wrap-around crops so short corpora still fill a window
        starts = rng.randint(0, max(len(data) - 2, 1), size=count)
        idx = (starts[:, None] + np.arange(args.seq_len + 1)[None, :]) % len(data)
        return data[idx].astype(np.int32)

    qa_test = load_cs441_qa_bytes(split="test")
    val = corpus[-2_000_000:]
    eval_seq = args.eval_seq_len or args.seq_len

    def eval_point(step):
        from nsa_tpu.eval.perplexity import compute_ppl

        ppl_ood, _ = compute_ppl(
            params, cfg, qa_test, eval_seq, batch_size=4,
            max_tokens=args.eval_max_tokens,
        )
        ppl_id, _ = compute_ppl(
            params, cfg, val, eval_seq, batch_size=4,
            max_tokens=args.eval_max_tokens,
        )
        logger.log(step, ppl_id=ppl_id, ppl_ood=ppl_ood)
        print(f"step {step}: ppl_id={ppl_id:.4f} ppl_ood={ppl_ood:.4f}",
              flush=True)
        save_checkpoint(out_dir, meta["step"] + step, params, opt_state,
                        cfg, extra={"continuous_pretrain": True})

    loss = float("nan")
    for step in range(args.num_batches):
        batch = np.concatenate([
            sample(qa, args.batch_size - n_mix),
            sample(corpus, n_mix) if n_mix else
            np.zeros((0, args.seq_len + 1), np.int32),
        ])
        if mesh is not None:
            from nsa_tpu.parallel.train_step import sharded_train_step

            with mesh:
                params, opt_state, loss_dev = sharded_train_step(
                    params, opt_state, batch[None], cfg, optimizer, 1, mesh
                )
            if step % 20 == 0 or step == args.num_batches - 1:
                loss = float(loss_dev)
                logger.log(step, cpt_loss=loss)
            if args.eval_every and (step + 1) % args.eval_every == 0:
                eval_point(step + 1)
            continue
        params, opt_state, loss_dev = train_step(
            params, opt_state, jnp.asarray(batch)[None], cfg, optimizer, 1
        )
        # scalar readback only at log cadence (costs seconds on the tunnel)
        if step % 20 == 0 or step == args.num_batches - 1:
            loss = float(loss_dev)
            logger.log(step, cpt_loss=loss)
        if args.eval_every and (step + 1) % args.eval_every == 0:
            eval_point(step + 1)

    path = save_checkpoint(out_dir, meta["step"] + args.num_batches, params,
                           opt_state, cfg, extra={"loss": loss,
                                                  "continuous_pretrain": True})
    print(f"saved: {path}")


if __name__ == "__main__":
    main()
