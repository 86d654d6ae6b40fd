#!/usr/bin/env python
"""Weak-scaling benchmark over device counts (BASELINE.json config 5).

Measures training-step throughput (tokens/s) and decode throughput on
(data x heads) meshes of increasing size.  On real multi-chip hardware the
mesh spans chips/hosts over ICI/DCN; in this single-chip environment run
with virtual CPU devices to validate the scaling *structure*:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python scripts/scaling_bench.py --devices 1 2 4 8

Weak scaling: per-device work is held CONSTANT (global batch = per-device
batch x total devices), so ideal scaling keeps step time flat on real
hardware.  On a virtual CPU mesh all "devices" share one host's cores, so
step time inherently grows ~N x; there the efficiency is host-normalized
(N * t1 / tN), which isolates the quantity that is actually measurable on
a shared host: sharding/communication overhead beyond the inherent N x
compute (resharding pathologies push it below 1; values above 1 simply
mean the larger virtual mesh recruits more of the host's cores, i.e. no
sharding pathology).  The CSV records which normalization was used.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nsa_tpu.config import TrainConfig, tiny_test_config
from nsa_tpu.models.transformer import init_transformer
from nsa_tpu.parallel.mesh import auto_mesh
from nsa_tpu.parallel.sharding import shard_batch, shard_params
from nsa_tpu.parallel.train_step import sharded_train_step
from nsa_tpu.train.pretrain import make_optimizer
from nsa_tpu.utils.metrics import CSVLogger


def bench_mesh(n_devices: int, model_cfg, seq_len: int, per_device_batch: int,
               iters: int = 5):
    mesh = auto_mesh(n_devices, kv_heads=model_cfg.kv_heads)
    data_par = mesh.devices.shape[0]
    # weak scaling: per-device work constant => global batch scales with
    # the TOTAL device count (heads-TP shards attention work per device too)
    global_batch = per_device_batch * n_devices
    train_cfg = TrainConfig(batch_size=global_batch, seq_len=seq_len,
                            grad_accum_every=1)
    with mesh:
        params = shard_params(
            init_transformer(jax.random.PRNGKey(0), model_cfg), mesh
        )
        optimizer = make_optimizer(train_cfg)
        opt_state = jax.jit(optimizer.init)(params)
        batch = np.zeros((1, global_batch, seq_len + 1), np.int32)

        def step():
            nonlocal params, opt_state
            params, opt_state, loss = sharded_train_step(
                params, opt_state, batch, model_cfg, optimizer, 1, mesh
            )
            return loss

        jax.block_until_ready(step())
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(step())
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
    tokens = global_batch * seq_len
    return {
        "n_devices": n_devices,
        "mesh_data": data_par,
        "mesh_heads": mesh.devices.shape[1],
        "global_batch": global_batch,
        "seq_len": seq_len,
        "step_ms": round(dt * 1000, 2),
        "step_s": dt,
        "tokens_per_s": round(tokens / dt, 1),
        "tokens_per_s_per_device": round(tokens / dt / n_devices, 1),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--devices", nargs="+", type=int, default=[1, 2, 4, 8])
    p.add_argument("--seq-len", type=int, default=128)
    p.add_argument("--per-device-batch", type=int, default=2)
    p.add_argument("--csv", default="exp_result/scaling.csv")
    p.add_argument("--force-cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin ignores "
                        "JAX_PLATFORMS=cpu set via env var); combine with "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N")
    args = p.parse_args()

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    model_cfg = tiny_test_config(heads=8, kv_heads=4, dim=128, dim_head=16)
    avail = jax.device_count()
    shared_host = jax.default_backend() == "cpu"
    logger = CSVLogger(args.csv)
    base_t, base_n = None, None
    for n in args.devices:
        if n > avail:
            print(f"skip {n} devices (only {avail} available)")
            continue
        row = bench_mesh(n, model_cfg, args.seq_len, args.per_device_batch)
        if base_t is None:
            base_t, base_n = row["step_s"], n
        if shared_host:
            # Virtual CPU devices share one host's cores: neither weak-
            # scaling efficiency nor speedup is defined here (the round-2
            # host-normalized formula produced "efficiency" 2.6 — it was
            # measuring host-core recruitment, not sharding quality).
            # Record raw step times only and mark the rows as structural
            # validation; real efficiency must come from real chips.
            row["weak_scaling_efficiency"] = ""
            row["metric_validity"] = "structural_only_cpu_mesh"
        else:
            # real hardware, weak scaling: ideal keeps step time flat
            row["weak_scaling_efficiency"] = round(
                base_t / row["step_s"], 3
            )
            row["metric_validity"] = "real_devices"
        del row["step_s"]
        logger.append(row)
        print(row)


if __name__ == "__main__":
    main()
