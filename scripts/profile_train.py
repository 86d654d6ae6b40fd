#!/usr/bin/env python
"""Training-step timing + xprof breakdown at seq 4096 (VERDICT r3 item 3).

Times the fwd+bwd train step for the sparse (Pallas) path across
attn_chunk_size values and the full-attention baseline, and captures an
xprof op breakdown for the default configuration.  Valid timing on this
backend = perturb inputs each call + materialize the result.

  python scripts/profile_train.py [--paths sparse,full] [--chunks 128,256,512]
      [--trace] [--batch 16] [--seq 4096]
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nsa_tpu.config import TrainConfig, reference_model_config
from nsa_tpu.models.transformer import init_transformer
from nsa_tpu.train.pretrain import make_optimizer, train_step


def time_train(cfg, batch_size, seq_len, reps=3, trace_dir=None):
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    train_cfg = TrainConfig(batch_size=batch_size, seq_len=seq_len,
                            grad_accum_every=1)
    optimizer = make_optimizer(train_cfg)
    opt_state = jax.jit(optimizer.init)(params)
    rs = np.random.RandomState(0)

    def batch(i):
        return jnp.asarray(
            rs.randint(0, 256, size=(1, batch_size, seq_len + 1)), jnp.int32
        )

    t0 = time.perf_counter()
    params, opt_state, loss = train_step(
        params, opt_state, batch(0), cfg, optimizer, 1
    )
    print(f"  compile+1st step: {time.perf_counter() - t0:.0f}s "
          f"loss={float(loss):.4f}", flush=True)
    ts = []
    for i in range(reps):
        b = batch(i + 1)
        t0 = time.perf_counter()
        params, opt_state, loss = train_step(
            params, opt_state, b, cfg, optimizer, 1
        )
        _ = float(loss)                     # materialize
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    tps = batch_size * seq_len / dt
    print(f"  step {dt*1000:.1f} ms -> {tps:,.0f} tok/s", flush=True)

    if trace_dir:
        os.system(f"rm -rf {trace_dir}")
        b = batch(99)
        with jax.profiler.trace(trace_dir):
            params, opt_state, loss = train_step(
                params, opt_state, b, cfg, optimizer, 1
            )
            _ = float(loss)
        xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
        print("  xplane:", xplanes, flush=True)
        if xplanes:
            from xprof.convert import raw_to_tool_data

            data, _ = raw_to_tool_data.xspace_to_tool_data(
                xplanes, "framework_op_stats", params={}
            )
            out = trace_dir + "_opstats.csv"
            with open(out, "wb" if isinstance(data, bytes) else "w") as f:
                f.write(data)
            print("  wrote", out, flush=True)
    return tps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", default="sparse,full")
    ap.add_argument("--chunks", default="128,256,512")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    results = {}
    for path in args.paths.split(","):
        if path == "sparse":
            for chunk in [int(c) for c in args.chunks.split(",")]:
                cfg = reference_model_config("mlp").replace(
                    dtype="bfloat16", attn_impl="pallas",
                    attn_chunk_size=chunk,
                )
                print(f"sparse pallas chunk={chunk}:", flush=True)
                results[f"sparse_c{chunk}"] = time_train(
                    cfg, args.batch, args.seq,
                    trace_dir=("/tmp/train_trace_sparse"
                               if args.trace and chunk == 128 else None),
                )
        else:
            cfg = reference_model_config(
                "mlp", use_sparse_attn=False
            ).replace(dtype="bfloat16", attn_impl="xla")
            print("full baseline:", flush=True)
            results["full"] = time_train(
                cfg, args.batch, args.seq,
                trace_dir="/tmp/train_trace_full" if args.trace else None,
            )
    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
