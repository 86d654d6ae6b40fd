#!/usr/bin/env python
"""On-chip validation + A/B timing of the whole-model decode megakernel.

Three gates, in order (fast signal before any long benchmark):

1. COMPILE+RUN: one megakernel step at the reference config (bf16,
   max_len 4096) — catches Mosaic legality issues (stacked ref
   transforms, vector->scalar extraction feeding DMA addresses, the
   lane-swap rotary matmul, iota-matmul gate extraction).
2. CORRECTNESS: TEACHER-FORCED rollout vs the layer-by-layer decode path
   in the same process — both paths consume the layer path's greedy token
   stream, then (a) the caches (kv rows written this rollout, ckv slots,
   ring) must match to bf16 tolerance and (b) per-step logits must stay
   within --logit-tol.  Greedy-token agreement is reported but is NOT a
   failure: the two paths are different bf16 programs, and a near-tied
   fine-block selection can legitimately flip on rounding (observed on
   chip at the first step whose selection depends on two in-launch
   emissions, r4 smoke2) — that amplifies through greedy feedback without
   either path being wrong.  For an exact check run --f32 (token-exact
   expected, verified on CPU interpret and coverable on chip).
3. TIMING: gen-N decode scan, megakernel vs the fused 2-kernel path vs
   full attention, at bs 1 (the dispatch-bound regime this kernel
   exists for; RESULTS.md r4 "bs-1 device floor is launch-count").

  python scripts/tpu_mega_smoke.py [--batch 1] [--gen 200] [--prompt 128]
  python scripts/tpu_mega_smoke.py --skip-timing      # gates 1+2 only
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    # JAX_PLATFORMS is ignored once the axon TPU plugin registers; the
    # config route (as in tests/conftest.py) is the one that works
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from nsa_tpu.config import reference_model_config
from nsa_tpu.eval.efficiency import _time_fn
from nsa_tpu.models.transformer import (
    fuse_decode_params,
    init_transformer,
    pack_mega_params,
    stack_decode_caches,
    transformer_decode_step,
    transformer_decode_step_mega,
    transformer_prefill,
)
from nsa_tpu.ops.common import lazy_jit


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def decode_scan_mega(cfg, gen, steps=1, resident=None):
    @lazy_jit
    def scan(mp, first, kv, ckv, ring, t0):
        def step(carry, i):
            tok, kv, ckv, ring = carry
            _, toks, kv, ckv, ring = transformer_decode_step_mega(
                mp, cfg, tok, kv, ckv, ring, t0 + i * steps,
                greedy=True, steps=steps, resident=resident)
            return (toks[:, -1], kv, ckv, ring), toks

        (_, _, _, _), toks = jax.lax.scan(
            step, (first, kv, ckv, ring), jnp.arange(gen // steps))
        return toks
    return scan


def decode_scan_layers(cfg, gen):
    @lazy_jit
    def scan(p, first, cache):
        def step(carry, _):
            tok, cache = carry
            lg, cache = transformer_decode_step(p, cfg, tok, cache)
            nxt = jnp.argmax(lg, -1).astype(jnp.int32)
            return (nxt, cache), tok

        (_, _), toks = jax.lax.scan(step, (first, cache), None, length=gen)
        return toks
    return scan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--gen", type=int, default=200)
    ap.add_argument("--max-len", type=int, default=4096)
    ap.add_argument("--skip-timing", action="store_true")
    ap.add_argument("--logit-tol", type=float, default=None,
                    help="gate-2 per-step logit tolerance (default: 1e-3 "
                         "under --f32, 0.5 in bf16 — a flipped near-tied "
                         "block selection legitimately moves logits)")
    ap.add_argument("--f32", action="store_true",
                    help="float32 (CPU interpret dry-runs; TPU uses bf16)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (handled at import)")
    args = ap.parse_args()
    b, gen = args.batch, args.gen
    DT = jnp.float32 if args.f32 else jnp.bfloat16
    on_cpu = jax.default_backend() == "cpu"
    if args.logit_tol is None:
        # f32 on CPU is true f32 -> near-exact.  f32 on TPU is NOT: the
        # MXU lowers f32 dots through bf16 multiply passes at default
        # precision, and the two paths group/round differently (measured
        # on chip r5: logit maxdiff 0.0076, cache err <= 0.0093, with
        # 24/24 greedy agreement) -> 0.05 bounds that regime with margin.
        # bf16 on chip measured 0.0156 max (r5, 23/24 greedy agreement);
        # 0.1 gives ~6x margin while still catching real kernel bugs
        # (the r4 greedy-rollout divergence was 2.32)
        args.logit_tol = (1e-3 if on_cpu else 0.05) if args.f32 else 0.1

    cfg = reference_model_config("mlp").replace(
        dtype="float32" if args.f32 else "bfloat16",
        attn_impl="pallas", attn_chunk_size=128)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(DT), params)
    params = fuse_decode_params(params, cfg)
    prompt = jax.random.randint(
        jax.random.PRNGKey(1), (b, args.prompt), 0, cfg.vocab_size)

    log(f"prefill (bs {b}, prompt {args.prompt}, max_len {args.max_len})...")
    prefill = lazy_jit(
        lambda p, i: transformer_prefill(p, cfg, i, args.max_len))
    logits, cache = jax.block_until_ready(prefill(params, prompt))
    first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    log("prefill ok")

    # jitted single steps: the scoped-VMEM compiler option rides lazy_jit,
    # and an eager layer-path step would dispatch ~150 tiny ops per call
    # through the tunnel
    step_mega = lazy_jit(
        lambda mp, tok, kv, ckv, ring, t: transformer_decode_step_mega(
            mp, cfg, tok, kv, ckv, ring, t))
    step_ref = lazy_jit(
        lambda p, tok, c: transformer_decode_step(p, cfg, tok, c))

    # ---- gate 1: megakernel compiles + runs --------------------------------
    mp = pack_mega_params(params, cfg)
    kv, ckv, ring = stack_decode_caches(cache)
    t0 = cache.seq_len
    log("compiling megakernel step (2-10 min cold)...")
    lg, kv, ckv, ring = jax.block_until_ready(
        step_mega(mp, first, kv, ckv, ring, t0))
    log(f"megakernel step ok; logits[0,:3]={np.asarray(lg)[0, :3]}")

    # ---- gate 2: teacher-forced equivalence vs the layer path --------------
    steps = 24  # crosses 3 emission boundaries at stride 8
    tok, c = first, cache
    ref_lgs, forced = [], []
    for _ in range(steps):
        lg_r, c = step_ref(params, tok, c)
        tok = jnp.argmax(lg_r, -1).astype(jnp.int32)
        ref_lgs.append(np.asarray(lg_r, np.float32))
        forced.append(np.asarray(tok).copy())
    kv_r, ckv_r, ring_r = map(np.asarray, stack_decode_caches(c))

    kv, ckv, ring = stack_decode_caches(cache)
    tok = first
    mega_lgs = []
    for i in range(steps):
        lg_m, kv, ckv, ring = step_mega(mp, tok, kv, ckv, ring, t0 + i)
        mega_lgs.append(np.asarray(lg_m, np.float32))
        tok = jnp.asarray(forced[i])   # follow the layer path's stream
    kv_m, ckv_m, ring_m = map(np.asarray, (kv, ckv, ring))

    per_step = [float(np.abs(a - m).max()) for a, m in zip(ref_lgs, mega_lgs)]
    agree = sum(int((np.argmax(m, -1) == f).all())
                for m, f in zip(mega_lgs, forced))
    t_last = t0 + steps - 1
    # compare only state this rollout touched / selection can see: the kv
    # rows written (t0..t_last), every ckv slot emitted by the end of the
    # rollout — (t_last+1)//stride, including the slot emitted ON the final
    # step, the most boundary-sensitive one (the layer path also writes a
    # trash/spare row beyond that which the megakernel doesn't) — and the
    # whole ring (same teacher-forced token stream on both sides)
    num_cb = (t_last + 1) // cfg.nsa.compress_block_sliding_stride
    kv_err = float(np.abs(
        kv_r[:, :, :, t0:t_last + 1].astype(np.float32)
        - kv_m[:, :, :, t0:t_last + 1].astype(np.float32)).max())
    ckv_err = float(np.abs(
        ckv_r[:, :, :, :num_cb].astype(np.float32)
        - ckv_m[:, :, :, :num_cb].astype(np.float32)).max())
    ring_err = float(np.abs(ring_r.astype(np.float32)
                            - ring_m.astype(np.float32)).max())
    log(f"teacher-forced rollout {steps} steps: "
        f"logit maxdiff per-step max={max(per_step):.4f} "
        f"greedy agreement {agree}/{steps}")
    log("per-step logit maxdiff: "
        + " ".join(f"{v:.3f}" for v in per_step))
    log(f"cache state: kv_err={kv_err:.5f} ckv_err={ckv_err:.5f} "
        f"ring_err={ring_err:.5f}")
    cache_tol = (1e-4 if on_cpu else 0.05) if args.f32 else 0.05
    if kv_err > cache_tol or ckv_err > cache_tol or ring_err > cache_tol:
        log(f"FAIL: cache state mismatch (tol {cache_tol})")
        sys.exit(1)
    if max(per_step) > args.logit_tol:
        bad = per_step.index(max(per_step))
        log(f"FAIL: logits diverge at step {bad} "
            f"({max(per_step):.4f} > tol {args.logit_tol})")
        sys.exit(1)

    if args.skip_timing:
        log("smoke ok (timing skipped)")
        return

    # ---- gate 3: timing A/B -------------------------------------------------
    log(f"timing megakernel scan (gen {gen})...")
    kv, ckv, ring = stack_decode_caches(cache)
    scan_m = decode_scan_mega(cfg, gen)
    dt_m = _time_fn(scan_m, mp, first, kv, ckv, ring, t0,
                    warmup=1, iters=5, vary=1)
    log(f"mega: {dt_m * 1e3 / gen:.4f} ms/step "
        f"({b * gen / dt_m:.0f} tok/s)")

    log("timing megakernel scan, 8 tokens per launch (blocked weights)...")
    scan_m8b = decode_scan_mega(cfg, gen, steps=8, resident=False)
    dt_m8b = _time_fn(scan_m8b, mp, first, kv, ckv, ring, t0,
                      warmup=1, iters=5, vary=1)
    log(f"mega-x8-blocked: {dt_m8b * 1e3 / gen:.4f} ms/step "
        f"({b * gen / dt_m8b:.0f} tok/s)")

    if b <= 4:
        log("timing megakernel scan, 8 tokens/launch (resident weights)...")
        scan_m8 = decode_scan_mega(cfg, gen, steps=8, resident=True)
        dt_m8 = _time_fn(scan_m8, mp, first, kv, ckv, ring, t0,
                         warmup=1, iters=5, vary=1)
        log(f"mega-x8: {dt_m8 * 1e3 / gen:.4f} ms/step "
            f"({b * gen / dt_m8:.0f} tok/s)")
    else:
        # resident + b-scaled launch caches exceed the 64 MiB scoped-VMEM
        # limit (65.46 MB at bs 8, r5); decode_step_mega clamps it off
        log("skipping resident x8 (b > 4: scoped-VMEM clamp)")
        dt_m8 = dt_m8b

    log("timing megakernel scan, 32 tokens per launch...")
    gen32 = (gen // 32) * 32 or 32        # whole launches only
    scan_m32 = decode_scan_mega(cfg, gen32, steps=32,
                                resident=True if b <= 4 else False)
    dt32_raw = _time_fn(scan_m32, mp, first, kv, ckv, ring, t0,
                        warmup=1, iters=5, vary=1)
    dt_m32 = dt32_raw * gen / gen32       # normalized to gen tokens
    log(f"mega-x32: {dt32_raw * 1e3 / gen32:.4f} ms/step "
        f"({b * gen32 / dt32_raw:.0f} tok/s)")

    log("timing fused 2-kernel path scan...")
    scan_l = decode_scan_layers(cfg, gen)
    dt_l = _time_fn(scan_l, params, first, cache, warmup=1, iters=5, vary=1)
    log(f"fused-2k: {dt_l * 1e3 / gen:.4f} ms/step "
        f"({b * gen / dt_l:.0f} tok/s)")

    log("timing full attention scan...")
    cfg_f = reference_model_config(
        "mlp", use_sparse_attn=False).replace(
        dtype="float32" if args.f32 else "bfloat16",
        attn_impl="xla", attn_chunk_size=128)
    params_f = jax.tree_util.tree_map(
        lambda x: x.astype(DT),
        init_transformer(jax.random.PRNGKey(0), cfg_f))
    prefill_f = lazy_jit(
        lambda p, i: transformer_prefill(p, cfg_f, i, args.max_len))
    lg_f, cache_f = jax.block_until_ready(prefill_f(params_f, prompt))
    first_f = jnp.argmax(lg_f[:, -1], -1).astype(jnp.int32)
    scan_f = decode_scan_layers(cfg_f, gen)
    dt_f = _time_fn(scan_f, params_f, first_f, cache_f,
                    warmup=1, iters=5, vary=1)
    log(f"full-attn: {dt_f * 1e3 / gen:.4f} ms/step "
        f"({b * gen / dt_f:.0f} tok/s)")
    best = min(dt_m8, dt_m32)
    log(f"SUMMARY bs={b} gen={gen} max_len={args.max_len}: "
        f"mega {dt_m * 1e3 / gen:.4f} ms | mega-x8-blocked "
        f"{dt_m8b * 1e3 / gen:.4f} ms | mega-x8 {dt_m8 * 1e3 / gen:.4f} ms "
        f"| mega-x32 {dt32_raw * 1e3 / gen32:.4f} ms "
        f"| fused {dt_l * 1e3 / gen:.4f} ms "
        f"| full {dt_f * 1e3 / gen:.4f} ms | full/mega-best = "
        f"{dt_f / best:.2f}x")


if __name__ == "__main__":
    main()
