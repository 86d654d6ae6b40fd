"""Efficiency benchmark: prefill and decode throughput + KV-access savings.

Equivalent of the reference's E1 benchmark (reference:
evaluation/efficiency.py:190-380) with the same CSV schema
(``efficiency_step5000*.csv``): per (model_type, batch_size, prompt_len)
measure prefill tokens/s (repeated timed full-prompt forwards), decode
tokens/s (prefill once, then gen_len greedy cached token steps), and the
analytic KV-cache access-saving ratio
``1 - min(len, window + k*block) / len`` (reference:
evaluation/efficiency.py:349-361).

Timing uses ``block_until_ready`` brackets (the TPU analogue of the
reference's CUDA-event timing, SURVEY.md section 5), with warmup so
compile time is excluded.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.transformer import (
    fuse_decode_params,
    pack_mega_params,
    stack_decode_caches,
    transformer_decode_step,
    transformer_decode_step_mega,
    transformer_forward,
    transformer_prefill,
    use_mega_decode,
)
from ..ops.common import lazy_jit, round_up_mult
from ..utils.metrics import CSVLogger


def _time_fn(fn, *args, warmup: int = 2, iters: int = 5,
             vary: Optional[int] = None) -> float:
    """Average wall time per call (seconds), post-warmup.

    ``vary`` names an int32-array argument position that is perturbed on
    every call: the remote TPU backend short-circuits executions whose
    program AND input buffers are identical to a previous request, which
    silently turns repeat-timing into dispatch-only timing.  The final
    result is materialized (tiny d2h) so in-order execution guarantees all
    timed calls actually completed.
    """
    def call(i):
        a = list(args)
        if vary is not None:
            a[vary] = (a[vary] + i) % 250
        return fn(*a)

    r = None
    for i in range(warmup):
        r = call(i)
    if r is not None:
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for i in range(iters):
        r = call(warmup + i)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def kv_cache_saving_ratio(cfg: ModelConfig, prompt_len: int) -> float:
    """Analytic per-query KV-access saving (reference:
    evaluation/efficiency.py:349-361)."""
    if not cfg.use_sparse_attn:
        return 0.0
    nsa = cfg.nsa
    selected = nsa.sliding_window_size + nsa.num_selected_blocks * nsa.selection_block_size
    return 1.0 - min(prompt_len, selected) / prompt_len


def _pick_mega_steps(gen_len: int) -> int:
    """Tokens per megakernel launch for a gen_len rollout.

    The launch cost amortizes across the chunk (r5 A/B: x32 is ~4% under
    x8 at bs 1 and ~6% at bs 8), so pick the LARGEST divisor of gen_len
    up to the cap — the old halve-from-8 rule dropped gen 100 to x4
    chunks.  NSA_MEGA_STEPS caps it (default 32)."""
    import os

    cap = int(os.environ.get("NSA_MEGA_STEPS", "32"))
    cap = max(1, min(cap, gen_len))
    for s in range(cap, 0, -1):
        if gen_len % s == 0:
            return s
    return 1


def measure_prefill(params, cfg: ModelConfig, batch_size: int, prompt_len: int,
                    iters: int = 5) -> float:
    """Prefill throughput in tokens/s (full-prompt forward)."""
    ids = jnp.zeros((batch_size, prompt_len), jnp.int32)
    # params as jit ARGUMENTS: closed-over arrays become HLO constants and
    # can exceed the remote-compile request size limit (HTTP 413)
    fwd = lazy_jit(lambda p, i: transformer_forward(p, cfg, i))
    dt = _time_fn(fwd, params, ids, iters=iters, vary=1)
    return batch_size * prompt_len / dt


def measure_decode(
    params, cfg: ModelConfig, batch_size: int, prompt_len: int, gen_len: int = 100,
    iters: int = 3, seq_len: Optional[int] = None,
) -> float:
    """Decode throughput in tokens/s: prefill once then ``gen_len`` greedy
    cached steps inside one jitted scan (total tokens = bs * gen_len,
    matching the reference's metric, evaluation/efficiency.py:269-320).

    ``seq_len`` pins the static cache length (the reference times every
    cell against its seq-4096 cache; full attention's cost scales with
    max_len, so an auto-shrunk cache is a different — easier — cell)."""
    stride = cfg.nsa.compress_block_sliding_stride if cfg.use_sparse_attn else 1
    blk = max(stride, cfg.nsa.selection_block_size if cfg.use_sparse_attn else 1, 128)
    max_len = round_up_mult(
        max(prompt_len + gen_len + 1, seq_len or 0), blk)
    params = fuse_decode_params(params, cfg)
    ids = jnp.zeros((batch_size, prompt_len), jnp.int32)

    prefill = lazy_jit(
        lambda p, i: transformer_prefill(p, cfg, i, max_len)
    )
    logits, cache = jax.block_until_ready(prefill(params, ids))
    first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

    if cfg.use_sparse_attn and use_mega_decode(cfg, batch_size):
        # whole-model megakernel: ONE Pallas launch decodes NSA_MEGA_STEPS
        # tokens with in-kernel greedy feedback (the dispatch-bound
        # small-batch regime, ops/pallas/nsa_megakernel.py)
        mega_steps = _pick_mega_steps(gen_len)
        mp = pack_mega_params(params, cfg)
        kv, ckv, ring = stack_decode_caches(cache)
        t0 = cache.seq_len

        @lazy_jit
        def decode_scan(mp, first, kv, ckv, ring, t0):
            def step(carry, i):
                tok, kv, ckv, ring = carry
                # greedy argmax runs IN-KERNEL: the scan body is one
                # device op per mega_steps tokens plus the position counter
                _, toks, kv, ckv, ring = transformer_decode_step_mega(
                    mp, cfg, tok, kv, ckv, ring, t0 + i * mega_steps,
                    greedy=True, steps=mega_steps,
                )
                return (toks[:, -1], kv, ckv, ring), toks

            (_, _, _, _), toks = jax.lax.scan(
                step, (first, kv, ckv, ring),
                jnp.arange(gen_len // mega_steps)
            )
            return toks

        dt = _time_fn(decode_scan, mp, first, kv, ckv, ring, t0,
                      warmup=1, iters=iters, vary=1)
        return batch_size * gen_len / dt

    @lazy_jit
    def decode_scan(p, first, cache):
        def step(carry, _):
            tok, cache = carry
            logits, cache = transformer_decode_step(p, cfg, tok, cache)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, cache), tok
        (_, _), toks = jax.lax.scan(step, (first, cache), None, length=gen_len)
        return toks

    dt = _time_fn(decode_scan, params, first, cache, warmup=1, iters=iters,
                  vary=1)
    return batch_size * gen_len / dt


def run_efficiency_sweep(
    params,
    cfg: ModelConfig,
    model_type: str,
    batch_sizes,
    prompt_lens,
    gen_len: int = 100,
    seq_len: Optional[int] = None,
    csv_path: Optional[str] = None,
    step: int = 0,
) -> list:
    """Compile-economical (bs x prompt_len) sweep.

    Prefill uses serving-style admission buckets: each prompt is
    right-padded to the smallest power-of-two bucket that holds it (the
    serving engine's semantics, serve.py:bucketed_prefill) and prefilled
    with its true length, so short prompts pay the small-bucket cost, not
    the max_len cost.  One prefill program per (bs, distinct bucket) and
    one decode-scan program per bs; an exact per-config build would
    compile O(|bs| x |prompts|) distinct TPU programs at minutes each.

    Honesty notes recorded in the CSV: ``max_len`` is the static cache
    capacity every decode row runs against; ``prefill_tokens_per_s``
    counts only true prompt tokens over the padded-bucket forward time,
    with the padded-work rate in ``prefill_bucket_tokens_per_s`` and the
    bucket itself in ``prefill_bucket``.
    """
    prompt_lens = list(prompt_lens)
    params = fuse_decode_params(params, cfg)
    stride = cfg.nsa.compress_block_sliding_stride if cfg.use_sparse_attn else 1
    blk = max(stride, cfg.nsa.selection_block_size if cfg.use_sparse_attn else 1, 128)
    need = max(max(prompt_lens) + gen_len + 1, seq_len or 0)
    max_len = round_up_mult(need, blk)
    rows = []

    for bs in batch_sizes:
        @lazy_jit
        def prefill_first(p, ids, tl):
            logits, cache = transformer_prefill(
                p, cfg, ids, max_len, true_len=tl
            )
            last = logits[jnp.arange(ids.shape[0]), tl - 1]
            return jnp.argmax(last, -1).astype(jnp.int32), cache

        # the decode policy rows must measure what the framework actually
        # runs: the whole-model megakernel for b <= 8 (default since r5),
        # the per-layer step above
        mega = cfg.use_sparse_attn and use_mega_decode(cfg, bs)
        if mega:
            mega_steps = _pick_mega_steps(gen_len)
            mp = pack_mega_params(params, cfg)

            @lazy_jit
            def decode_scan_mega(mp, first, kv, ckv, ring, t0):
                def step_fn(carry, i):
                    tok, kv, ckv, ring = carry
                    _, toks, kv, ckv, ring = transformer_decode_step_mega(
                        mp, cfg, tok, kv, ckv, ring, t0 + i * mega_steps,
                        greedy=True, steps=mega_steps,
                    )
                    return (toks[:, -1], kv, ckv, ring), toks

                (_, _, _, _), toks = jax.lax.scan(
                    step_fn, (first, kv, ckv, ring),
                    jnp.arange(gen_len // mega_steps)
                )
                return toks

        @lazy_jit
        def decode_scan(p, first, cache):
            def step_fn(carry, _):
                tok, cache = carry
                logits, cache = transformer_decode_step(p, cfg, tok, cache)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (nxt, cache), tok

            (_, _), toks = jax.lax.scan(
                step_fn, (first, cache), None, length=gen_len
            )
            return toks

        for prompt_len in prompt_lens:
            # serving-style admission bucket: the prompt is right-padded to
            # the smallest power-of-two bucket that holds it (serve.py
            # buckets), NOT to max_len — short prompts no longer pay the
            # full-capacity prefill (VERDICT r2 weak #7).  The decode cache
            # is still built at max_len capacity.
            bucket = 128
            while bucket < prompt_len + 1:
                bucket *= 2
            bucket = min(bucket, max_len)
            ids = jnp.zeros((bs, bucket), jnp.int32)
            tl = jnp.asarray(prompt_len, jnp.int32)
            dt_pre = _time_fn(prefill_first, params, ids, tl, iters=3, vary=1)
            first, cache = jax.block_until_ready(
                prefill_first(params, ids, tl)
            )
            if mega:
                kv, ckv, ring = stack_decode_caches(cache)
                dt_dec = _time_fn(
                    decode_scan_mega, mp, first, kv, ckv, ring,
                    cache.seq_len, warmup=1, iters=3, vary=1)
            else:
                dt_dec = _time_fn(decode_scan, params, first, cache,
                                  warmup=1, iters=3, vary=1)
            row = {
                "model_type": model_type,
                "step": step,
                "seq_len": seq_len or max_len,
                "batch_size": bs,
                "prompt_len": prompt_len,
                "gen_len": gen_len,
                "max_len": max_len,
                "prefill_bucket": bucket,
                "prefill_tokens_per_s": round(bs * prompt_len / dt_pre, 1),
                "prefill_bucket_tokens_per_s": round(bs * bucket / dt_pre, 1),
                "decode_tokens_per_s": round(bs * gen_len / dt_dec, 1),
                "kv_cache_saving_ratio": round(
                    kv_cache_saving_ratio(cfg, prompt_len), 4
                ),
            }
            rows.append(row)
            if csv_path:
                CSVLogger(csv_path).append(row)
            print("efficiency:", row, flush=True)
            del cache
    return rows


def run_efficiency_eval(
    params,
    cfg: ModelConfig,
    model_type: str,
    batch_size: int,
    prompt_len: int,
    gen_len: int = 100,
    seq_len: Optional[int] = None,
    csv_path: Optional[str] = None,
    step: int = 0,
) -> dict:
    prefill_tps = measure_prefill(params, cfg, batch_size, prompt_len)
    decode_tps = measure_decode(
        params, cfg, batch_size, prompt_len, gen_len, seq_len=seq_len)
    row = {
        "model_type": model_type,
        "step": step,
        "seq_len": seq_len or prompt_len,
        "batch_size": batch_size,
        "prompt_len": prompt_len,
        "gen_len": gen_len,
        "prefill_tokens_per_s": round(prefill_tps, 1),
        "decode_tokens_per_s": round(decode_tps, 1),
        "kv_cache_saving_ratio": round(kv_cache_saving_ratio(cfg, prompt_len), 4),
    }
    if csv_path:
        CSVLogger(csv_path).append(row)
    return row
