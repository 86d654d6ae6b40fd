"""Whole-model decode megakernel == layer-by-layer decode path.

The megakernel (ops/pallas/nsa_megakernel.py) runs the ENTIRE decode step
in one pallas_call; these tests pin it token-for-token (and cache-state-
for-cache-state) against the per-layer ``transformer_decode_step`` path
across compression-emission boundaries, the same invariant class
tests/test_decode_equivalence.py pins for prefill==decode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_tpu.config import tiny_test_config
from nsa_tpu.models.transformer import (
    init_transformer,
    pack_mega_params,
    stack_decode_caches,
    transformer_decode_step,
    transformer_decode_step_mega,
    transformer_prefill,
)


def _cfg(**kw):
    return tiny_test_config(attn_impl="pallas", **kw)


def _rollout(cfg, b, prompt_len, steps, seed=0):
    """Run `steps` greedy decode steps on both paths; return per-step
    logits and the final caches from each."""
    key = jax.random.PRNGKey(seed)
    params = init_transformer(key, cfg)
    prompt = jax.random.randint(
        jax.random.PRNGKey(seed + 1), (b, prompt_len), 0, cfg.vocab_size
    )
    max_len = 64
    logits, cache = transformer_prefill(params, cfg, prompt, max_len)
    first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

    # --- reference: layer-by-layer decode ---------------------------------
    ref_logits = []
    tok, c = first, cache
    for _ in range(steps):
        lg, c = transformer_decode_step(params, cfg, tok, c)
        ref_logits.append(lg)
        tok = jnp.argmax(lg, -1).astype(jnp.int32)
    ref_cache = c

    # --- megakernel --------------------------------------------------------
    mp = pack_mega_params(params, cfg)
    kv, ckv, ring = stack_decode_caches(cache)
    mega_logits = []
    tok = first
    t = cache.seq_len
    for i in range(steps):
        lg, kv, ckv, ring = transformer_decode_step_mega(
            mp, cfg, tok, kv, ckv, ring, t + i
        )
        mega_logits.append(lg)
        tok = jnp.argmax(lg, -1).astype(jnp.int32)

    return ref_logits, mega_logits, ref_cache, (kv, ckv, ring)


class TestMegakernelEquivalence:
    def test_logits_match_across_emission_boundaries(self):
        cfg = _cfg()
        # stride=2: 10 steps cross several compressed-block emissions
        ref, mega, _, _ = _rollout(cfg, b=1, prompt_len=9, steps=10)
        for i, (a, m) in enumerate(zip(ref, mega)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(m), rtol=2e-4, atol=2e-4,
                err_msg=f"step {i}",
            )

    def test_greedy_tokens_identical(self):
        cfg = _cfg()
        ref, mega, _, _ = _rollout(cfg, b=1, prompt_len=13, steps=12)
        ref_toks = [int(np.asarray(jnp.argmax(a, -1))[0]) for a in ref]
        mega_toks = [int(np.asarray(jnp.argmax(m, -1))[0]) for m in mega]
        assert ref_toks == mega_toks

    def test_cache_state_matches(self):
        cfg = _cfg()
        _, _, ref_cache, (kv, ckv, ring) = _rollout(
            cfg, b=1, prompt_len=9, steps=8
        )
        for l, lc in enumerate(ref_cache.layers):
            np.testing.assert_allclose(
                np.asarray(lc.kv), np.asarray(kv[l]), rtol=2e-4, atol=2e-4,
                err_msg=f"kv layer {l}",
            )
            np.testing.assert_allclose(
                np.asarray(lc.ring), np.asarray(ring[l]), rtol=2e-4,
                atol=2e-4, err_msg=f"ring layer {l}",
            )
            # ckv: data rows only (the XLA path parks non-emission
            # candidates in the trash row; the kernels never write it)
            ncb = int(np.asarray(ref_cache.seq_len)) // \
                cfg.nsa.compress_block_sliding_stride
            np.testing.assert_allclose(
                np.asarray(lc.ckv[:, :, :ncb]), np.asarray(ckv[l][:, :, :ncb]),
                rtol=2e-4, atol=2e-4, err_msg=f"ckv layer {l}",
            )

    def test_batched_rows(self):
        cfg = _cfg()
        ref, mega, _, _ = _rollout(cfg, b=2, prompt_len=11, steps=6)
        for i, (a, m) in enumerate(zip(ref, mega)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(m), rtol=2e-4, atol=2e-4,
                err_msg=f"step {i}",
            )

    # bfloat16 is exercised on TPU by scripts/tpu_mega_smoke.py: the CPU
    # interpreter cannot execute bf16 x bf16 -> f32 dots (DotThunk), the
    # same reason the other kernel equivalence tests pin f32 on CPU.

    def test_in_kernel_greedy_matches_argmax(self):
        cfg = _cfg()
        key = jax.random.PRNGKey(7)
        params = init_transformer(key, cfg)
        prompt = jax.random.randint(
            jax.random.PRNGKey(8), (2, 9), 0, cfg.vocab_size)
        logits, cache = transformer_prefill(params, cfg, prompt, 64)
        first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        mp = pack_mega_params(params, cfg)
        kv, ckv, ring = stack_decode_caches(cache)
        tok, t = first, cache.seq_len
        for i in range(6):
            lg, nxt, kv, ckv, ring = transformer_decode_step_mega(
                mp, cfg, tok, kv, ckv, ring, t + i, greedy=True)
            want = np.asarray(jnp.argmax(lg, -1))
            np.testing.assert_array_equal(np.asarray(nxt)[:, 0], want)
            tok = nxt[:, 0]

    def test_multi_step_launch_matches_single_steps(self):
        """steps=4: one launch decodes 4 tokens with in-kernel greedy
        feedback — must match 4 single-step launches token-for-token."""
        cfg = _cfg()
        params = init_transformer(jax.random.PRNGKey(9), cfg)
        prompt = jax.random.randint(
            jax.random.PRNGKey(10), (1, 9), 0, cfg.vocab_size)
        logits, cache = transformer_prefill(params, cfg, prompt, 64)
        first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        mp = pack_mega_params(params, cfg)
        t0 = cache.seq_len

        kv, ckv, ring = stack_decode_caches(cache)
        tok = first
        single = []
        for i in range(8):
            _, nxt, kv, ckv, ring = transformer_decode_step_mega(
                mp, cfg, tok, kv, ckv, ring, t0 + i, greedy=True)
            single.append(int(np.asarray(nxt)[0, 0]))
            tok = nxt[:, 0]
        kv_s, ckv_s, ring_s = kv, ckv, ring

        kv, ckv, ring = stack_decode_caches(cache)
        tok = first
        multi = []
        for c in range(2):
            lg, toks, kv, ckv, ring = transformer_decode_step_mega(
                mp, cfg, tok, kv, ckv, ring, t0 + 4 * c, greedy=True,
                steps=4)
            multi.extend(int(x) for x in np.asarray(toks)[0])
            tok = toks[:, -1]

        assert single == multi
        for name, a, m in (("kv", kv_s, kv), ("ckv", ckv_s, ckv),
                           ("ring", ring_s, ring)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(m), rtol=2e-4, atol=2e-4,
                err_msg=name)

    def test_resident_weights_match_blocked(self):
        """Launch-resident weight staging (one VMEM weight DMA per launch)
        must be numerically identical to the blocked per-grid-step path,
        for single- and multi-token launches."""
        cfg = _cfg()
        params = init_transformer(jax.random.PRNGKey(11), cfg)
        prompt = jax.random.randint(
            jax.random.PRNGKey(12), (1, 9), 0, cfg.vocab_size)
        logits, cache = transformer_prefill(params, cfg, prompt, 64)
        first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        mp = pack_mega_params(params, cfg)
        t0 = cache.seq_len

        outs = {}
        for res in (False, True):
            kv, ckv, ring = stack_decode_caches(cache)
            lg1, kv, ckv, ring = transformer_decode_step_mega(
                mp, cfg, first, kv, ckv, ring, t0, resident=res)
            tok = jnp.argmax(lg1, -1).astype(jnp.int32)
            _, toks, kv, ckv, ring = transformer_decode_step_mega(
                mp, cfg, tok, kv, ckv, ring, t0 + 1, greedy=True,
                steps=4, resident=res)
            outs[res] = (np.asarray(lg1), np.asarray(toks),
                         np.asarray(kv), np.asarray(ckv), np.asarray(ring))
        for a, b_ in zip(outs[False], outs[True]):
            np.testing.assert_array_equal(a, b_)

    def test_transformer_sample_mega_path(self):
        """transformer_sample mega path (default-on) == layer path."""
        import os

        from nsa_tpu.models.transformer import transformer_sample

        cfg = _cfg()
        params = init_transformer(jax.random.PRNGKey(5), cfg)
        prompt = jax.random.randint(
            jax.random.PRNGKey(6), (1, 11), 0, cfg.vocab_size)
        # mega is default-on since r5; the layer-path reference needs the
        # explicit opt-out
        os.environ["NSA_MEGA_DECODE"] = "0"
        try:
            ref = np.asarray(transformer_sample(params, cfg, prompt, 8))
        finally:
            os.environ.pop("NSA_MEGA_DECODE", None)
        mega = np.asarray(transformer_sample(params, cfg, prompt, 8))
        np.testing.assert_array_equal(ref, mega)

    def test_scan_rollout_matches_python_loop(self):
        """The jitted-scan form used by eval/efficiency.measure_decode."""
        cfg = _cfg()
        key = jax.random.PRNGKey(3)
        params = init_transformer(key, cfg)
        prompt = jax.random.randint(
            jax.random.PRNGKey(4), (1, 9), 0, cfg.vocab_size)
        logits, cache = transformer_prefill(params, cfg, prompt, 64)
        first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        mp = pack_mega_params(params, cfg)
        kv, ckv, ring = stack_decode_caches(cache)
        gen = 8

        @jax.jit
        def scan_rollout(mp, first, kv, ckv, ring, t0):
            def step(carry, i):
                tok, kv, ckv, ring = carry
                lg, kv, ckv, ring = transformer_decode_step_mega(
                    mp, cfg, tok, kv, ckv, ring, t0 + i)
                nxt = jnp.argmax(lg, -1).astype(jnp.int32)
                return (nxt, kv, ckv, ring), tok

            (_, _, _, _), toks = jax.lax.scan(
                step, (first, kv, ckv, ring), jnp.arange(gen))
            return toks

        toks = np.asarray(
            scan_rollout(mp, first, kv, ckv, ring, cache.seq_len))[:, 0]

        tok, t = first, cache.seq_len
        loop_toks = []
        for i in range(gen):
            loop_toks.append(int(np.asarray(tok)[0]))
            lg, kv2, ckv2, ring2 = transformer_decode_step_mega(
                mp, cfg, tok, kv, ckv, ring, t + i)
            kv, ckv, ring = kv2, ckv2, ring2
            tok = jnp.argmax(lg, -1).astype(jnp.int32)
        assert list(toks) == loop_toks


class TestHeadBatchFormulations:
    def test_headbatch_matches_per_head_body(self):
        """The head-batched kernel body (default) and the per-head body
        compute the same step: logits AND cache state, across emission
        boundaries.  Guards the NSA_MEGA_HB=0 fallback now that the
        head-batched body is the default (r5)."""
        cfg = _cfg()
        key = jax.random.PRNGKey(3)
        params = init_transformer(key, cfg)
        prompt = jax.random.randint(
            jax.random.PRNGKey(4), (2, 11), 0, cfg.vocab_size)
        _, cache = transformer_prefill(params, cfg, prompt, 64)
        mp = pack_mega_params(params, cfg)
        t0 = cache.seq_len
        tok = jnp.array([1, 7], jnp.int32)

        outs = {}
        for hb in (True, False):
            kv, ckv, ring = stack_decode_caches(cache)
            logits = []
            tk, t = tok, t0
            for i in range(6):
                lg, kv, ckv, ring = transformer_decode_step_mega(
                    mp, cfg, tk, kv, ckv, ring, t + i, headbatch=hb)
                logits.append(np.asarray(lg))
                tk = jnp.argmax(lg, -1).astype(jnp.int32)
            outs[hb] = (logits, np.asarray(kv), np.asarray(ckv),
                        np.asarray(ring))

        for a, b in zip(outs[True][0], outs[False][0]):
            np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-4)
        for a, b in zip(outs[True][1:], outs[False][1:]):
            np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-4)
