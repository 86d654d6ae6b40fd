"""Continuous-batching engine tests: engine output must equal the plain
cached sampler, including with bucketed prefill + teacher-forced prompt
tails and with staggered concurrent requests."""

import jax
import numpy as np
import pytest

from nsa_tpu.config import tiny_test_config
from nsa_tpu.models.transformer import init_transformer, transformer_sample
from nsa_tpu.serve import ContinuousBatchingEngine


@pytest.fixture(scope="module", params=[True, False],
                ids=["sparse", "full"])
def model(request):
    cfg = tiny_test_config(use_sparse_attn=request.param)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    return cfg, params


def reference_sample(params, cfg, prompt, gen_len):
    import jax.numpy as jnp

    out = transformer_sample(
        params, cfg, jnp.asarray(prompt)[None], gen_len, temperature=0.0
    )
    return np.asarray(out)[0]


class TestEngine:
    def test_single_request_matches_sampler(self, model):
        cfg, params = model
        prompt = np.arange(1, 10, dtype=np.int32)  # length 9 > bucket 8
        want = reference_sample(params, cfg, prompt, 6)
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=2, max_len=64, prefill_buckets=(8, 16)
        )
        rid = eng.add_request(prompt, max_new_tokens=6)
        outs = eng.run()
        np.testing.assert_array_equal(outs[rid], want)

    def test_exact_bucket_prompt(self, model):
        cfg, params = model
        prompt = np.arange(1, 9, dtype=np.int32)  # length 8 == bucket
        want = reference_sample(params, cfg, prompt, 5)
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=1, max_len=64, prefill_buckets=(8,)
        )
        rid = eng.add_request(prompt, max_new_tokens=5)
        outs = eng.run()
        np.testing.assert_array_equal(outs[rid], want)

    def test_concurrent_requests_isolated(self, model):
        cfg, params = model
        prompts = [
            np.arange(1, 10, dtype=np.int32),
            np.arange(40, 52, dtype=np.int32),
            np.arange(90, 98, dtype=np.int32),
        ]
        wants = [reference_sample(params, cfg, p, 5) for p in prompts]
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=2, max_len=64, prefill_buckets=(8, 16)
        )
        rids = [eng.add_request(p, max_new_tokens=5) for p in prompts]
        outs = eng.run()
        for rid, want in zip(rids, wants):
            np.testing.assert_array_equal(outs[rid], want)

    def test_continuous_admission(self, model):
        """A request added mid-flight completes correctly."""
        cfg, params = model
        p1 = np.arange(1, 10, dtype=np.int32)
        p2 = np.arange(30, 41, dtype=np.int32)
        w1 = reference_sample(params, cfg, p1, 8)
        w2 = reference_sample(params, cfg, p2, 4)
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=2, max_len=64, prefill_buckets=(8, 16)
        )
        r1 = eng.add_request(p1, max_new_tokens=8)
        for _ in range(3):
            eng.step()
        r2 = eng.add_request(p2, max_new_tokens=4)
        outs = eng.run()
        np.testing.assert_array_equal(outs[r1], w1)
        np.testing.assert_array_equal(outs[r2], w2)

    def test_multi_step_sync_matches_single(self, model):
        """steps_per_sync > 1 (on-device greedy scan between host syncs)
        is token-for-token identical to single-stepping."""
        cfg, params = model
        prompts = [
            np.arange(1, 10, dtype=np.int32),
            np.arange(40, 52, dtype=np.int32),
            np.arange(90, 98, dtype=np.int32),
        ]
        wants = [reference_sample(params, cfg, p, 7) for p in prompts]
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=2, max_len=64, prefill_buckets=(8, 16),
            steps_per_sync=4,
        )
        rids = [eng.add_request(p, max_new_tokens=7) for p in prompts]
        outs = eng.run()
        for rid, want in zip(rids, wants):
            np.testing.assert_array_equal(outs[rid], want)

    def test_multi_step_capacity_tail_single_steps(self, model):
        """When cache room shrinks below steps_per_sync the engine must
        finish on the single-step program (no per-remainder recompiles)
        and stay token-for-token exact up to cache-capacity retirement."""
        cfg, params = model
        prompt = np.arange(1, 10, dtype=np.int32)          # len 9
        want = reference_sample(params, cfg, prompt, 16)
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=1, max_len=16, prefill_buckets=(16,),
            steps_per_sync=4,
        )
        rid = eng.add_request(prompt, max_new_tokens=16)
        outs = eng.run()
        # capacity 15: 1 prefill + one 4-token sync + 2 single-step tail
        assert 1 <= len(outs[rid]) <= 16
        np.testing.assert_array_equal(outs[rid], want[: len(outs[rid])])

    def test_multi_step_stop_byte(self, model):
        cfg, params = model
        prompt = np.arange(1, 9, dtype=np.int32)
        full = reference_sample(params, cfg, prompt, 8)
        stop = int(full[2])
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=1, max_len=64, prefill_buckets=(8,),
            steps_per_sync=3,
        )
        rid = eng.add_request(prompt, max_new_tokens=8, stop_byte=stop)
        outs = eng.run()
        assert len(outs[rid]) <= 8
        np.testing.assert_array_equal(outs[rid], full[: len(outs[rid])])

    def test_overlong_prompt_rejected(self, model):
        cfg, params = model
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=1, max_len=32, prefill_buckets=(8,)
        )
        with pytest.raises(ValueError):
            eng.add_request(np.zeros(32, np.int32), max_new_tokens=4)

    def test_stop_byte(self, model):
        cfg, params = model
        prompt = np.arange(1, 9, dtype=np.int32)
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=1, max_len=64, prefill_buckets=(8,)
        )
        full = reference_sample(params, cfg, prompt, 8)
        stop = int(full[2])  # force an early stop at the 3rd token
        rid = eng.add_request(prompt, max_new_tokens=8, stop_byte=stop)
        outs = eng.run()
        assert len(outs[rid]) <= 8
        np.testing.assert_array_equal(outs[rid], full[: len(outs[rid])])


class TestEngineMesh:
    """Serving under a (data, heads) mesh: slots shard over data, KV heads
    over the TP axis (SURVEY 2.4 P1) — token-exact vs the single-device
    engine."""

    def test_mesh_engine_matches_single_device(self, model):
        from nsa_tpu.parallel.mesh import make_mesh

        cfg, params = model
        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 virtual devices")
        mesh = make_mesh(
            data=2, heads=2, devices=jax.devices()[:4]
        )
        prompts = [
            np.arange(1, 10, dtype=np.int32),
            np.arange(40, 52, dtype=np.int32),
            np.arange(90, 98, dtype=np.int32),
            np.arange(7, 14, dtype=np.int32),
        ]

        def run(mesh_arg):
            eng = ContinuousBatchingEngine(
                params, cfg, max_batch=4, max_len=64,
                prefill_buckets=(8, 16), mesh=mesh_arg,
            )
            rids = [eng.add_request(p, max_new_tokens=5) for p in prompts]
            outs = eng.run()
            return [outs[r] for r in rids]

        single = run(None)
        sharded = run(mesh)
        for s, m in zip(single, sharded):
            np.testing.assert_array_equal(s, m)

    def test_mesh_engine_multi_step(self, model):
        from nsa_tpu.parallel.mesh import make_mesh

        cfg, params = model
        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 virtual devices")
        mesh = make_mesh(
            data=2, heads=2, devices=jax.devices()[:4]
        )
        prompt = np.arange(1, 10, dtype=np.int32)
        want = reference_sample(params, cfg, prompt, 6)
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=2, max_len=64, prefill_buckets=(8, 16),
            steps_per_sync=3, mesh=mesh,
        )
        rid = eng.add_request(prompt, max_new_tokens=6)
        outs = eng.run()
        np.testing.assert_array_equal(outs[rid], want)


class TestEngineSampling:
    """Temperature / top-k sampling threaded through the engine
    (reference transformer.py:44-61; VERDICT r2 missing #2)."""

    def test_temperature_zero_is_greedy(self, model):
        cfg, params = model
        prompt = np.arange(1, 10, dtype=np.int32)
        want = reference_sample(params, cfg, prompt, 6)
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=1, max_len=64, prefill_buckets=(8, 16),
            steps_per_sync=3, temperature=0.0,
        )
        rid = eng.add_request(prompt, max_new_tokens=6)
        outs = eng.run()
        np.testing.assert_array_equal(outs[rid], want)

    @pytest.mark.parametrize("sps", [1, 3])
    def test_temperature_sampling_runs(self, model, sps):
        cfg, params = model
        prompt = np.arange(1, 10, dtype=np.int32)
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=2, max_len=64, prefill_buckets=(8, 16),
            steps_per_sync=sps, temperature=1.0, filter_thres=0.9, seed=7,
        )
        rid = eng.add_request(prompt, max_new_tokens=8)
        outs = eng.run()
        gen = outs[rid]
        assert len(gen) == 8
        assert np.all((gen >= 0) & (gen < cfg.vocab_size))

    def test_sampling_seed_reproducible(self, model):
        cfg, params = model
        prompt = np.arange(1, 10, dtype=np.int32)

        def run(seed):
            eng = ContinuousBatchingEngine(
                params, cfg, max_batch=1, max_len=64,
                prefill_buckets=(8, 16), steps_per_sync=2,
                temperature=0.8, seed=seed,
            )
            rid = eng.add_request(prompt, max_new_tokens=6)
            return eng.run()[rid]

        np.testing.assert_array_equal(run(3), run(3))


class TestEngineRaggedKernels:
    """The ragged fused Pallas kernels (per-row t) must drive the engine to
    the exact greedy tokens of the plain sampler (interpret mode on CPU)."""

    def test_pallas_ragged_engine_matches_sampler(self):
        import jax.numpy as jnp
        import nsa_tpu.ops.pallas.nsa_decode_fused as fused_mod

        cfg = tiny_test_config(attn_impl="pallas")
        params = init_transformer(jax.random.PRNGKey(0), cfg)
        prompts = [
            np.arange(1, 10, dtype=np.int32),
            np.arange(40, 52, dtype=np.int32),
            np.arange(90, 98, dtype=np.int32),
        ]
        wants = [reference_sample(params, cfg, p, 5) for p in prompts]

        calls = {"n": 0}
        orig = fused_mod.decode_select_emit_ragged

        def counted(*a, **kw):
            calls["n"] += 1
            return orig(*a, **kw)

        fused_mod.decode_select_emit_ragged = counted
        try:
            eng = ContinuousBatchingEngine(
                params, cfg, max_batch=4, max_len=64,
                prefill_buckets=(8, 16), steps_per_sync=2,
            )
            rids = [eng.add_request(p, max_new_tokens=5) for p in prompts]
            outs = eng.run()
        finally:
            fused_mod.decode_select_emit_ragged = orig
        assert calls["n"] > 0, "ragged fused kernels did not run"
        for rid, want in zip(rids, wants):
            np.testing.assert_array_equal(outs[rid], want)


class TestEnginePaged:
    """Paged KV pool (vLLM-style block allocator over the fused ragged
    kernels): token-exact vs the plain sampler, correct page accounting,
    and more concurrent slots than the dense pool at the same HBM."""

    @pytest.fixture(scope="class")
    def pallas_model(self):
        cfg = tiny_test_config(attn_impl="pallas")
        params = init_transformer(jax.random.PRNGKey(0), cfg)
        return cfg, params

    def test_paged_matches_sampler(self, pallas_model):
        cfg, params = pallas_model
        prompts = [
            np.arange(1, 10, dtype=np.int32),
            np.arange(40, 52, dtype=np.int32),
            np.arange(90, 98, dtype=np.int32),
        ]
        wants = [reference_sample(params, cfg, p, 5) for p in prompts]
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=4, max_len=64, prefill_buckets=(8, 16),
            paged_pool_pages=16, page_tokens=8,
        )
        rids = [eng.add_request(p, max_new_tokens=5) for p in prompts]
        outs = eng.run()
        for rid, want in zip(rids, wants):
            np.testing.assert_array_equal(outs[rid], want)
        # every page returned to the free list after retirement
        assert len(eng._free_pages) == 16
        assert np.all(eng.page_table == eng.trash_page)

    def test_paged_multi_step_matches_sampler(self, pallas_model):
        cfg, params = pallas_model
        prompts = [
            np.arange(1, 10, dtype=np.int32),
            np.arange(40, 52, dtype=np.int32),
        ]
        wants = [reference_sample(params, cfg, p, 7) for p in prompts]
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=2, max_len=64, prefill_buckets=(8, 16),
            steps_per_sync=3, paged_pool_pages=12, page_tokens=8,
        )
        rids = [eng.add_request(p, max_new_tokens=7) for p in prompts]
        outs = eng.run()
        for rid, want in zip(rids, wants):
            np.testing.assert_array_equal(outs[rid], want)

    def test_paged_pool_exhaustion_queues(self, pallas_model):
        """With pages for only ~one request in flight, later requests wait
        for retirement instead of failing — and still come out exact."""
        cfg, params = pallas_model
        prompts = [
            np.arange(1, 10, dtype=np.int32),
            np.arange(40, 52, dtype=np.int32),
            np.arange(90, 98, dtype=np.int32),
        ]
        wants = [reference_sample(params, cfg, p, 5) for p in prompts]
        # each request needs ceil((9..12 + 5 + 1)/8) = 2-3 pages; 3 pages
        # forces (near-)serial execution through a 4-slot engine
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=4, max_len=64, prefill_buckets=(8, 16),
            paged_pool_pages=3, page_tokens=8,
        )
        rids = [eng.add_request(p, max_new_tokens=5) for p in prompts]
        outs = eng.run()
        for rid, want in zip(rids, wants):
            np.testing.assert_array_equal(outs[rid], want)
        assert len(eng._free_pages) == 3

    def test_paged_capacity_beats_dense(self, pallas_model):
        """The capacity claim: at equal KV HBM, the paged pool admits MORE
        concurrent short requests than the dense slot pool.  Dense slots
        cost max_len rows each; short requests only reserve their
        lifetime's pages."""
        cfg, params = pallas_model
        max_len, page = 64, 8
        # dense pool HBM equivalent: max_batch=2 slots x 64 rows = 128 rows
        # paged: 16 usable pages x 8 rows = 128 rows -> fits 4+ concurrent
        # short requests (each needs ceil((9+4+1)/8) = 2 pages)
        prompts = [np.arange(1 + i, 10 + i, dtype=np.int32)
                   for i in range(4)]
        wants = [reference_sample(params, cfg, p, 4) for p in prompts]
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=4, max_len=max_len,
            prefill_buckets=(8, 16), paged_pool_pages=16, page_tokens=page,
        )
        rids = [eng.add_request(p, max_new_tokens=4) for p in prompts]
        eng._admit()
        assert eng.num_active == 4, "paged pool should admit all 4 at once"
        outs = eng.run()
        for rid, want in zip(rids, wants):
            np.testing.assert_array_equal(outs[rid], want)

    def test_paged_oversize_request_rejected(self, pallas_model):
        cfg, params = pallas_model
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=2, max_len=64, prefill_buckets=(8,),
            paged_pool_pages=2, page_tokens=8,
        )
        with pytest.raises(ValueError):
            eng.add_request(np.arange(1, 30, dtype=np.int32),
                            max_new_tokens=20)

    def test_paged_rejects_full_attention(self):
        cfg = tiny_test_config(use_sparse_attn=False)
        params = init_transformer(jax.random.PRNGKey(0), cfg)
        with pytest.raises(NotImplementedError):
            ContinuousBatchingEngine(
                params, cfg, max_batch=2, max_len=64,
                paged_pool_pages=8, page_tokens=8,
            )
