"""Which attention implementation actually runs, per config.

VERDICT r1 weak-point: the decode-kernel applicability guards silently
narrowed coverage and nothing asserted which path executed.  These tests
pin the dispatch boundary: representative configs either MUST hit the
Pallas kernels (decode_select / nsa_fine_sliding_attention) or MUST fall
back to the XLA path — and the kernel-vs-XLA outputs agree wherever the
kernel path claims coverage (odd batch sizes, multiple mem-KV slots).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nsa_tpu.ops.pallas.nsa_decode as nsa_decode_mod
import nsa_tpu.ops.pallas.nsa_decode_fused as nsa_fused_mod
import nsa_tpu.ops.pallas.nsa_prefill as nsa_prefill_mod
from nsa_tpu.config import NSAConfig, tiny_test_config
from nsa_tpu.models.transformer import (
    init_transformer,
    transformer_decode_step,
    transformer_prefill,
)


class _CallCounter:
    def __init__(self, fn):
        self.fn = fn
        self.calls = 0

    def __call__(self, *a, **kw):
        self.calls += 1
        return self.fn(*a, **kw)


def _run_decode(cfg, batch=4, monkeypatch=None):
    """Prefill + one decode step; returns (logits, #kernel-path calls).

    Counts BOTH the round-2 ``decode_select`` and the round-3 fused
    ``decode_select_emit`` as 'the kernel path ran'."""
    counter = _CallCounter(nsa_decode_mod.decode_select)
    monkeypatch.setattr(nsa_decode_mod, "decode_select", counter)
    fused_counter = _CallCounter(nsa_fused_mod.decode_select_emit)
    monkeypatch.setattr(nsa_fused_mod, "decode_select_emit", fused_counter)
    # the decode path imports the kernels lazily from the module, so patch
    # the symbol the importer resolves
    import nsa_tpu.ops.nsa as nsa_ops  # noqa: F401
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, size=(batch, 13)), jnp.int32
    )
    _, cache = transformer_prefill(params, cfg, ids, max_len=32)
    logits, _ = transformer_decode_step(
        params, cfg, jnp.zeros((batch,), jnp.int32), cache
    )
    return np.asarray(logits), counter.calls + fused_counter.calls


class TestDecodeDispatch:
    @pytest.mark.parametrize("batch", [4, 24, 3])
    def test_kernel_path_runs_for_any_batch(self, monkeypatch, batch):
        """Adaptive batch tiles: b=24 / b=3 no longer fall back (or crash)."""
        cfg = tiny_test_config(attn_impl="pallas")
        _, calls = _run_decode(cfg, batch=batch, monkeypatch=monkeypatch)
        assert calls > 0, f"decode kernels did not run for batch={batch}"

    def test_long_context_caps_select_tile(self, monkeypatch):
        """At large max_len the select kernel's ckv block would exceed
        VMEM at the configured tile; the dispatch must shrink the tile
        (not fall back, not crash) and stay on the kernel path."""
        cfg = tiny_test_config(attn_impl="pallas")
        counter = _CallCounter(nsa_decode_mod.decode_select)
        monkeypatch.setattr(nsa_decode_mod, "decode_select", counter)
        fused_counter = _CallCounter(nsa_fused_mod.decode_select_emit)
        monkeypatch.setattr(nsa_fused_mod, "decode_select_emit", fused_counter)
        params = init_transformer(jax.random.PRNGKey(0), cfg)
        ids = jnp.asarray(
            np.random.RandomState(0).randint(0, 256, size=(16, 13)),
            jnp.int32,
        )
        # max_len 4096 / stride 2 -> 2048 ckv rows: tile 32 would be an
        # 8MB block (f32); the cap drops it to 16
        _, cache = transformer_prefill(params, cfg, ids, max_len=4096)
        logits, _ = transformer_decode_step(
            params, cfg, jnp.zeros((16,), jnp.int32), cache
        )
        assert counter.calls + fused_counter.calls > 0, (
            "kernel path must survive long max_len"
        )
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_sublane_illegal_tile_falls_back(self, monkeypatch):
        """b=36 picks tile 4 (< sublane 8, != b) for both kernels — a shape
        Mosaic cannot tile — so the decode MUST take the XLA path."""
        cfg = tiny_test_config(attn_impl="pallas")
        logits, calls = _run_decode(cfg, batch=36, monkeypatch=monkeypatch)
        assert calls == 0, "illegal tile must fall back to XLA"
        assert np.all(np.isfinite(logits))

    def test_kernel_path_runs_with_multiple_mem_kv(self, monkeypatch):
        cfg = tiny_test_config(attn_impl="pallas")
        cfg = cfg.replace(
            nsa=dataclasses.replace(cfg.nsa, num_compressed_mem_kv=2)
        )
        logits_p, calls = _run_decode(cfg, monkeypatch=monkeypatch)
        assert calls > 0
        logits_x, _ = _run_decode(
            cfg.replace(attn_impl="xla"), monkeypatch=monkeypatch
        )
        np.testing.assert_allclose(logits_p, logits_x, rtol=2e-4, atol=2e-4)

    def test_xla_fallback_when_stride_equals_block(self, monkeypatch):
        """stride == selection_block (num_compress_per_fine == 1) is outside
        the kernels' masked-diagonal semantics -> must fall back."""
        cfg = tiny_test_config(attn_impl="pallas")
        cfg = cfg.replace(nsa=dataclasses.replace(
            cfg.nsa,
            compress_block_sliding_stride=cfg.nsa.selection_block_size,
        ))
        _, calls = _run_decode(cfg, monkeypatch=monkeypatch)
        assert calls == 0

    def test_xla_fallback_when_selection_not_shared(self, monkeypatch):
        cfg = tiny_test_config(attn_impl="pallas")
        cfg = cfg.replace(nsa=dataclasses.replace(
            cfg.nsa, query_heads_share_selected_kv=False,
        ))
        _, calls = _run_decode(cfg, monkeypatch=monkeypatch)
        assert calls == 0

    def test_no_kernels_under_xla_impl(self, monkeypatch):
        cfg = tiny_test_config(attn_impl="xla")
        _, calls = _run_decode(cfg, monkeypatch=monkeypatch)
        assert calls == 0

    def test_fused_path_matches_round2_kernels(self, monkeypatch):
        """The round-3 fused path (in-kernel emit/gather/cache writes) must
        agree with the round-2 kernel path it replaces."""
        cfg = tiny_test_config(attn_impl="pallas")
        logits_f, calls = _run_decode(cfg, batch=8, monkeypatch=monkeypatch)
        assert calls > 0
        monkeypatch.setenv("NSA_NO_FUSED_DECODE", "1")
        logits_r2, _ = _run_decode(cfg, batch=8, monkeypatch=monkeypatch)
        np.testing.assert_allclose(logits_f, logits_r2, rtol=2e-4, atol=2e-4)

    def test_odd_batch_kernel_matches_xla(self, monkeypatch):
        cfg = tiny_test_config(attn_impl="pallas")
        logits_p, calls = _run_decode(cfg, batch=24, monkeypatch=monkeypatch)
        assert calls > 0
        logits_x, _ = _run_decode(
            cfg.replace(attn_impl="xla"), batch=24, monkeypatch=monkeypatch
        )
        np.testing.assert_allclose(logits_p, logits_x, rtol=2e-4, atol=2e-4)


class TestPrefillDispatch:
    def _run_forward(self, cfg, monkeypatch):
        counter = _CallCounter(nsa_prefill_mod.nsa_fine_sliding_attention)
        monkeypatch.setattr(
            nsa_prefill_mod, "nsa_fine_sliding_attention", counter
        )
        params = init_transformer(jax.random.PRNGKey(0), cfg)
        ids = jnp.asarray(
            np.random.RandomState(0).randint(0, 256, size=(2, 17)), jnp.int32
        )
        from nsa_tpu.models.transformer import transformer_forward

        transformer_forward(params, cfg, ids)
        return counter.calls

    def test_fused_prefill_kernel_runs(self, monkeypatch):
        cfg = tiny_test_config(attn_impl="pallas")
        assert self._run_forward(cfg, monkeypatch) > 0

    def test_fused_prefill_fallback_non_causal_stride(self, monkeypatch):
        cfg = tiny_test_config(attn_impl="pallas")
        cfg = cfg.replace(nsa=dataclasses.replace(
            cfg.nsa,
            compress_block_sliding_stride=cfg.nsa.selection_block_size,
        ))
        assert self._run_forward(cfg, monkeypatch) == 0
