"""Unit tests for rotary, norm, windowing, compressors, and selection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_tpu.config import NSAConfig
from nsa_tpu.ops.common import rms_norm, round_up_mult, straight_through
from nsa_tpu.ops.compress import (
    apply_compressor,
    init_compressor,
    split_compress_windows,
)
from nsa_tpu.ops.rotary import apply_rotary, rotate_at_offset, rotate_qk
from nsa_tpu.ops.selection import fine_block_scores, group_importance, select_blocks


class TestRotary:
    def test_norm_preserved(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 16))
        r = apply_rotary(x, jnp.arange(8))
        np.testing.assert_allclose(
            np.linalg.norm(x, axis=-1), np.linalg.norm(r, axis=-1), rtol=1e-5
        )

    def test_zero_position_identity(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, 32))
        r = apply_rotary(x, jnp.zeros((1,), jnp.int32))
        np.testing.assert_allclose(np.asarray(r), np.asarray(x), atol=1e-6)

    def test_relative_property(self):
        # <R(i)q, R(j)k> depends only on i - j
        d = 16
        q = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 1, d))
        k = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 1, d))
        def dot_at(i, j):
            qi = apply_rotary(q, jnp.array([i]))
            kj = apply_rotary(k, jnp.array([j]))
            return float(jnp.sum(qi * kj))
        assert dot_at(5, 3) == pytest.approx(dot_at(9, 7), rel=1e-5)
        assert dot_at(5, 3) != pytest.approx(dot_at(5, 4), rel=1e-3)

    def test_offset_matches_positions(self):
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 2, 6, 16))
        a = rotate_at_offset(x, 3)
        b = apply_rotary(x, jnp.arange(6) + 3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_rotate_qk_joint(self):
        q = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 5, 16))
        k = jax.random.normal(jax.random.PRNGKey(6), (1, 2, 5, 16))
        rq, rk = rotate_qk(q, k)
        np.testing.assert_allclose(
            np.asarray(rq), np.asarray(rotate_at_offset(q, 0)), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(rk), np.asarray(rotate_at_offset(k, 0)), atol=1e-6
        )


class TestRMSNorm:
    def test_matches_manual(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8))
        scale = jax.random.normal(jax.random.PRNGKey(1), (8,))
        got = rms_norm(x, scale, eps=1e-6)
        want = x / np.sqrt(np.mean(np.square(np.asarray(x)), -1, keepdims=True) + 1e-6)
        want = want * np.asarray(scale)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


class TestWindows:
    def test_window_contents(self):
        # block 4, stride 2: window i covers positions [2i-2, 2i+2) with left pad
        n, block, stride = 8, 4, 2
        x = jnp.arange(n, dtype=jnp.float32).reshape(1, 1, n, 1)
        w = split_compress_windows(x, block, stride)
        assert w.shape == (1, 1, n // stride, block, 1)
        got = np.asarray(w)[0, 0, :, :, 0]
        padded = np.concatenate([np.zeros(block - stride), np.arange(n)])
        for i in range(n // stride):
            np.testing.assert_array_equal(got[i], padded[i * stride:i * stride + block])
        # window i ends at original position (i+1)*stride - 1
        assert got[0, -1] == stride - 1
        assert got[-1, -1] == n - 1

    def test_no_overlap_case(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 12, 5))
        w = split_compress_windows(x, 4, 4)
        np.testing.assert_array_equal(
            np.asarray(w), np.asarray(x).reshape(2, 3, 3, 4, 5)
        )


class TestCompressors:
    @pytest.mark.parametrize(
        "kind", ["mlp", "conv", "attn", "mean", "shared_mlp", "single", "transformer"]
    )
    def test_shapes_and_grads(self, kind):
        nsa = NSAConfig(
            compress_block_size=4, compress_block_sliding_stride=2,
            selection_block_size=4, compressor=kind,
        )
        kvh, d = 2, 8
        params = init_compressor(jax.random.PRNGKey(0), nsa, kvh, d)
        kv = jax.random.normal(jax.random.PRNGKey(1), (3, kvh, 5, 4, d))
        out = apply_compressor(params, kind, kv)
        assert out.shape == (3, kvh, 5, d)
        assert np.isfinite(np.asarray(out)).all()
        if params:
            g = jax.grad(lambda p: apply_compressor(p, kind, kv).sum())(params)
            leaves = jax.tree_util.tree_leaves(g)
            assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
            assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

    def test_mean_is_mean(self):
        kv = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 2, 4, 3))
        out = apply_compressor({}, "mean", kv)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(kv).mean(axis=-2), rtol=1e-6
        )

    def test_attn_pool_identity_init_is_softmax_pool(self):
        nsa = NSAConfig(
            compress_block_size=4, compress_block_sliding_stride=2,
            selection_block_size=4, compressor="attn",
        )
        params = init_compressor(jax.random.PRNGKey(0), nsa, 1, 4)
        kv = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, 4, 4))
        out = apply_compressor(params, "attn", kv)
        x = np.asarray(kv)[0, 0, 0]                       # [n, d]
        attn = np.exp(x) / np.exp(x).sum(0, keepdims=True)  # softmax over n per dim
        want = (x * attn).sum(0)
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0], want, rtol=1e-5)


class TestSelection:
    def test_group_importance_mean(self):
        csim = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 3, 6))
        got = group_importance(csim, num_mem_kv=1, num_grouped_queries=2, share=True)
        want = np.asarray(csim)[..., 1:].reshape(2, 2, 2, 3, 5).mean(axis=2)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    def test_fine_block_scores_stride_equal(self):
        # stride == selection block: just pad-softmax-strip
        imp = jnp.array([[[[1.0, 2.0, 3.0]]]])
        got = fine_block_scores(imp, jnp.arange(1), 4, 4)
        full = np.concatenate([[-1e3], [1.0, 2.0, 3.0]])
        want = np.exp(full) / np.exp(full).sum()
        np.testing.assert_allclose(np.asarray(got)[0, 0, 0], want[1:], rtol=1e-5)

    def test_fine_block_scores_regroup_and_diag(self):
        # stride 2, selection 4 -> pairs averaged, diagonal masked
        imp = jnp.arange(1, 9, dtype=jnp.float32).reshape(1, 1, 1, 8)
        q_pos = jnp.array([9])  # query in fine block 2
        got = np.asarray(fine_block_scores(imp, q_pos, 4, 2))[0, 0, 0]
        means = np.array([1.5, 3.5, 5.5, 7.5])
        assert got.shape == (4,)
        assert got[2] < 1e-10  # diagonal block masked
        rest = np.concatenate([[-1e3], means[[0, 1, 3]]])
        want = np.exp(rest) / (np.exp(rest).sum())
        np.testing.assert_allclose(got[[0, 1, 3]], want[1:], rtol=1e-4)

    def test_select_blocks_topk_and_mask(self):
        scores = jnp.array([[[[0.5, 0.0, 0.3, 0.2]]]])
        sel = select_blocks(scores, 3, use_diff_topk=True)
        assert list(np.asarray(sel.indices)[0, 0, 0]) == [0, 2, 3]
        assert list(np.asarray(sel.mask)[0, 0, 0]) == [True, True, True]
        # straight-through gates evaluate to exactly 1.0
        np.testing.assert_array_equal(np.asarray(sel.gates), 1.0)

    def test_straight_through_gradient(self):
        f = lambda x: (straight_through(x, 1.0) * 3.0).sum()
        g = jax.grad(f)(jnp.array([0.2, 0.7]))
        np.testing.assert_allclose(np.asarray(g), [3.0, 3.0])
