"""Model-level tests: forward shapes, loss, gradients, sampling determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_tpu.config import tiny_test_config
from nsa_tpu.models.transformer import (
    init_transformer,
    transformer_forward,
    transformer_loss,
    transformer_sample,
)


@pytest.fixture(scope="module")
def sparse_setup():
    cfg = tiny_test_config()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def full_setup():
    cfg = tiny_test_config(use_sparse_attn=False)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    return cfg, params


class TestForward:
    def test_sparse_logits_shape(self, sparse_setup):
        cfg, params = sparse_setup
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 17), 0, cfg.vocab_size)
        logits = transformer_forward(params, cfg, ids)
        assert logits.shape == (2, 17, cfg.vocab_size)
        assert np.isfinite(np.asarray(logits)).all()

    def test_full_logits_shape(self, full_setup):
        cfg, params = full_setup
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0, cfg.vocab_size)
        logits = transformer_forward(params, cfg, ids)
        assert logits.shape == (2, 9, cfg.vocab_size)

    def test_causality(self, sparse_setup):
        # changing a future token must not change past logits
        cfg, params = sparse_setup
        ids = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 0, cfg.vocab_size)
        logits_a = transformer_forward(params, cfg, ids)
        ids_b = ids.at[0, 12].set((ids[0, 12] + 1) % cfg.vocab_size)
        logits_b = transformer_forward(params, cfg, ids_b)
        np.testing.assert_allclose(
            np.asarray(logits_a[0, :12]), np.asarray(logits_b[0, :12]),
            rtol=1e-4, atol=1e-5,
        )
        assert not np.allclose(
            np.asarray(logits_a[0, 12]), np.asarray(logits_b[0, 12]), atol=1e-5
        )

    def test_short_sequences(self, sparse_setup):
        # shorter than one compress stride / selection block
        cfg, params = sparse_setup
        for n in (1, 2, 3):
            ids = jnp.ones((1, n), jnp.int32)
            logits = transformer_forward(params, cfg, ids)
            assert logits.shape == (1, n, cfg.vocab_size)
            assert np.isfinite(np.asarray(logits)).all()


class TestLoss:
    def test_loss_finite_and_near_uniform_at_init(self, sparse_setup):
        cfg, params = sparse_setup
        ids = jax.random.randint(jax.random.PRNGKey(3), (2, 33), 0, cfg.vocab_size)
        loss = float(transformer_loss(params, cfg, ids))
        assert np.isfinite(loss)
        assert loss < np.log(cfg.vocab_size) * 2

    def test_all_params_get_grads(self, sparse_setup):
        cfg, params = sparse_setup
        ids = jax.random.randint(jax.random.PRNGKey(4), (2, 33), 0, cfg.vocab_size)
        grads = jax.grad(transformer_loss)(params, cfg, ids)
        flat, _ = jax.tree_util.tree_flatten_with_path(grads)
        zero = [
            jax.tree_util.keystr(path)
            for path, g in flat
            if not np.isfinite(np.asarray(g)).all() or float(jnp.abs(g).max()) == 0
        ]
        # gate_w starts at zero but sigmoid'(x) != 0 so it must get signal;
        # every parameter should receive a nonzero finite gradient
        assert zero == [], f"params without gradient: {zero}"


class TestSample:
    def test_greedy_deterministic(self, sparse_setup):
        cfg, params = sparse_setup
        prompt = jax.random.randint(jax.random.PRNGKey(5), (2, 9), 0, cfg.vocab_size)
        a = transformer_sample(params, cfg, prompt, 6, temperature=0.0)
        b = transformer_sample(params, cfg, prompt, 6, temperature=0.0)
        assert a.shape == (2, 6)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_greedy_matches_full_forward(self, sparse_setup):
        # greedy sampling with cache == greedy re-forward without cache
        cfg, params = sparse_setup
        prompt = jax.random.randint(jax.random.PRNGKey(6), (1, 7), 0, cfg.vocab_size)
        got = np.asarray(transformer_sample(params, cfg, prompt, 5, temperature=0.0))
        ids = np.asarray(prompt)
        for _ in range(5):
            logits = transformer_forward(params, cfg, jnp.asarray(ids))
            nxt = int(np.argmax(np.asarray(logits)[0, -1]))
            ids = np.concatenate([ids, [[nxt]]], axis=1)
        np.testing.assert_array_equal(got[0], ids[0, 7:])


class TestSwiGLU:
    def test_swiglu_ff_forward(self):
        import jax.numpy as jnp
        from nsa_tpu.models.transformer import _ff_apply

        cfg = tiny_test_config(ff_kind="swiglu")
        dim, hidden = cfg.dim, int(cfg.dim * cfg.ff_expansion_factor)
        params = {
            "norm_scale": jnp.ones((dim,)),
            "w1": jax.random.normal(jax.random.PRNGKey(0), (dim, hidden)) * 0.02,
            "w3": jax.random.normal(jax.random.PRNGKey(1), (dim, hidden)) * 0.02,
            "w2": jax.random.normal(jax.random.PRNGKey(2), (hidden, dim)) * 0.02,
        }
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, dim))
        out = _ff_apply(params, cfg, x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
