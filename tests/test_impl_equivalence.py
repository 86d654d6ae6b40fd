"""The chunked 'xla' pipeline must match the flat 'reference' oracle
exactly (forward and gradients), across awkward sequence lengths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_tpu.config import tiny_test_config
from nsa_tpu.models.transformer import init_transformer, transformer_loss
from nsa_tpu.ops.nsa import init_sparse_attention, sparse_attention_forward


@pytest.mark.parametrize("n", [33, 64, 70])
def test_layer_chunked_matches_reference(n):
    cfg = tiny_test_config(attn_chunk_size=16)
    params = init_sparse_attention(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, n, cfg.dim)) * 0.5
    ref = sparse_attention_forward(params, cfg, x, impl="reference")
    xla = sparse_attention_forward(params, cfg, x, impl="xla")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(xla), rtol=2e-4, atol=2e-5)


def test_model_grads_chunked_matches_reference():
    cfg = tiny_test_config(attn_chunk_size=16)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 49), 0, cfg.vocab_size)

    loss_r, grads_r = jax.value_and_grad(transformer_loss)(
        params, cfg, ids, impl="reference"
    )
    loss_x, grads_x = jax.value_and_grad(transformer_loss)(
        params, cfg, ids, impl="xla"
    )
    assert float(loss_r) == pytest.approx(float(loss_x), rel=1e-5)
    for (pa, ga), (pb, gb) in zip(
        jax.tree_util.tree_flatten_with_path(grads_r)[0],
        jax.tree_util.tree_flatten_with_path(grads_x)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(pa),
        )


class TestPallasImpl:
    """attn_impl='pallas' (fused fine+sliding kernel, interpret mode) must
    match the reference oracle in forward and gradients."""

    def test_layer_forward(self):
        from jax.experimental.pallas import tpu as pltpu

        cfg = tiny_test_config(attn_chunk_size=16)
        params = init_sparse_attention(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 70, cfg.dim)) * 0.5
        ref = sparse_attention_forward(params, cfg, x, impl="reference")
        with pltpu.force_tpu_interpret_mode():
            pal = sparse_attention_forward(params, cfg, x, impl="pallas")
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(pal), rtol=2e-4, atol=2e-5
        )

    def test_layer_grads(self):
        from jax.experimental.pallas import tpu as pltpu

        cfg = tiny_test_config(attn_chunk_size=16)
        params = init_sparse_attention(jax.random.PRNGKey(2), cfg)
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 40, cfg.dim)) * 0.5

        def loss(p, impl):
            return (sparse_attention_forward(p, cfg, x, impl=impl) ** 2).sum()

        g_ref = jax.grad(loss)(params, "reference")
        with pltpu.force_tpu_interpret_mode():
            g_pal = jax.grad(loss)(params, "pallas")
        for (pa, ga), (_, gb) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_pal)[0],
        ):
            np.testing.assert_allclose(
                np.asarray(ga), np.asarray(gb), rtol=1e-3, atol=1e-4,
                err_msg=jax.tree_util.keystr(pa),
            )
