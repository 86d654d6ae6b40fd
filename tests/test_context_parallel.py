"""Context (sequence) parallelism == single-device, logits/loss/grads.

An 8-virtual-device ``seq`` mesh shards the sequence axis; results must
match the plain single-device forward exactly (same math, different
device decomposition).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_tpu.config import tiny_test_config
from nsa_tpu.models.transformer import (
    init_transformer,
    transformer_forward,
    transformer_loss,
)
from nsa_tpu.parallel.context import (
    context_parallel_forward,
    context_parallel_loss,
    make_seq_mesh,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _setup(use_sparse, n=64, b=2, scan_layers=False):
    cfg = tiny_test_config(use_sparse_attn=use_sparse).replace(
        scan_layers=scan_layers
    )
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, n + 1), 0, 256)
    return cfg, params, ids


class TestContextParallel:
    @pytest.mark.parametrize("use_sparse", [True, False])
    def test_forward_matches_single_device(self, use_sparse):
        cfg, params, ids = _setup(use_sparse)
        mesh = make_seq_mesh(8)
        want = transformer_forward(params, cfg, ids[:, :-1], impl="xla")
        got = context_parallel_forward(params, cfg, ids[:, :-1], mesh)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    @pytest.mark.parametrize("use_sparse", [True, False])
    def test_loss_and_grads_match_single_device(self, use_sparse):
        cfg, params, ids = _setup(use_sparse)
        mesh = make_seq_mesh(8)

        def single(p):
            return transformer_loss(p, cfg, ids, impl="xla")

        def cp(p):
            return context_parallel_loss(p, cfg, ids, mesh)

        want, gw = jax.value_and_grad(single)(params)
        got, gg = jax.value_and_grad(cp)(params)
        assert float(want) == pytest.approx(float(got), rel=2e-5)
        flat_w, _ = jax.tree_util.tree_flatten(gw)
        flat_g, _ = jax.tree_util.tree_flatten(gg)
        for a, b_ in zip(flat_w, flat_g):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-5
            )

    def test_scan_layers_path(self):
        cfg, params, ids = _setup(True, scan_layers=True)
        mesh = make_seq_mesh(8)
        want = transformer_loss(params, cfg, ids, impl="xla")
        got = context_parallel_loss(params, cfg, ids, mesh)
        assert float(want) == pytest.approx(float(got), rel=2e-5)

    def test_jit_under_mesh(self):
        """The CP loss jits (the production path) and matches eager."""
        cfg, params, ids = _setup(True)
        mesh = make_seq_mesh(8)
        eager = context_parallel_loss(params, cfg, ids, mesh)
        jitted = jax.jit(
            lambda p, i: context_parallel_loss(p, cfg, i, mesh)
        )(params, ids)
        assert float(eager) == pytest.approx(float(jitted), rel=1e-5)
