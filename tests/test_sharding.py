"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Verifies (a) the sharded train/decode steps compile and run on a (data,
heads) mesh, and (b) sharded execution is numerically identical to
single-device execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_tpu.config import TrainConfig, tiny_test_config
from nsa_tpu.models.transformer import init_transformer, transformer_loss
from nsa_tpu.parallel.mesh import auto_mesh, make_mesh
from nsa_tpu.parallel.sharding import params_pspecs, shard_batch, shard_params
from nsa_tpu.parallel.train_step import dryrun, sharded_train_step
from nsa_tpu.train.pretrain import make_optimizer, train_step

requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


class TestMesh:
    @requires_8
    def test_auto_mesh_shape(self):
        mesh = auto_mesh(8, kv_heads=4)
        assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
            "data": 2, "heads": 4,
        }

    @requires_8
    def test_mesh_odd_heads(self):
        mesh = auto_mesh(8, kv_heads=3)
        assert mesh.devices.shape == (8, 1)


class TestSpecs:
    def test_specs_cover_all_params(self):
        cfg = tiny_test_config()
        params = init_transformer(jax.random.PRNGKey(0), cfg)
        specs = params_pspecs(params)
        flat_p = jax.tree_util.tree_leaves(params)
        flat_s = jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)
        )
        assert len(flat_p) == len(flat_s)

    @requires_8
    def test_head_sharding_divides(self):
        cfg = tiny_test_config()  # heads=4, kv_heads=2
        mesh = make_mesh(data=4, heads=2)
        params = init_transformer(jax.random.PRNGKey(0), cfg)
        sharded = shard_params(params, mesh)
        w_q = sharded["layers"][0]["attn"]["w_q"]
        # column-sharded over heads
        assert len(w_q.sharding.spec) == 2 and w_q.sharding.spec[1] == "heads"


class TestShardedExecution:
    @requires_8
    def test_dryrun(self):
        dryrun(8)

    @requires_8
    def test_sharded_matches_single_device(self):
        cfg = tiny_test_config()
        train_cfg = TrainConfig(batch_size=4, seq_len=16, grad_accum_every=2,
                                learning_rate=1e-3)
        params = init_transformer(jax.random.PRNGKey(0), cfg)
        optimizer = make_optimizer(train_cfg)
        opt_state = optimizer.init(params)
        batch = np.random.RandomState(0).randint(
            0, cfg.vocab_size, size=(2, 4, 17)
        ).astype(np.int32)

        # single device
        p1, o1, loss1 = train_step(
            params, opt_state, jnp.asarray(batch), cfg, optimizer, 2
        )

        # sharded
        mesh = make_mesh(data=4, heads=2)
        with mesh:
            sp = shard_params(params, mesh)
            so = jax.jit(optimizer.init)(sp)
            p2, o2, loss2 = sharded_train_step(
                sp, so, batch, cfg, optimizer, 2, mesh
            )
        assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)
        l1 = jax.tree_util.tree_leaves(p1)
        l2 = jax.tree_util.tree_leaves(p2)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            )

    @requires_8
    def test_sharded_pallas_decode_matches_single_device(self):
        """The fused decode kernels (interpret mode on CPU) under the
        (data, heads) mesh produce the same logits as single-device — the
        TP grid (kvh, batch_tiles) is exactly what head-sharding could
        break, so the kernel path itself runs on the mesh here."""
        from nsa_tpu.models.transformer import (
            transformer_decode_step,
            transformer_prefill,
        )
        from nsa_tpu.parallel.sharding import shard_cache

        cfg = tiny_test_config(attn_impl="pallas")
        params = init_transformer(jax.random.PRNGKey(2), cfg)
        ids = jnp.asarray(
            np.random.RandomState(2).randint(0, 256, size=(4, 13)), jnp.int32
        )
        _, cache = transformer_prefill(params, cfg, ids, max_len=32)
        tok = jnp.zeros((4,), jnp.int32)

        logits1, cache1 = transformer_decode_step(params, cfg, tok, cache)
        logits1, c1kv = np.asarray(logits1), np.asarray(cache1.layers[0].kv)

        mesh = make_mesh(data=4, heads=2)
        with mesh:
            sp = shard_params(params, mesh)
            sc = shard_cache(cache, mesh)
            stok = shard_batch(tok, mesh)
            step = jax.jit(
                lambda p, t, c: transformer_decode_step(p, cfg, t, c)
            )
            logits2, cache2 = step(sp, stok, sc)
        np.testing.assert_allclose(
            logits1, np.asarray(logits2), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            c1kv, np.asarray(cache2.layers[0].kv), rtol=2e-4, atol=2e-5
        )

    @requires_8
    def test_sharded_pallas_train_grads_match(self):
        """Fused prefill kernel fwd+bwd on the mesh == single device."""
        cfg = tiny_test_config(attn_impl="pallas")
        params = init_transformer(jax.random.PRNGKey(3), cfg)
        ids = jnp.asarray(
            np.random.RandomState(3).randint(0, 256, size=(4, 17)), jnp.int32
        )
        loss_fn = lambda p, i: transformer_loss(p, cfg, i)
        l1, g1 = jax.value_and_grad(loss_fn)(params, ids)
        mesh = make_mesh(data=4, heads=2)
        with mesh:
            sp = shard_params(params, mesh)
            sids = shard_batch(ids, mesh)
            l2, g2 = jax.jit(jax.value_and_grad(loss_fn))(sp, sids)
        assert float(l1) == pytest.approx(float(l2), rel=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            )

    @requires_8
    def test_sharded_loss_matches(self):
        cfg = tiny_test_config()
        params = init_transformer(jax.random.PRNGKey(1), cfg)
        ids = np.random.RandomState(1).randint(0, 256, size=(4, 17)).astype(np.int32)
        want = float(transformer_loss(params, cfg, jnp.asarray(ids)))
        mesh = make_mesh(data=4, heads=2)
        with mesh:
            sp = shard_params(params, mesh)
            sids = shard_batch(jnp.asarray(ids), mesh)
            got = float(jax.jit(lambda p, i: transformer_loss(p, cfg, i))(sp, sids))
        assert got == pytest.approx(want, rel=1e-5)


class TestHierarchicalMesh:
    """Multi-host-shaped (dcn, data, heads) mesh: batch shards over both
    data tiers; the train step must match the flat-mesh loss exactly."""

    def test_hierarchical_train_step_matches_flat(self):
        from nsa_tpu.parallel.mesh import make_hierarchical_mesh
        from nsa_tpu.parallel.train_step import make_sharded_train_state

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg = tiny_test_config()
        tc = TrainConfig(batch_size=4, seq_len=16, grad_accum_every=1)
        batch = np.random.RandomState(0).randint(
            0, 256, size=(1, 4, 17)
        ).astype(np.int32)

        flat = make_mesh(data=4, heads=2)
        with flat:
            p, o, opt = make_sharded_train_state(cfg, tc, flat)
            _, _, loss_flat = sharded_train_step(p, o, batch, cfg, opt, 1,
                                                 flat)
            loss_flat = float(jax.block_until_ready(loss_flat))

        hier = make_hierarchical_mesh(2, 2, 2)
        with hier:
            p, o, opt = make_sharded_train_state(cfg, tc, hier)
            _, _, loss_h = sharded_train_step(p, o, batch, cfg, opt, 1, hier)
            loss_h = float(jax.block_until_ready(loss_h))
        assert np.isfinite(loss_h)
        np.testing.assert_allclose(loss_h, loss_flat, rtol=1e-5, atol=1e-5)
