"""Mesh-sharded training and decode steps.

Uses committed input shardings + GSPMD propagation: parameters are placed
with the TP layout (:mod:`nsa_tpu.parallel.sharding`), batches on the data
axis, and a plain ``jax.jit`` of the pure train step lets XLA insert the
all-reduces (gradient psum over ``data``, activation psum after row-sharded
projections over ``heads``) on ICI.

``dryrun(n_devices)`` is the driver's multi-chip validation hook: it builds
an n-device mesh (on CPU: XLA_FLAGS=--xla_force_host_platform_device_count),
jits the FULL training step (grad accumulation + Adam + clipping) with real
dp/tp shardings, runs one step on tiny shapes, then runs a sharded
prefill+decode step as well.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from ..config import ModelConfig, NSAConfig, TrainConfig
from ..models.transformer import (
    init_transformer,
    transformer_decode_step,
    transformer_loss,
    transformer_prefill,
)
from ..train.pretrain import make_optimizer, train_step
from .mesh import auto_mesh
from .sharding import shard_batch, shard_cache, shard_params


def make_sharded_train_state(model_cfg: ModelConfig, train_cfg: TrainConfig,
                             mesh: Mesh, seed: int = 0):
    """Init params + optimizer state, sharded over the mesh."""
    params = init_transformer(jax.random.PRNGKey(seed), model_cfg)
    params = shard_params(params, mesh)
    optimizer = make_optimizer(train_cfg)
    opt_state = jax.jit(optimizer.init)(params)
    return params, opt_state, optimizer


def sharded_train_step(params, opt_state, batch, model_cfg, optimizer,
                       accum: int, mesh: Mesh):
    """One sharded optimizer step. batch [accum, global_batch, seq+1]."""
    batch = shard_batch(jnp.asarray(batch), mesh, batch_axis=1)
    return train_step(params, opt_state, batch, model_cfg, optimizer, accum)


def dryrun(n_devices: int, use_sparse: bool = True) -> None:
    """Compile + execute the full sharded train and decode steps on an
    ``n_devices`` mesh with tiny shapes.  Raises on any sharding error."""
    devices = jax.devices()
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)}"
    )
    model_cfg = ModelConfig(
        vocab_size=256,
        dim=64,
        depth=2,
        dim_head=16,
        heads=8,
        kv_heads=4,
        use_sparse_attn=use_sparse,
        nsa=NSAConfig(
            sliding_window_size=8,
            compress_block_size=4,
            compress_block_sliding_stride=2,
            selection_block_size=4,
            num_selected_blocks=2,
            compressor="mlp",
        ),
    )
    mesh = auto_mesh(n_devices, kv_heads=model_cfg.kv_heads)
    print(f"dryrun mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    train_cfg = TrainConfig(batch_size=mesh.devices.shape[0] * 2, seq_len=32,
                            grad_accum_every=2)
    with mesh:
        params, opt_state, optimizer = make_sharded_train_state(
            model_cfg, train_cfg, mesh
        )
        batch = np.zeros(
            (train_cfg.grad_accum_every, train_cfg.batch_size,
             train_cfg.seq_len + 1),
            np.int32,
        )
        params, opt_state, loss = sharded_train_step(
            params, opt_state, batch, model_cfg, optimizer,
            train_cfg.grad_accum_every, mesh,
        )
        loss = float(jax.block_until_ready(loss))
        assert np.isfinite(loss), loss
        print(f"dryrun train step ok: loss={loss:.4f}")

        # sharded prefill + decode step
        ids = shard_batch(
            jnp.zeros((train_cfg.batch_size, 16), jnp.int32), mesh
        )
        prefill = jax.jit(
            lambda p, i: transformer_prefill(p, model_cfg, i, max_len=64)
        )
        logits, cache = prefill(params, ids)
        cache = shard_cache(cache, mesh)
        step = jax.jit(
            lambda p, tok, c: transformer_decode_step(p, model_cfg, tok, c)
        )
        tok = shard_batch(
            jnp.zeros((train_cfg.batch_size,), jnp.int32), mesh
        )
        logits, cache = step(params, tok, cache)
        jax.block_until_ready(logits)
        assert np.isfinite(np.asarray(logits)).all()
        print("dryrun decode step ok")

        if use_sparse:
            # the Pallas kernel path under the same mesh (interpret mode on
            # CPU meshes, Mosaic on real chips): fused prefill fwd+bwd in
            # the train step, decode_select/decode_attend in the decode step
            pcfg = model_cfg.replace(attn_impl="pallas")
            ploss = jax.jit(
                lambda p, b: transformer_loss(p, pcfg, b)
            )(params, shard_batch(jnp.zeros(
                (train_cfg.batch_size, train_cfg.seq_len + 1), jnp.int32
            ), mesh))
            pgrads = jax.jit(jax.grad(
                lambda p, b: transformer_loss(p, pcfg, b)
            ))(params, shard_batch(jnp.zeros(
                (train_cfg.batch_size, train_cfg.seq_len + 1), jnp.int32
            ), mesh))
            jax.block_until_ready(pgrads)
            assert np.isfinite(float(ploss))
            print(f"dryrun pallas train fwd+bwd ok: loss={float(ploss):.4f}")

            pstep = jax.jit(
                lambda p, tok, c: transformer_decode_step(p, pcfg, tok, c)
            )
            plogits, _ = pstep(params, tok, cache)
            jax.block_until_ready(plogits)
            assert np.isfinite(np.asarray(plogits)).all()
            print("dryrun pallas decode step ok")

    # multi-host-shaped hierarchical mesh: ("dcn", "data", "heads") — the
    # batch shards over BOTH data tiers, so the gradient all-reduce spans
    # the DCN axis exactly once; params/TP stay host-local (replicated
    # over dcn).  Validates the multi-pod sharding structure (SURVEY 2.4).
    if n_devices >= 8:
        from .mesh import make_hierarchical_mesh

        heads_axis = mesh.devices.shape[1]
        hmesh = make_hierarchical_mesh(2, n_devices // (2 * heads_axis),
                                       heads_axis)
        with hmesh:
            hparams, hopt, hoptim = make_sharded_train_state(
                model_cfg, train_cfg, hmesh
            )
            _, _, hloss = sharded_train_step(
                hparams, hopt, batch, model_cfg, hoptim,
                train_cfg.grad_accum_every, hmesh,
            )
            hloss = float(jax.block_until_ready(hloss))
            assert np.isfinite(hloss), hloss
            assert abs(hloss - loss) < 1e-3, (hloss, loss)
            print(f"dryrun hierarchical (dcn, data, heads) mesh ok: "
                  f"loss={hloss:.4f} (== flat mesh)")

    # serving engine under the same (data, heads) mesh: slots shard over
    # data, wave prefill + ragged multi-token decode run sharded and must
    # agree token-for-token with the single-device engine
    from ..serve import ContinuousBatchingEngine

    eng_params = jax.device_get(params)
    prompts = [np.arange(1, 10, dtype=np.int32),
               np.arange(30, 42, dtype=np.int32)]

    def _run_engine(mesh_arg):
        eng = ContinuousBatchingEngine(
            eng_params, model_cfg, max_batch=mesh.devices.shape[0] * 2,
            max_len=64, prefill_buckets=(16,), steps_per_sync=2,
            mesh=mesh_arg,
        )
        rids = [eng.add_request(p, max_new_tokens=4) for p in prompts]
        outs = eng.run()
        return [outs[r] for r in rids]

    single = _run_engine(None)
    sharded = _run_engine(mesh)
    for s_, m_ in zip(single, sharded):
        assert np.array_equal(s_, m_), (s_, m_)
    print("dryrun sharded serving engine ok (token-exact vs single device)")

    # context parallelism: sequence axis sharded over a 1-D seq mesh
    from .context import context_parallel_loss, make_seq_mesh

    seq_mesh = make_seq_mesh(n_devices)
    rep_params = jax.device_get(params)  # CP replicates weights
    ids = np.zeros((2, 8 * n_devices + 1), np.int32)
    closs = jax.jit(
        lambda p, i: context_parallel_loss(p, model_cfg, i, seq_mesh)
    )(rep_params, ids)
    closs = float(jax.block_until_ready(closs))
    assert np.isfinite(closs), closs
    print(f"dryrun context-parallel loss ok: loss={closs:.4f}")


if __name__ == "__main__":
    dryrun(len(jax.devices()))
