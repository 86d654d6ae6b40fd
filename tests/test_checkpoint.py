"""Checkpoint save/restore round-trips (params-only and full state)."""

import jax
import jax.numpy as jnp
import numpy as np

from nsa_tpu.config import tiny_test_config
from nsa_tpu.models.transformer import init_transformer
from nsa_tpu.train.pretrain import make_optimizer
from nsa_tpu.config import TrainConfig
from nsa_tpu.utils.checkpoint import (
    export_params_npz,
    import_params_npz,
    latest_checkpoint,
    model_config_from_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


def test_roundtrip_params_only(tmp_path):
    cfg = tiny_test_config()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    save_checkpoint(str(tmp_path), 7, params, model_cfg=cfg)
    ckpt = latest_checkpoint(str(tmp_path))
    assert ckpt and ckpt.endswith("step_00000007")
    template = init_transformer(jax.random.PRNGKey(1), cfg)
    state, meta = restore_checkpoint(ckpt, {"params": template})
    assert meta["step"] == 7
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(state["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert model_config_from_checkpoint(ckpt) == cfg


def test_roundtrip_with_optimizer_and_partial_restore(tmp_path):
    cfg = tiny_test_config()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(TrainConfig())
    ost = opt.init(params)
    save_checkpoint(str(tmp_path), 3, params, ost, cfg, extra={"loss": 1.5})
    ckpt = latest_checkpoint(str(tmp_path))
    # full restore
    state, meta = restore_checkpoint(
        ckpt, {"params": params, "opt_state": ost}
    )
    assert meta["loss"] == 1.5
    # params-only restore must work without the optimizer template
    state2, _ = restore_checkpoint(ckpt, {"params": params})
    assert "opt_state" not in state2


def test_npz_export_roundtrip_bf16(tmp_path):
    """The committable single-file export preserves bf16 bits exactly
    and matches leaves by tree path, not flatten order."""
    cfg = tiny_test_config()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params
    )
    path = export_params_npz(
        str(tmp_path / "w.npz"), params, cfg, extra={"step": 42}
    )
    template = init_transformer(jax.random.PRNGKey(1), cfg)
    loaded, meta = import_params_npz(path, template)
    assert meta["step"] == 42
    assert meta["model_config"]["dim"] == cfg.dim
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        assert np.asarray(b).dtype == np.asarray(a).dtype
        np.testing.assert_array_equal(
            np.asarray(a).view(np.uint16), np.asarray(b).view(np.uint16)
        )


def test_npz_import_missing_leaf_raises(tmp_path):
    cfg = tiny_test_config()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    flat = jax.tree_util.tree_leaves_with_path(params)
    # drop one leaf from the export by exporting a pruned subtree
    pruned = {"tok_emb_only": flat[0][1]}
    path = export_params_npz(str(tmp_path / "w.npz"), pruned)
    try:
        import_params_npz(path, params)
    except KeyError as e:
        assert "missing leaf" in str(e)
    else:
        raise AssertionError("expected KeyError for missing leaves")
