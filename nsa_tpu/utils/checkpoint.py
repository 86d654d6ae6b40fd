"""Orbax checkpointing with config metadata and true resume.

The reference only *saves* (torch.save every 2500 steps, config encoded in
the checkpoint filename and re-parsed by eval scripts, reference:
pretrain/train.py:255-277, evaluation/perplexity.py:397-420); there is no
resume path.  Here checkpoints carry explicit JSON config metadata and
restore both params and optimizer state.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

from ..config import ModelConfig, config_to_json, model_config_from_json


def save_checkpoint(
    directory: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    model_cfg: Optional[ModelConfig] = None,
    extra: Optional[dict] = None,
):
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step:08d}")
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, "state"), state, force=True)
        ckptr.wait_until_finished()
    else:  # pragma: no cover - orbax is baked in
        flat, treedef = jax.tree_util.tree_flatten(state)
        os.makedirs(path, exist_ok=True)
        np.savez(os.path.join(path, "state.npz"), *[np.asarray(x) for x in flat])
    meta = {"step": step, **(extra or {})}
    if model_cfg is not None:
        meta["model_config"] = json.loads(config_to_json(model_cfg))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    steps = sorted(
        d for d in os.listdir(directory)
        if d.startswith("step_") and os.path.isdir(os.path.join(directory, d))
    )
    return os.path.join(directory, steps[-1]) if steps else None


def restore_checkpoint(
    path: str, template: Any
) -> Tuple[Any, dict]:
    """Restore ``template``-shaped state from a checkpoint path."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(os.path.join(path, "state"), template)
    else:  # pragma: no cover
        flat, treedef = jax.tree_util.tree_flatten(template)
        data = np.load(os.path.join(path, "state.npz"))
        state = jax.tree_util.tree_unflatten(
            treedef, [data[k] for k in data.files]
        )
    return state, meta


def model_config_from_checkpoint(path: str) -> ModelConfig:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return model_config_from_json(json.dumps(meta["model_config"]))
