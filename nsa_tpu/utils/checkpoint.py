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
    # params and optimizer state are separate checkpoint items so
    # evaluation can restore params without knowing the optimizer pytree
    items = {"params": params}
    if opt_state is not None:
        items["opt_state"] = opt_state
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        for name, item in items.items():
            ckptr.save(os.path.join(path, name), item, force=True)
        ckptr.wait_until_finished()
    else:  # pragma: no cover - orbax is baked in
        os.makedirs(path, exist_ok=True)
        for name, item in items.items():
            flat, _ = jax.tree_util.tree_flatten(item)
            np.savez(os.path.join(path, f"{name}.npz"),
                     *[np.asarray(x) for x in flat])
    meta = {"step": step, **(extra or {})}
    if model_cfg is not None:
        meta["model_config"] = json.loads(config_to_json(model_cfg))
    # meta.json is the completion marker (written last, atomically): a
    # checkpoint dir without it is a partial save from an interrupted run
    # and is skipped by latest_checkpoint
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, os.path.join(path, "meta.json"))
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = sorted(
        d for d in os.listdir(directory)
        if d.startswith("step_")
        and os.path.isdir(os.path.join(directory, d))
        # only complete checkpoints (meta.json is written last)
        and os.path.isfile(os.path.join(directory, d, "meta.json"))
    )
    return os.path.join(directory, steps[-1]) if steps else None


def restore_checkpoint(
    path: str, template: Any
) -> Tuple[Any, dict]:
    """Restore state from a checkpoint path.

    ``template`` is a dict of item-name -> pytree template; only the items
    named in it are restored (e.g. ``{"params": params}`` for evaluation,
    ``{"params": ..., "opt_state": ...}`` for resume).
    """
    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    state = {}
    for name, tmpl in template.items():
        if _HAS_ORBAX and os.path.isdir(os.path.join(path, name)):
            ckptr = ocp.StandardCheckpointer()
            state[name] = ckptr.restore(os.path.join(path, name), tmpl)
        else:  # pragma: no cover
            flat, treedef = jax.tree_util.tree_flatten(tmpl)
            data = np.load(os.path.join(path, f"{name}.npz"))
            state[name] = jax.tree_util.tree_unflatten(
                treedef, [data[k] for k in data.files]
            )
    return state, meta


def model_config_from_checkpoint(path: str) -> ModelConfig:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return model_config_from_json(json.dumps(meta["model_config"]))


# ---------------------------------------------------------------------------
# Durable single-file weight export (git-committable)
#
# Orbax checkpoint trees live under gitignored ckpt/ and have twice been
# lost to host migrations mid-round (RESULTS.md r3/r4).  A bf16 export of
# the 19M-param reference model is ~38 MB — small enough to commit — so
# trained weights survive the machine.  Keys are jax tree paths
# (keystr), not flatten order, so restore is robust to pytree-structure
# refactors that keep leaf names.
# ---------------------------------------------------------------------------


def export_params_npz(
    path: str,
    params: Any,
    model_cfg: Optional[ModelConfig] = None,
    extra: Optional[dict] = None,
) -> str:
    """Write params to one ``.npz``, preserving each leaf's dtype.

    bfloat16 leaves are stored as their uint16 bit pattern (numpy's npz
    writer has no native bfloat16) with the true dtype recorded in the
    embedded meta; everything else is stored as-is.
    """
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    dtypes = {}
    for kp, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = jax.tree_util.keystr(kp)
        x = np.asarray(leaf)
        dtypes[key] = str(x.dtype)
        if x.dtype.itemsize == 2 and "bfloat16" in str(x.dtype):
            x = x.view(np.uint16)
        arrays[key] = x
    meta = {"dtypes": dtypes, **(extra or {})}
    if model_cfg is not None:
        meta["model_config"] = json.loads(config_to_json(model_cfg))
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)
    return path


def import_params_npz(path: str, template: Any) -> Tuple[Any, dict]:
    """Restore a params pytree from :func:`export_params_npz` output.

    ``template`` supplies the pytree structure; leaves are matched by
    tree path.  Returned leaves keep their EXPORTED dtype (callers cast
    as needed).  Raises ``KeyError`` naming any template path absent
    from the file.
    """
    import ml_dtypes

    data = np.load(os.path.abspath(path))
    meta = json.loads(bytes(data["__meta__"]).decode("utf-8"))
    dtypes = meta.get("dtypes", {})
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, _ in paths:
        key = jax.tree_util.keystr(kp)
        if key not in data:
            raise KeyError(f"{path} is missing leaf {key!r}")
        x = data[key]
        if dtypes.get(key) == "bfloat16":
            x = x.view(ml_dtypes.bfloat16)
        leaves.append(x)
    return jax.tree_util.tree_unflatten(treedef, leaves), meta
