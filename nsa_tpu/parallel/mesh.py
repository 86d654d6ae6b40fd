"""Device mesh construction for (data, heads) parallel execution.

The reference has no distributed execution whatsoever (SURVEY.md section
2.4: no DP/TP/PP, no collectives, no process groups).  Here the framework
is mesh-parallel from the start:

* ``data``  — batch data parallelism (gradients all-reduced over ICI/DCN);
* ``heads`` — tensor parallelism over attention heads.  NSA block selection
  is per-KV-head, so sharding the KV cache, compressed cache, and all
  projections over KV heads keeps every block-index gather local to its
  shard; only the attention-output projection introduces a psum.

XLA GSPMD inserts the collectives from the shardings; no explicit
communication code is needed in the model.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_DATA = "data"
AXIS_HEADS = "heads"
AXIS_DCN = "dcn"


def make_hierarchical_mesh(
    dcn: int, data: int, heads: int, devices: Optional[Sequence] = None,
) -> Mesh:
    """Multi-host-shaped 3-axis mesh: ("dcn", "data", "heads").

    The leading axis models the inter-host (DCN) tier of a multi-pod
    deployment: batches shard over BOTH ("dcn", "data"), so the gradient
    all-reduce GSPMD inserts spans the slow tier exactly once (ICI
    reductions inside a host, one DCN reduction across hosts).  Parameters
    and TP stay inside a host (replicated over "dcn").  With virtual CPU
    devices this validates the sharding structure; real multi-host meshes
    pass their actual device grid."""
    devices = list(devices if devices is not None else jax.devices())
    assert dcn * data * heads == len(devices), (dcn, data, heads, len(devices))
    arr = np.array(devices).reshape(dcn, data, heads)
    return Mesh(arr, (AXIS_DCN, AXIS_DATA, AXIS_HEADS))


def make_mesh(
    data: Optional[int] = None,
    heads: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % heads == 0, (n, heads)
        data = n // heads
    assert data * heads == n, f"mesh {data}x{heads} != {n} devices"
    arr = np.array(devices).reshape(data, heads)
    return Mesh(arr, (AXIS_DATA, AXIS_HEADS))


def auto_mesh(n_devices: Optional[int] = None, kv_heads: int = 4) -> Mesh:
    """Pick the largest heads axis dividing both kv_heads and the device
    count; the remainder becomes the data axis."""
    devices = jax.devices()
    n = n_devices or len(devices)
    heads = math.gcd(kv_heads, n)
    return make_mesh(data=n // heads, heads=heads, devices=devices[:n])
