"""Shared Pallas runtime helpers."""

from __future__ import annotations

from typing import Optional

import jax


# Context length at which the forward kernels switch from whole-row K/V
# VMEM residency to streaming K/V through double-buffered VMEM scratch via
# manual HBM DMA (shared by flash.py and nsa_prefill.py so the threshold
# cannot drift between the two kernel families).
STREAM_MIN_NK = 8192


def resolve_interpret(interpret: Optional[bool]) -> bool:
    """``None`` -> interpret mode iff the default backend is CPU.

    Lets every caller (model forward, decode step, sharded test meshes) use
    the kernel path unconditionally: on TPU the Mosaic kernels compile, on
    CPU (tests, virtual multi-device meshes) the same code runs in
    interpret mode, so the kernel dispatch layer is exercised everywhere.
    """
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret
