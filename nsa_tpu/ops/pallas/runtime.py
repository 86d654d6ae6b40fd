"""Shared Pallas runtime helpers."""

from __future__ import annotations

from typing import Optional

import jax


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
