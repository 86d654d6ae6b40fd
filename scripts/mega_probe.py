#!/usr/bin/env python
"""Mosaic legality micro-probes for the megakernel's novel patterns.

Each probe is a tiny kernel that compiles in seconds, isolating ONE of
the patterns the whole-model decode megakernel
(ops/pallas/nsa_megakernel.py) relies on but the proven 2-kernel path
does not exercise.  Run these FIRST when the megakernel fails on TPU —
a failing probe names the illegal pattern directly.

  python scripts/mega_probe.py [--cpu]

Probes:
  1. vreg->sreg: a masked lane reduction of a VMEM int32 vector feeding a
     DMA start address (in-kernel top-k index -> block gather).
  2. stacked ref transforms: `.at[0, :, pl.ds(h, 1)]` view of a blocked
     5-D operand, then indexed `[:, 0, :, :d]` (the _select_math shims).
  3. iota-built selection matmul for non-lane-aligned extracts (gates).
  4. grid-carried scratch + constant-index output flushed on the last
     grid step + per-grid-step blocked weight (the layer-loop skeleton).
"""

import functools
import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from nsa_tpu.ops.pallas.runtime import resolve_interpret  # noqa: E402


def probe1_scalar_dma():
    """Reduction-derived scalar as a DMA start index."""
    Bs = 16

    def kern(x_hbm, idx_ref, out_ref, sem):
        row = idx_ref[0:1, :]                              # [1, 128] int32
        ids = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
        blk = jnp.max(jnp.where(ids == 2, row, -(2 ** 30)))  # lane 2 -> scalar
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(blk * Bs, Bs), :], out_ref, sem)
        cp.start()
        cp.wait()

    x = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
    idx = jnp.zeros((1, 128), jnp.int32).at[0, 2].set(5)
    interpret = resolve_interpret(None)
    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=(pl.ANY if interpret
                                       else pltpu.MemorySpace.HBM)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(x, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x[80:96]))
    print("probe1 scalar-DMA ok")


def probe2_ref_transforms():
    """Chained transforms on a blocked 5-D ref."""
    b, kvh, Wc, d2 = 2, 4, 40, 128

    def kern(ckv_ref, out_ref):
        acc = jnp.zeros((b, d2 // 2), jnp.float32)
        for hi in range(kvh):
            view = ckv_ref.at[0, :, pl.ds(hi, 1)]          # [b, 1, Wc, 2d]
            ck = view[:, 0, :, :d2 // 2]                   # [b, Wc, d]
            acc = acc + jnp.sum(ck, axis=1)
        out_ref[...] = acc

    x = jnp.arange(b * kvh * Wc * d2, dtype=jnp.float32).reshape(
        1, b, kvh, Wc, d2)
    interpret = resolve_interpret(None)
    out = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, b, kvh, Wc, d2), lambda l: (l, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b, d2 // 2), lambda l: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d2 // 2), jnp.float32),
        interpret=interpret,
    )(x)
    want = x[0, :, :, :, :d2 // 2].sum(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)
    print("probe2 ref-transforms ok")


def probe3_iota_matmul_extract():
    """Non-lane-aligned 3-lane extract via an iota 0/1 matmul."""
    h = 8

    def kern(g_ref, out_ref):
        gates = g_ref[...]                                 # [2, 3h]
        for i in range(h):
            rows = jax.lax.broadcasted_iota(jnp.int32, (3 * h, 3), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (3 * h, 3), 1)
            esel = (rows == 3 * i + cols).astype(jnp.float32)
            g3 = jax.lax.dot_general(
                gates, esel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[:, i, :] = g3

    g = jnp.arange(2 * 3 * h, dtype=jnp.float32).reshape(2, 3 * h)
    interpret = resolve_interpret(None)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h, 3), jnp.float32),
        interpret=interpret,
    )(g)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(g).reshape(2, h, 3), rtol=1e-6)
    print("probe3 iota-matmul extract ok")


def probe4_grid_carry():
    """Scratch carried across grid steps; output written on the last."""
    L, b, dim = 6, 2, 128

    def kern(w_ref, out_ref, x_s, *, depth):
        l = pl.program_id(0)

        @pl.when(l == 0)
        def _init():
            x_s[...] = jnp.ones((b, dim), jnp.float32)

        x_s[...] = x_s[...] + w_ref[0]

        @pl.when(l == depth - 1)
        def _out():
            out_ref[...] = x_s[...]

    w = jnp.tile(jnp.arange(L, dtype=jnp.float32)[:, None, None], (1, 1, dim))
    interpret = resolve_interpret(None)
    out = pl.pallas_call(
        functools.partial(kern, depth=L),
        grid=(L,),
        in_specs=[pl.BlockSpec((1, 1, dim), lambda l: (l, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b, dim), lambda l: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, dim), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, dim), jnp.float32)],
        interpret=interpret,
    )(w)
    np.testing.assert_allclose(
        np.asarray(out), np.full((b, dim), 1.0 + sum(range(L))), rtol=1e-6)
    print("probe4 grid-carry ok")


if __name__ == "__main__":
    probe1_scalar_dma()
    probe2_ref_transforms()
    probe3_iota_matmul_extract()
    probe4_grid_carry()
    print("all probes ok")
