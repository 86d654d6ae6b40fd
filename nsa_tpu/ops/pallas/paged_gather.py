"""Paged KV-block gather: DMA only the selected blocks out of the HBM cache.

The NSA decode step gathers ``num_selected + 1`` KV blocks per (batch,
kv-head) from the [b, kvh, max_len, d] cache.  XLA lowers that gather
poorly on TPU; this kernel keeps the cache in HBM (``pl.ANY``) and issues
one async DMA per selected block into the VMEM output, so HBM traffic is
exactly the sparse budget — the mechanism that makes NSA decode scale with
``k * block_size`` instead of sequence length (the reference only models
this saving analytically, reference: evaluation/efficiency.py:325-361).

Indices arrive via scalar prefetch (SMEM) so DMA source addresses are known
before the kernel body runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, cache_ref, out_ref, *, block_size, num_slots):
    """grid (b, kvh): DMA ``num_slots`` blocks of this (b, h) to the output."""
    bi = pl.program_id(0)
    hi = pl.program_id(1)

    def body(sem):
        def issue(s, _):
            blk = idx_ref[bi, hi, s]
            start = blk * block_size
            dma = pltpu.make_async_copy(
                cache_ref.at[bi, hi, pl.ds(start, block_size), :],
                out_ref.at[0, 0, pl.ds(s * block_size, block_size), :],
                sem,
            )
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(0, num_slots, issue, 0)

    pl.run_scoped(body, pltpu.SemaphoreType.DMA(()))


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def paged_gather(
    cache: jnp.ndarray,      # [b, kvh, max_len, d] (stays in HBM)
    indices: jnp.ndarray,    # [b, kvh, num_slots] int32 block ids
    block_size: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """-> [b, kvh, num_slots * block_size, d] gathered blocks."""
    from .runtime import resolve_interpret
    interpret = resolve_interpret(interpret)
    b, kvh, max_len, d = cache.shape
    num_slots = indices.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kvh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # cache stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 1, num_slots * block_size, d),
            lambda bi, hi, idx_ref: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _gather_kernel, block_size=block_size, num_slots=num_slots
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, kvh, num_slots * block_size, d), cache.dtype
        ),
        interpret=interpret,
    )(indices.astype(jnp.int32), cache)
