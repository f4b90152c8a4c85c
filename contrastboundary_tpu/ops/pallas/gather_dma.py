"""Pallas row-gather kernel (per-row async DMA, wave-pipelined).

Measured result on v5e (see PERF.md): XLA's native gather sustains
~8.5 ns/row regardless of row width ≤128 lanes; this kernel's per-row DMA
descriptor issue costs ~39 ns/row — i.e. **XLA's gather engine is already at
the hardware's random-row rate and this kernel does not beat it**. It is kept
as (a) the scaffold for fused gather+compute kernels where skipping the HBM
materialization of the gathered tensor pays for the issue overhead, and
(b) a working example of SMEM-blocked dynamic indices + wave-limited DMA
semaphores (sflag space caps concurrent semaphores at 512).

Constraints: C must be a multiple of 128 (Mosaic DMA tiling); rows % tile == 0.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WAVE = 256  # concurrent DMAs per wave (sflag budget)


def _kernel(idx_ref, x_hbm, out_ref, sems, *, tile):
    def do_wave(w, _):
        base = w * _WAVE

        def start(j, _):
            pltpu.make_async_copy(
                x_hbm.at[idx_ref[base + j]], out_ref.at[base + j], sems.at[j]
            ).start()
            return 0

        lax.fori_loop(0, _WAVE, start, 0)

        def wait(j, _):
            pltpu.make_async_copy(
                x_hbm.at[idx_ref[base + j]], out_ref.at[base + j], sems.at[j]
            ).wait()
            return 0

        lax.fori_loop(0, _WAVE, wait, 0)
        return 0

    lax.fori_loop(0, tile // _WAVE, do_wave, 0)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def gather_rows_dma(
    x: jax.Array, idx: jax.Array, *, tile: int = 1024, interpret: bool = False
) -> jax.Array:
    """x [N, C] (C % 128 == 0), idx [M] int32 (M % tile == 0) → [M, C]."""
    n, c = x.shape
    (m,) = idx.shape
    if c % 128:
        raise ValueError(f"C={c} must be a multiple of 128")
    if m % tile:
        raise ValueError(f"M={m} must be a multiple of tile={tile}")
    return pl.pallas_call(
        functools.partial(_kernel, tile=tile),
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_WAVE,))],
        interpret=interpret,
    )(idx, x)
