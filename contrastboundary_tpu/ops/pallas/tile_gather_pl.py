"""Pallas tile-window gather — the one-hot MXU gather with NO one-hot in HBM.

The XLA tile path (ops/tile_gather.py) already turned neighbor gathers into
per-tile one-hot matmuls, but XLA materializes every [B, G, T, W] one-hot
operand in HBM between the compare and the matmul (f32: ~200 MB per k per
gather at the flagship level-0 shape — several GB of pure HBM traffic per
step, forward and backward). This kernel builds each one-hot inside VMEM per
(batch, tile) grid cell, so the only HBM traffic is the unavoidable input
window + output block.

Construct constraints (bisected against this deployment's remote Mosaic
helper — scripts/mosaic_probe*.py, round 3):
  PASS: grid + clipped window BlockSpecs, per-k one-hot f32/bf16 matmuls,
        full-block f32 stores ([1,T,K,C]), 5-D output blocks, bf16 2-D
        stores, lane reductions on matmul outputs.
  FAIL: bf16 stores to >2-D blocks (bf16 outputs here use a 2-D [T, K·C]
        lane-concat layout reshaped by the caller), and several
        broadcast-where output patterns (not used here).
The remote helper also 500s intermittently; callers must eagerly probe-
compile once per shape and fall back to the XLA path (ops/tile_gather.py
dispatches).

Same contract as ops/tile_gather.tile_window_gather: x [B, M, C] SORTED
rows, local_idx [B, M, K] window-relative with shadow = width·tile (zero
row), static (tile, width); backward is the transposed matmul with the
per-slot window grads overlap-added in XLA (cheap: [B, G, width, T, C]
slices onto [B, M, C] rows).

Reference equivalent: the CUDA grouping kernel + scatter backward
(pytorch/lib/pointops/src/grouping/grouping_cuda_kernel.cu, pointops.py:48-76).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tile_gather import window_starts


def _window_specs(width: int, window: int, num_tiles: int, tile: int, cl: int):
    """`width` clipped block-mapped views of x forming each tile's window
    (block metadata only — no in-kernel dynamic slicing; the pattern the
    remote Mosaic accepts, scripts/mosaic_probe.py p3)."""
    specs = []
    for j in range(width):
        specs.append(
            pl.BlockSpec(
                (1, tile, cl),
                functools.partial(
                    lambda bb, gg, j=0: (
                        bb,
                        jnp.clip(gg - window, 0, num_tiles - width) + j,
                        0,
                    ),
                    j=j,
                ),
                memory_space=pltpu.VMEM,
            )
        )
    return specs


def _fwd_kernel(*refs, tile, width, k, bf16_2d):
    win = jnp.concatenate([r[0] for r in refs[:width]], axis=0)  # [W, C]
    li = refs[width][0]  # [T, K]
    o_ref = refs[width + 1]
    w_sz = win.shape[0]
    iota_w = lax.broadcasted_iota(jnp.int32, (tile, w_sz), 1)
    # one-hot selection must be exact: f32 inputs need HIGHEST (the MXU's
    # default f32 matmul runs bf16 passes — a plain dot loses input bits);
    # bf16 inputs are exact in one pass (0/1 matrix)
    prec = None if win.dtype == jnp.bfloat16 else lax.Precision.HIGHEST
    cols = []
    for kk in range(k):
        oh = (li[:, kk][:, None] == iota_w).astype(win.dtype)
        nb = lax.dot_general(
            oh, win, (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )  # [T, C] f32; shadow index W -> all-zero one-hot row -> zeros
        cols.append(nb)
    if bf16_2d:
        # bf16 >2-D stores are rejected by the remote Mosaic; emit the K
        # neighbors lane-concatenated as one 2-D [T, K*C] block
        o_ref[0] = jnp.concatenate(
            [c.astype(jnp.bfloat16) for c in cols], axis=1
        )
    else:
        for kk in range(k):
            o_ref[0, :, kk, :] = cols[kk]


def _bwd_kernel(*refs, tile, width, k):
    """Per-tile window grads: dwin[j] = Σ_k oh_kᵀ · g_k for window slot j.
    Emitted as a 5-D (1, 1, width, T, C) f32 block; the caller overlap-adds
    slots onto rows (same pattern as ops/tile_gather._gather_bwd_impl)."""
    li = refs[0][0]  # [T, K]
    g_ref = refs[1]  # (1, T, K, C) f32 cotangent block
    o_ref = refs[2]
    w_sz = width * tile
    iota_w = lax.broadcasted_iota(jnp.int32, (tile, w_sz), 1)
    cl = g_ref.shape[-1]
    acc = jnp.zeros((w_sz, cl), jnp.float32)
    for kk in range(k):
        oh = (li[:, kk][:, None] == iota_w).astype(jnp.float32)
        acc = acc + lax.dot_general(
            oh, g_ref[0, :, kk, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    for j in range(width):
        o_ref[0, 0, j] = acc[j * tile:(j + 1) * tile, :]


def _fwd_call(x, local_idx, tile, width, interpret=False):
    b, m, cl = x.shape
    g = m // tile
    k = local_idx.shape[-1]
    bf16 = x.dtype == jnp.bfloat16
    kern = functools.partial(
        _fwd_kernel, tile=tile, width=width, k=k, bf16_2d=bf16
    )
    window = (width - 1) // 2
    in_specs = _window_specs(width, window, g, tile, cl) + [
        pl.BlockSpec((1, tile, k), lambda bb, gg: (bb, gg, 0),
                     memory_space=pltpu.VMEM),
    ]
    if bf16:
        out_spec = pl.BlockSpec((1, tile, k * cl), lambda bb, gg: (bb, gg, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, m, k * cl), jnp.bfloat16)
    else:
        out_spec = pl.BlockSpec(
            (1, tile, k, cl), lambda bb, gg: (bb, gg, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((b, m, k, cl), jnp.float32)
    out = pl.pallas_call(
        kern,
        grid=(b, g),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*([x] * width + [local_idx]))
    if bf16:
        out = out.reshape(b, m, k, cl)
    return out


def _bwd_call(x_shape, x_dtype, local_idx, g_out, tile, width,
              interpret=False):
    b, m, cl = x_shape
    g = m // tile
    k = local_idx.shape[-1]
    kern = functools.partial(_bwd_kernel, tile=tile, width=width, k=k)
    dwin = pl.pallas_call(
        kern,
        grid=(b, g),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda bb, gg: (bb, gg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k, cl), lambda bb, gg: (bb, gg, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, width, tile, cl), lambda bb, gg: (bb, gg, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, g, width, tile, cl), jnp.float32),
        interpret=interpret,
    )(local_idx, g_out.astype(jnp.float32))
    # overlap-add the per-tile window slots back onto level rows
    starts = window_starts(g, width)
    dx = jnp.zeros((b, g, tile, cl), jnp.float32)
    for j in range(width):
        dx = dx.at[:, starts + j].add(dwin[:, :, j])
    return dx.reshape(b, m, cl).astype(x_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def tile_window_gather_pl(x, local_idx, tile, width, interpret=False):
    """Pallas twin of ops/tile_gather.tile_window_gather (same contract)."""
    return _fwd_call(x, local_idx, tile, width, interpret)


def _vjp_fwd(x, local_idx, tile, width, interpret=False):
    return _fwd_call(x, local_idx, tile, width, interpret), local_idx


def _vjp_bwd(tile, width, interpret, local_idx, g_out):
    b, m, k, cl = g_out.shape
    return (
        _bwd_call((b, m, cl), g_out.dtype, local_idx, g_out, tile, width,
                  interpret),
        None,
    )


tile_window_gather_pl.defvjp(_vjp_fwd, _vjp_bwd)
