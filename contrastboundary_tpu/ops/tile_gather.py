"""Tile-window gather as one-hot MXU matmuls — the TPU answer to
neighbor gathers.

XLA's gather issues ~8.5 ns/row and its backward scatter-add ~24 ns/row
regardless of row width (PERF.md §2) — at CBL scale (2.3M neighbor rows per
step at level 0) that is ~75 ms of a 258 ms step. When neighbor indices are
window-relative in Morton-sorted space (ops/knn.py::tile_self_knn), the
gather collapses to a batched per-tile matmul: out[q, k] = onehot(idx[q, k])
· window, and — crucially — its backward is the TRANSPOSED matmul, so the
scatter-add disappears entirely. Both run on the MXU at matmul rates.

Exactness: a one-hot matmul is a row SELECTION. The 0/1 matrix is exact in
bf16, and with Precision.HIGH (bf16×3 passes) a float32 operand is
reconstructed exactly, so the gather is bit-faithful for f32 inputs; bf16
inputs take the single-pass fast path. The one-hot matrices are rebuilt on
the fly in both passes (custom_vjp), never kept as residuals.

Equivalent reference work: the CUDA grouping kernel + its scatter backward
(pytorch/lib/pointops/src/grouping/grouping_cuda_kernel.cu,
pointops.py:48-76).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def window_starts(num_tiles: int, width: int) -> np.ndarray:
    """Static per-tile window start rows (tile units), edge-clipped so every
    window has exactly `width` tiles (matches ops/knn.py::tile_self_knn)."""
    window = (width - 1) // 2
    return np.clip(np.arange(num_tiles) - window, 0, num_tiles - width)


def cross_window_starts(gq: int, gs: int, width: int,
                        window: int) -> np.ndarray:
    """Static support-window starts (tile units) for CROSS-level geometry:
    query tile g of a gq-tile level spans support tiles around (g·gs)//gq
    (matches ops/knn.py::tile_cross_knn)."""
    centers = (np.arange(gq) * gs) // max(gq, 1)
    return np.clip(centers - window, 0, gs - width)


def _windows(x: jax.Array, tile: int, width: int, starts=None) -> jax.Array:
    """x [B, N, C] → window blocks [B, Gq, W, C] (W = width·tile). `starts`
    (tile units, len = #query tiles) defaults to the self geometry."""
    b, n, c = x.shape
    gs = n // tile
    if starts is None:
        starts = window_starts(gs, width)  # self: query tiles == support
    xt = x.reshape(b, gs, tile, c)
    # [B, Gq, width, tile, C]: tile-level gather (Gq·width rows — negligible)
    win = xt[:, jnp.asarray(starts)[:, None] + jnp.arange(width)[None, :]]
    return win.reshape(b, len(starts), width * tile, c)


def _sel_matmul(oh_bool, other, subscripts):
    """One-hot selection matmul, exact for f32 via bf16×3 (Precision.HIGH)."""
    if other.dtype == jnp.bfloat16:
        return jnp.einsum(
            subscripts, oh_bool.astype(jnp.bfloat16), other,
            preferred_element_type=jnp.float32,
        )
    return jnp.einsum(
        subscripts,
        oh_bool.astype(jnp.float32),
        other.astype(jnp.float32),
        precision=jax.lax.Precision.HIGH,
        preferred_element_type=jnp.float32,
    )


def _gather_fwd_impl(x, local_idx, tile, width, starts=None):
    b, mq, k = local_idx.shape
    c = x.shape[-1]
    g = mq // tile
    w = width * tile
    xw = _windows(x, tile, width, starts)  # [B, Gq, W, C]
    li = local_idx.reshape(b, g, tile, k)
    iota = jnp.arange(w, dtype=local_idx.dtype)
    outs = []
    for kk in range(k):  # per-k one-hot keeps the [.., W] tensor transient
        oh = li[..., kk, None] == iota  # [B, G, Q, W]; shadow W → all-zero row
        outs.append(_sel_matmul(oh, xw, "bgqw,bgwc->bgqc"))
    out = jnp.stack(outs, axis=3)  # [B, G, Q, K, C]
    return out.reshape(b, mq, k, c).astype(x.dtype)


def _gather_bwd_impl(x_shape, x_dtype, local_idx, g_out, tile, width,
                     starts=None):
    b, n, c = x_shape  # SUPPORT shape
    gs = n // tile
    mq = local_idx.shape[1]
    g = mq // tile
    k = local_idx.shape[-1]
    w = width * tile
    if starts is None:
        starts = window_starts(gs, width)
    li = local_idx.reshape(b, g, tile, k)
    gr = g_out.reshape(b, g, tile, k, c)
    iota = jnp.arange(w, dtype=local_idx.dtype)
    gw = jnp.zeros((b, g, w, c), jnp.float32)
    for kk in range(k):
        oh = li[..., kk, None] == iota
        gw = gw + _sel_matmul(oh, gr[:, :, :, kk, :], "bgqw,bgqc->bgwc")
    # overlap-add the per-tile window grads back onto rows: window slot j of
    # query tile t covers support tile starts[t] + j
    gw = gw.reshape(b, g, width, tile, c)
    gx = jnp.zeros((b, gs, tile, c), jnp.float32)
    for j in range(width):
        gx = gx.at[:, np.asarray(starts) + j].add(gw[:, :, j])
    return gx.reshape(b, n, c).astype(x_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def tile_window_gather(x, local_idx, tile, width):
    """out [B, M, K, C]: out[b, q, k] = x[b, starts[q // tile]·tile + idx]
    for idx = local_idx[b, q, k] < W; zeros for the shadow index W.

    x [B, M, C] in SORTED (Morton) order; local_idx window-relative
    (ops/knn.py::tile_self_knn). tile/width static."""
    return _gather_fwd_impl(x, local_idx, tile, width)


def _fwd(x, local_idx, tile, width):
    return _gather_fwd_impl(x, local_idx, tile, width), local_idx


def _bwd(tile, width, local_idx, g_out):
    b, m, k, c = g_out.shape
    return (
        _gather_bwd_impl((b, m, c), g_out.dtype, local_idx, g_out, tile, width),
        None,
    )


tile_window_gather.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def cross_window_gather(x, local_idx, n_support, tile, width, window):
    """Cross-level window gather as one-hot MXU matmuls (round 4).

    out [B, Mq, K, C]: out[b, q, k] = x[b, starts[q // tile]·tile + idx] for
    idx = local_idx[b, q, k] < W; zeros for the shadow index W. `x` is the
    SUPPORT level [B, N, C] and local_idx is window-relative in the
    tile_cross_knn geometry (starts from cross_window_starts(gq, gs, width,
    window)). Backward is the transposed matmul overlap-added onto support
    rows — replaces the row-rate gather + scatter-add pair the profile
    showed on every TransitionDown/Up and multihead stage gather.

    `n_support` is passed explicitly (static) so the VJP needs no residual
    beyond local_idx. Equivalent reference work: pointops grouping /
    interpolation CUDA kernels (pytorch/lib/pointops/src/grouping,
    src/interpolation)."""
    gq = local_idx.shape[1] // tile
    starts = cross_window_starts(gq, n_support // tile, width, window)
    return _gather_fwd_impl(x, local_idx, tile, width, starts)


def _cross_fwd(x, local_idx, n_support, tile, width, window):
    return (
        cross_window_gather(x, local_idx, n_support, tile, width, window),
        local_idx,
    )


def _cross_bwd(n_support, tile, width, window, local_idx, g_out):
    gq = local_idx.shape[1] // tile
    starts = cross_window_starts(gq, n_support // tile, width, window)
    b, _, _, c = g_out.shape
    # the forward casts its output to x.dtype, so g_out.dtype == x.dtype
    return (
        _gather_bwd_impl((b, n_support, c), g_out.dtype, local_idx, g_out,
                         tile, width, starts),
        None,
    )


cross_window_gather.defvjp(_cross_fwd, _cross_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def tile_window_gather_hybrid(x, local_idx, tile, width, interpret=False):
    """Pallas forward (one-hots built in VMEM — measured 1.2-1.9x over the
    XLA forward) with the XLA transposed-matmul backward (measured faster
    than the Pallas backward kernel; see the round-3 A/B note below)."""
    from .pallas.tile_gather_pl import _fwd_call

    return _fwd_call(x, local_idx, tile, width, interpret)


def _hybrid_fwd(x, local_idx, tile, width, interpret=False):
    from .pallas.tile_gather_pl import _fwd_call

    return _fwd_call(x, local_idx, tile, width, interpret), local_idx


def _hybrid_bwd(tile, width, interpret, local_idx, g_out):
    return _bwd(tile, width, local_idx, g_out)


tile_window_gather_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)


# ---------------------------------------------------------------------------
# Pallas dispatch: build the one-hots in VMEM instead of HBM when the
# deployment's Mosaic accepts the kernel (ops/pallas/tile_gather_pl.py).
# The remote compile helper 500s on some construct combinations and is
# intermittently flaky, so the kernel is probe-compiled EAGERLY once per
# shape (with one retry) and the XLA path above is the fallback. Controlled
# by CBL_PALLAS=auto|on|off; 'on' raises on probe failure.
#
# DEFAULT OFF — measured negative result (round 3, within-session whole-step
# A/B at the flagship bf16 shape, scripts/ab_step_pallas.py): the Pallas
# forward alone wins 1.2–1.9x per-op, but the backward kernel loses to
# XLA's transposed-matmul path and the full train step regresses 151 ms ->
# 198 ms (0.77x). The kernel is kept, tested (interpret parity + on-device
# numerics exact for bf16), and dispatchable for future Mosaic toolchains.
# ---------------------------------------------------------------------------
_PALLAS_PROBED: dict = {}


def _pallas_ok(tile: int, width: int, k: int, cl: int, dtype) -> bool:
    import os
    import warnings

    mode = os.environ.get("CBL_PALLAS", "off")
    if mode == "off":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    key = (mode == "hybrid", tile, width, k, cl, jnp.dtype(dtype).name)
    if key in _PALLAS_PROBED:
        return _PALLAS_PROBED[key]

    from .pallas.tile_gather_pl import tile_window_gather_pl

    def attempt():
        g = max(width, 2)
        m = g * tile
        x = jnp.zeros((1, m, cl), dtype)
        li = jnp.zeros((1, m, k), jnp.int32)
        jax.block_until_ready(tile_window_gather_pl(x, li, tile, width))
        if mode == "hybrid":
            return  # hybrid never runs the Pallas backward kernel
        gr = jax.grad(
            lambda xx: jnp.sum(
                tile_window_gather_pl(xx, li, tile, width).astype(jnp.float32)
            )
        )(x)
        jax.block_until_ready(gr)

    ok = False
    for _ in range(2):  # the helper is intermittently flaky — retry once
        try:
            attempt()
            ok = True
            break
        except Exception as e:  # MosaicError reaches us as XlaRuntimeError
            err = e
    if not ok:
        if mode == "on":
            raise RuntimeError(
                f"CBL_PALLAS=on but the Pallas gather failed to compile "
                f"for shape {key}: {err}"
            )
        warnings.warn(
            f"Pallas tile gather unavailable for shape {key} "
            f"({type(err).__name__}); using the XLA one-hot path"
        )
    _PALLAS_PROBED[key] = ok
    return ok


def tile_window_gather_auto(x, local_idx, tile, width):
    """tile_window_gather with automatic Pallas dispatch (see above).
    CBL_PALLAS=hybrid dispatches the Pallas forward with the XLA
    transposed-matmul backward (each path's measured-faster half)."""
    import os

    k = local_idx.shape[-1]
    cl = x.shape[-1]
    if _pallas_ok(tile, width, k, cl, x.dtype):
        if os.environ.get("CBL_PALLAS") == "hybrid":
            return tile_window_gather_hybrid(x, local_idx, tile, width)
        from .pallas.tile_gather_pl import tile_window_gather_pl

        return tile_window_gather_pl(x, local_idx, tile, width)
    return tile_window_gather(x, local_idx, tile, width)
