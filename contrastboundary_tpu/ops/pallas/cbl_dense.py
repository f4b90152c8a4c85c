"""Dense-window CBL stage loss, v3 — the lane-native formulation.

Why v3 (PERF.md round 4): both earlier fused-CBL attempts (cbl_tile.py,
cbl_tile2.py) and the XLA tile path share one structural cost — they
process neighbors ONE K AT A TIME: per-k one-hot [T, W] matmuls whose
compare traffic is K·T·W regardless of chunking, and per-k [T, 1]
transcendentals (sqrt/exp) that use 1 of 128 VPU lanes. The measured
result: the XLA tile path pays ~23 ms/step for the 5-stage CBL and the v2
kernel pays ~6× that.

This kernel removes the K loop from the MATH entirely. Per Morton tile:

  scores  [T, W]  = q @ winᵀ           one MXU matmul (replaces K gathers)
  d²      [T, W]  = |q|² + |s|² − 2·scores   (outer products + FMA)
  member  [T, W]  = ⋁ₖ (li[:, k] == iota)    the ONLY per-k work: K cheap
                                              compares OR-folded in VMEM
                                              (win_topk proves K=36 such
                                              passes compile on Mosaic)
  softnn stats    = full-lane [T, W] masked exp/Σ reductions → [T, 8]

Every transcendental runs on [T, W] tiles (100% lane utilization), no
[B, M, K, C] or one-hot tensor ever reaches HBM, and the backward is two
[T, W]-shaped matmuls (dq = Σcd·q − cd @ win, dwin = Σᵀcd·win − cdᵀ @ q)
plus the standard per-slot window-grad overlap-add.

Numerics: d² comes from the matmul expansion (|q−s|² = |q|²+|s|²−2q·s),
clamped at 0 before the sqrt — near-duplicate feature rows (padding
repeats real points) would otherwise go negative by cancellation. This is
the same documented trade the window-KNN kernels make for xyz distances
(CLAUDE.md: ~1e-7 matmul-expansion noise); the exact-semantics arms
disable kernels. Everything else (max-shift, −50 fill, EPS placement)
matches losses/contrast.py::_contrast_softnn bit-for-bit in structure.

Scope: the flagship option point — contrast='softnn', dist∈{l2, norml2
(pre-normalized by the caller)}, pos='cnt', no margins/extra samplers
(pytorch/model/heads.py:145-165, 185-246). The custom-VJP boundary is the
STATS kernel ([B, M, 8]); the loss itself is assembled in XLA
(`cbl_dense_loss`), so the masked mean and the point mask differentiate
by ordinary AD and the hand-written VJP only covers pos/under.

Per-row label metadata rides the same [B, M, 8] convention as cbl_tile2
(lane0 = argmax-as-f32, lane1 = validity); duplicate indices inside one
row of `li` would be counted once here vs twice by the gather path, but
the window top-k producers (ops/knn.py) return distinct slots by
construction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.masking import EPS, INF, masked_mean

_LOG_EPS = 1e-12
_NEG = -1e9


def _starts_np(num_tiles: int, width: int, window: int) -> np.ndarray:
    return np.clip(np.arange(num_tiles) - window, 0, num_tiles - width)


def _window_specs(width, window, num_tiles, tile, lanes, split=1):
    """Grid-split aware (ops/pallas/win_topk.py::auto_split): on grid
    (b·split, g/split) cell (bb, gg) owns batch bb//split and flat tile
    (bb%split)·(g/split)+gg — bit-exact re-partition that keeps the minor
    grid dim ≤64 (the preset shape's 256-cell dim deterministically 500s
    in the remote Mosaic helper; VERDICT round-4 item 4)."""
    gsub = num_tiles // split
    specs = []
    for j in range(width):
        specs.append(
            pl.BlockSpec(
                (1, tile, lanes),
                functools.partial(
                    lambda bb, gg, j=0: (
                        bb // split,
                        jnp.clip(
                            (bb % split) * gsub + gg - window,
                            0, num_tiles - width,
                        ) + j,
                        0,
                    ),
                    j=j,
                ),
                memory_space=pltpu.VMEM,
            )
        )
    return specs


def _tile_spec(tile, lanes, split=1, gsub=None):
    if split == 1:
        return pl.BlockSpec(
            (1, tile, lanes), lambda bb, gg: (bb, gg, 0),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (1, tile, lanes),
        lambda bb, gg: (bb // split, (bb % split) * gsub + gg, 0),
        memory_space=pltpu.VMEM,
    )


def _outer(col_t1, row_w1):
    """[T, 1] ⊗ [W, 1] → [T, W] via a 1-deep MXU dot (Mosaic-safe broadcast
    of a per-window-row vector across query rows)."""
    return lax.dot_general(
        col_t1, row_w1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _member_mask(li, tile, k, w_sz):
    """[T, W] 0/1 membership: slot w is one of the row's K neighbors.
    K unrolled compares OR-folded — the win_topk pass structure."""
    iota_w = lax.broadcasted_iota(jnp.int32, (tile, w_sz), 1)
    mem = jnp.zeros((tile, w_sz), jnp.float32)
    for kk in range(k):
        mem = jnp.maximum(
            mem, (li[:, kk][:, None] == iota_w).astype(jnp.float32)
        )
    return mem


def _dense_common(feat_wins, meta_wins, q_ref, qm_ref, li_ref, tile, k,
                  width, temperature):
    """Shared fwd/bwd recompute: returns (q, win, mv, posmv, dist, m_hat,
    e, cd-ready pieces)."""
    w_sz = width * tile
    win = jnp.concatenate(
        [r[0].astype(jnp.float32) for r in feat_wins], axis=0
    )  # [W, C]
    meta_win = jnp.concatenate([r[0] for r in meta_wins], axis=0)  # [W, 8]
    q = q_ref[0].astype(jnp.float32)  # [T, C]
    q_meta = qm_ref[0]  # [T, 8]
    li = li_ref[0]  # [T, K]
    t = q.shape[0]

    ones_t = jnp.ones((t, 1), jnp.float32)
    # d² by matmul expansion, clamped (see module docstring)
    scores = lax.dot_general(
        q, win, (((1,), (1,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [T, W]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)  # [T, 1]
    s2 = jnp.sum(win * win, axis=1, keepdims=True)  # [W, 1]
    d2 = jnp.maximum(q2 + _outer(ones_t, s2) - 2.0 * scores, 0.0)
    dist = jnp.sqrt(d2 + _LOG_EPS)  # [T, W]

    member = _member_mask(li, tile, k, w_sz)
    valid_w = _outer(ones_t, meta_win[:, 1:2])  # [T, W]
    amax_w = _outer(ones_t, meta_win[:, 0:1])  # [T, W]
    mv = member * valid_w
    posmv = (jnp.abs(q_meta[:, 0:1] - amax_w) < 0.5).astype(jnp.float32) * mv

    # relative cancellation floor of the expansion: pairs whose d² is below
    # ulp-level noise of |q|²+|s|² are treated as coincident (the XLA
    # elementwise path gets (q−s) ≡ 0 for bit-identical rows — padding
    # repeats real points — so its 1/dist never sees them; the bwd zeroes
    # cd under this floor to match that convention)
    scale2 = q2 + _outer(ones_t, s2)  # [T, W]
    # max-shift over valid slots (stop-grad in the VJP by construction)
    m_hat = jnp.max(jnp.where(mv > 0, -dist, -INF), axis=1, keepdims=True)
    arg = jnp.where(mv > 0, (-dist - m_hat) / temperature, -50.0)
    e = jnp.exp(arg) * mv  # [T, W]
    return q, win, mv, posmv, dist, m_hat, e, d2, scale2


def _fwd_kernel(*refs, width, tile, k, temperature):
    feat_wins = refs[:width]
    meta_wins = refs[width : 2 * width]
    q_ref, qm_ref, li_ref, o_ref = refs[2 * width : 2 * width + 4]
    _, _, mv, posmv, _, m_hat, e, _, _ = _dense_common(
        feat_wins, meta_wins, q_ref, qm_ref, li_ref, tile, k, width,
        temperature,
    )
    t = mv.shape[0]
    pos = jnp.sum(e * posmv, axis=1, keepdims=True)
    under = jnp.sum(e, axis=1, keepdims=True)
    pos_cnt = jnp.sum(posmv, axis=1, keepdims=True)
    valid_cnt = jnp.sum(mv, axis=1, keepdims=True)
    pad = jnp.zeros((t, 3), jnp.float32)
    o_ref[0] = jnp.concatenate(
        [m_hat, pos, under, pos_cnt, valid_cnt, pad], axis=1
    )


def _bwd_kernel(*refs, width, tile, k, temperature):
    feat_wins = refs[:width]
    meta_wins = refs[width : 2 * width]
    q_ref, qm_ref, li_ref, gs_ref, dq_ref, dwin_ref = refs[
        2 * width : 2 * width + 6
    ]
    q, win, mv, posmv, dist, m_hat, e, d2, scale2 = _dense_common(
        feat_wins, meta_wins, q_ref, qm_ref, li_ref, tile, k, width,
        temperature,
    )
    gs = gs_ref[0]  # [T, 8] stats cotangent: lanes 1 (pos), 2 (under)
    dpos = gs[:, 1:2]
    dunder = gs[:, 2:3]
    # dL/ddist through e = exp((−dist−m̂)/τ)·mv (m̂ stop-grad, matching the
    # XLA path's stop_gradient on the max-shift)
    coef = (dpos * posmv + dunder) * e * (-1.0 / temperature)  # [T, W]
    # coincident pairs: the XLA path's (q−s)/dist is exactly 0 for
    # bit-identical rows; under the expansion they show up as d² at the
    # cancellation floor with huge 1/dist — zero them (see _dense_common)
    cd = jnp.where(
        d2 > 1e-5 * scale2, coef / dist, 0.0
    )  # ddist/dq = (q − s)/dist
    cd_row = jnp.sum(cd, axis=1, keepdims=True)  # [T, 1]
    dq = cd_row * q - lax.dot_general(
        cd, win, (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    cd_col = lax.dot_general(  # [W, 1] column sums via onesᵀ
        cd, jnp.ones((tile, 1), jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwin = cd_col * win - lax.dot_general(
        cd, q, (((0,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [W, C]
    dq_ref[0] = dq
    for j in range(width):
        dwin_ref[0, 0, j] = dwin[j * tile : (j + 1) * tile]


def _row_meta(label_soft):
    """[B, M, 8] f32: lane0 = argmax (float), lane1 = validity — identical
    packing to cbl_tile2._row_meta."""
    b, m, _ = label_soft.shape
    amax = jnp.argmax(label_soft, axis=-1).astype(jnp.float32)
    valid = (jnp.sum(label_soft, axis=-1) > 0).astype(jnp.float32)
    pad = jnp.zeros((b, m, 6), jnp.float32)
    return jnp.concatenate([amax[..., None], valid[..., None], pad], axis=-1)


def _fwd_call(features, meta, li, temperature, tile, width, window,
              interpret, split):
    b, m, c = features.shape
    g = m // tile
    gsub = g // split
    k = li.shape[-1]
    kern = functools.partial(
        _fwd_kernel, width=width, tile=tile, k=k, temperature=temperature
    )
    in_specs = (
        _window_specs(width, window, g, tile, c, split)
        + _window_specs(width, window, g, tile, 8, split)
        + [_tile_spec(tile, c, split, gsub), _tile_spec(tile, 8, split, gsub),
           _tile_spec(tile, k, split, gsub)]
    )
    return pl.pallas_call(
        kern,
        grid=(b * split, gsub),
        in_specs=in_specs,
        out_specs=_tile_spec(tile, 8, split, gsub),
        out_shape=jax.ShapeDtypeStruct((b, m, 8), jnp.float32),
        interpret=interpret,
    )(*([features] * width + [meta] * width + [features, meta, li]))


def _bwd_call(features, meta, li, g_stats, temperature, tile, width, window,
              interpret, split):
    b, m, c = features.shape
    g = m // tile
    gsub = g // split
    k = li.shape[-1]
    kern = functools.partial(
        _bwd_kernel, width=width, tile=tile, k=k, temperature=temperature
    )
    in_specs = (
        _window_specs(width, window, g, tile, c, split)
        + _window_specs(width, window, g, tile, 8, split)
        + [_tile_spec(tile, c, split, gsub), _tile_spec(tile, 8, split, gsub),
           _tile_spec(tile, k, split, gsub), _tile_spec(tile, 8, split, gsub)]
    )
    dq, dwin = pl.pallas_call(
        kern,
        grid=(b * split, gsub),
        in_specs=in_specs,
        out_specs=(
            _tile_spec(tile, c, split, gsub),
            pl.BlockSpec(
                (1, 1, width, tile, c),
                lambda bb, gg: (
                    bb // split, (bb % split) * gsub + gg, 0, 0, 0
                ),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, c), jnp.float32),
            jax.ShapeDtypeStruct((b, g, width, tile, c), jnp.float32),
        ),
        interpret=interpret,
    )(*([features] * width + [meta] * width
        + [features, meta, li, g_stats]))

    starts = _starts_np(g, width, window)
    dx = dq.reshape(b, g, tile, c)
    for j in range(width):
        dx = dx.at[:, starts + j].add(dwin[:, :, j])
    return dx.reshape(b, m, c).astype(features.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def cbl_dense_stats(features, meta, li, temperature, tile, width, window,
                    interpret=False, split=1):
    """Per-point softnn statistics [B, M, 8]: lanes (m̂, Σpos e, Σ e,
    pos count, valid count, 0, 0, 0). features [B, M, C] f32 SORTED rows
    (pre-normalized for norml2); meta = _row_meta(label_soft);
    li [B, M, K] window-relative (shadow = width·tile)."""
    return _fwd_call(features, meta, li, temperature, tile, width, window,
                     interpret, split)


def _vjp_fwd(features, meta, li, temperature, tile, width, window,
             interpret=False, split=1):
    stats = _fwd_call(features, meta, li, temperature, tile, width, window,
                      interpret, split)
    return stats, (features, meta, li)


def _vjp_bwd(temperature, tile, width, window, interpret, split, res,
             g_stats):
    features, meta, li = res
    dfeat = _bwd_call(features, meta, li, g_stats.astype(jnp.float32),
                      temperature, tile, width, window, interpret, split)
    return dfeat, None, None


cbl_dense_stats.defvjp(_vjp_fwd, _vjp_bwd)


def cbl_dense_loss(features, label_soft, li, temperature, tile, width,
                   window, weight=1.0, interpret=False):
    """Flagship CBL stage loss (softnn · l2/norml2-prenormalized · cnt)
    via the dense-window stats kernel. Mirrors the XLA tile path in
    losses/contrast.py::cbl_stage_loss exactly (same EPS placement, same
    point mask) — only the pos/under sums run in the kernel."""
    from .win_topk import auto_split

    meta = _row_meta(label_soft)
    split = auto_split(features.shape[1] // tile, "CBL_DENSE_SPLIT")
    stats = cbl_dense_stats(
        features, meta, li, temperature, tile, width, window, interpret,
        split,
    )
    pos = stats[:, :, 1]
    under = stats[:, :, 2]
    pos_cnt = stats[:, :, 3]
    valid_cnt = stats[:, :, 4]
    ratio = pos / jnp.maximum(under, EPS)
    loss = -jnp.log(ratio + EPS)
    center_valid = jnp.sum(label_soft, axis=-1) > 0
    point_mask = (pos_cnt > 0) & (pos_cnt < valid_cnt) & center_valid
    return masked_mean(loss, point_mask) * weight


# ---------------------------------------------------------------------------
# probe-compile dispatch: CBL_DENSE=auto|on|off (default auto on TPU).
# Probes at the REAL grid geometry — a reduced-grid probe has constant
# (hoistable) window index maps and passed where the real grid failed
# (round-4 pt_attn lesson).
# ---------------------------------------------------------------------------
_PROBED: dict = {}


def cbl_dense_ok(num_tiles: int, tile: int, width: int, window: int, k: int,
                 c: int, temperature: float, strict: bool = False) -> bool:
    import os
    import warnings

    mode = os.environ.get("CBL_DENSE", "auto")
    if mode == "off":
        return False
    if mode == "interpret":  # test hook
        return True
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    from .win_topk import auto_split

    key = (num_tiles, tile, width, window, k, c,
           auto_split(num_tiles, "CBL_DENSE_SPLIT"))
    if key in _PROBED:
        return _PROBED[key]

    from ...utils.cache import setup_tpu_flags

    setup_tpu_flags()

    m = num_tiles * tile
    f = jnp.zeros((1, m, c), jnp.float32)
    ls = jnp.zeros((1, m, 4), jnp.float32)
    li = jnp.zeros((1, m, k), jnp.int32)

    def attempt():
        out = cbl_dense_loss(f, ls, li, temperature, tile, width, window)
        jax.block_until_ready(out)
        gr = jax.grad(
            lambda ff: cbl_dense_loss(ff, ls, li, temperature, tile, width,
                                      window)
        )(f)
        jax.block_until_ready(gr)

    ok, err = False, None
    try:
        attempt()
        ok = True
    except Exception as e:
        err = e
    if not ok:
        if strict or mode == "on":
            raise RuntimeError(
                f"CBL_DENSE=on but the dense CBL kernel failed to compile "
                f"for shape {key}: {err}"
            )
        warnings.warn(
            f"dense CBL kernel unavailable for shape {key} "
            f"({type(err).__name__}); falling back"
        )
    _PROBED[key] = ok
    return ok
