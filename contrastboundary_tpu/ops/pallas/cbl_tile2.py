"""Fused Pallas CBL stage loss, v2 — streaming (online-softmax) form.

v1 (ops/pallas/cbl_tile.py) was interpret-correct but rejected by the remote
Mosaic compile helper with an opaque HTTP 500. Round-3 bisection
(scripts/mosaic_probe*.py) plus one surfaced terminal-side error finally
explained it: the 500 is a **scoped-VMEM OOM** — an unrolled K-loop that
keeps per-k tensors (one-hots, diffs) live allocates ~27 MB against the
16 MB VMEM stack limit at K=35. The fix is algorithmic, not syntactic:

  - ONLINE softmax accumulation (flash-attention style): one pass over the
    K neighbors carrying only [T,1] running state (max, rescaled pos/all
    exp sums, counts) — nothing per-k survives the loop iteration;
  - per-ROW label metadata precomputed in XLA ([B,M,8]: argmax-as-f32 +
    validity) so the neighbor's class arrives through the same one-hot MXU
    matmul as its features (selection of small ints is exact, and the
    kernel never lane-slices label columns);
  - the backward recomputes the streaming forward (pass 1: final max +
    sums), then a second streaming pass emits analytic feature gradients,
    accumulating only dfq [T,C] and the window grad [W,C].

Constructs kept inside the boundary the helper accepts: per-k one-hot
matmuls, [T,1] elementwise accumulators, concat-of-cols full-block stores,
SMEM scalars, 5-D output blocks, clipped window BlockSpecs. bf16 >2-D
stores are avoided (outputs are f32).

Scope (dispatched from losses/contrast.py): contrast='softnn', dist='l2'
or pre-normalized 'norml2', pos='cnt', no extra samplers/margins — the
flagship option point (pytorch/model/heads.py:145-165, 185-246). Matches
losses/contrast.py::cbl_stage_loss masked-mean semantics: the caller
divides Σ loss·mask by Σ mask.

HBM traffic per stage: reads M·(C+8) window rows + M·K indices, writes M·8
(fwd) / window-grad blocks (bwd) — no [B, M, K, C] tensor ever exists,
unlike the XLA tile path whose one-hot matmul operands round-trip GBs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.masking import EPS

_LOG_EPS = 1e-12
_NEG = -1e9


def _starts_np(num_tiles: int, width: int, window: int) -> np.ndarray:
    return np.clip(np.arange(num_tiles) - window, 0, num_tiles - width)


def _window_specs(width, window, num_tiles, tile, lanes):
    specs = []
    for j in range(width):
        specs.append(
            pl.BlockSpec(
                (1, tile, lanes),
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


def _neighbor_k(li, kk, feat_win, meta_win, q_feat, iota_w):
    """One neighbor via one-hot MXU matmuls → ([T,1] d, v, pos-raw ingredients,
    [T,C] diff). Nothing here outlives the caller's loop iteration."""
    prec = (
        None if feat_win.dtype == jnp.bfloat16 else lax.Precision.HIGHEST
    )
    w_sz = feat_win.shape[0]
    oh = (li[:, kk][:, None] == iota_w).astype(feat_win.dtype)
    feat_k = lax.dot_general(
        oh, feat_win, (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )
    meta_k = lax.dot_general(
        oh, meta_win, (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )
    in_win = (li[:, kk][:, None] < w_sz).astype(jnp.float32)
    v_k = in_win * meta_k[:, 1:2]
    amax_k = meta_k[:, 0:1]
    diff_k = q_feat.astype(jnp.float32) - feat_k
    d_k = jnp.sqrt(
        jnp.sum(diff_k * diff_k, axis=-1, keepdims=True) + _LOG_EPS
    )
    return d_k, v_k, amax_k, diff_k


def _stream_stats(feat_win, meta_win, q_feat, q_meta, li, temperature):
    """Streaming pass: final max `m_run`, rescaled Σ pos / Σ all exps, pos /
    valid counts — only [T,1] carries, constant VMEM in K."""
    tile = q_feat.shape[0]
    k = li.shape[1]
    w_sz = feat_win.shape[0]
    iota_w = lax.broadcasted_iota(jnp.int32, (tile, w_sz), 1)
    amax_q = q_meta[:, 0:1]

    m_run = jnp.full((tile, 1), _NEG, jnp.float32)
    p = jnp.zeros((tile, 1), jnp.float32)
    n = jnp.zeros((tile, 1), jnp.float32)
    pos_cnt = jnp.zeros((tile, 1), jnp.float32)
    valid_cnt = jnp.zeros((tile, 1), jnp.float32)
    for kk in range(k):
        d_k, v_k, amax_k, _ = _neighbor_k(
            li, kk, feat_win, meta_win, q_feat, iota_w
        )
        pos_k = (jnp.abs(amax_k - amax_q) < 0.5).astype(jnp.float32) * v_k
        a_val = jnp.where(v_k > 0, -d_k, _NEG)
        m_new = jnp.maximum(m_run, a_val)
        scale = jnp.exp((m_run - m_new) / temperature)
        e_k = jnp.exp(
            jnp.where(v_k > 0, (-d_k - m_new) / temperature, -50.0)
        ) * v_k
        p = p * scale + e_k * pos_k
        n = n * scale + e_k
        m_run = m_new
        pos_cnt = pos_cnt + pos_k
        valid_cnt = valid_cnt + v_k
    return m_run, p, n, pos_cnt, valid_cnt


def _loss_mask(p, n, pos_cnt, valid_cnt, center_valid):
    n_safe = jnp.maximum(n, EPS)
    ratio = p / n_safe
    loss = -jnp.log(ratio + EPS)
    mask = (
        (pos_cnt > 0) & (pos_cnt < valid_cnt) & (center_valid > 0)
    ).astype(jnp.float32)
    return loss, mask, ratio, n_safe


def _fwd_kernel(*refs, width, temperature, tile):
    feat_wins = refs[:width]
    meta_wins = refs[width:2 * width]
    q_feat = refs[2 * width][0]
    q_meta = refs[2 * width + 1][0]
    li = refs[2 * width + 2][0]
    o_ref = refs[2 * width + 3]

    feat_win = jnp.concatenate([r[0] for r in feat_wins], axis=0)
    meta_win = jnp.concatenate([r[0] for r in meta_wins], axis=0)
    m_run, p, n, pos_cnt, valid_cnt = _stream_stats(
        feat_win, meta_win, q_feat, q_meta, li, temperature
    )
    loss, mask, _, _ = _loss_mask(
        p, n, pos_cnt, valid_cnt, q_meta[:, 1:2]
    )
    pad = jnp.zeros((tile, 6), jnp.float32)
    o_ref[0] = jnp.concatenate([loss * mask, mask, pad], axis=1)


def _bwd_kernel(*refs, width, temperature, tile, window, num_tiles):
    feat_wins = refs[:width]
    meta_wins = refs[width:2 * width]
    q_feat_ref = refs[2 * width]
    q_meta_ref = refs[2 * width + 1]
    li_ref = refs[2 * width + 2]
    gl_ref = refs[2 * width + 3]  # SMEM (1, B): cotangent of loss_sum[b]
    dwin_ref = refs[2 * width + 4]

    bb = pl.program_id(0)
    g = pl.program_id(1)
    slot = g - jnp.clip(g - window, 0, num_tiles - width)

    feat_win = jnp.concatenate([r[0] for r in feat_wins], axis=0)
    meta_win = jnp.concatenate([r[0] for r in meta_wins], axis=0)
    q_feat = q_feat_ref[0]
    q_meta = q_meta_ref[0]
    li = li_ref[0]
    w_sz = feat_win.shape[0]
    c = q_feat.shape[1]
    k = li.shape[1]
    iota_w = lax.broadcasted_iota(jnp.int32, (tile, w_sz), 1)
    amax_q = q_meta[:, 0:1]

    # pass 1: streaming stats (the max reference is stop-gradient, like the
    # XLA path's stabilization)
    m_run, p, n, pos_cnt, valid_cnt = _stream_stats(
        feat_win, meta_win, q_feat, q_meta, li, temperature
    )
    _, mask, ratio, n_safe = _loss_mask(
        p, n, pos_cnt, valid_cnt, q_meta[:, 1:2]
    )
    gl = gl_ref[0, bb]

    inv = -1.0 / (ratio + EPS)  # dL/dratio
    dP = inv / n_safe
    dN = -inv * p / (n_safe * n_safe)

    # pass 2: streaming gradients — accumulate dfq [T,C] and window grad [W,C]
    dfq = jnp.zeros((tile, c), jnp.float32)
    acc = jnp.zeros((w_sz, c), jnp.float32)
    for kk in range(k):
        d_k, v_k, amax_k, diff_k = _neighbor_k(
            li, kk, feat_win, meta_win, q_feat, iota_w
        )
        pos_k = (jnp.abs(amax_k - amax_q) < 0.5).astype(jnp.float32) * v_k
        e_k = jnp.exp(
            jnp.where(v_k > 0, (-d_k - m_run) / temperature, -50.0)
        ) * v_k
        dd = (dP * pos_k + dN) * (-e_k / temperature) * mask * gl
        gk = (dd / d_k) * diff_k  # [T, C]
        dfq = dfq + gk
        oh = (li[:, kk][:, None] == iota_w).astype(jnp.float32)
        # f32 operands either way (oh/gk); HIGHEST keeps the one-hot
        # scatter-transpose exact
        acc = acc + lax.dot_general(
            oh, -gk, (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    for j in range(width):
        part = acc[j * tile:(j + 1) * tile, :]
        sel = (jnp.int32(j) == slot).astype(jnp.float32)
        dwin_ref[0, 0, j] = part + sel * dfq


def _row_meta(label_soft):
    """Per-row label metadata in XLA: [B, M, 8] f32 with lane0 = argmax
    (float), lane1 = validity (Σ labels > 0). Cheap: M rows, 8 lanes."""
    b, m, _ = label_soft.shape
    amax = jnp.argmax(label_soft, axis=-1).astype(jnp.float32)
    valid = (jnp.sum(label_soft, axis=-1) > 0).astype(jnp.float32)
    pad = jnp.zeros((b, m, 6), jnp.float32)
    return jnp.concatenate([amax[..., None], valid[..., None], pad], axis=-1)


def _common_specs(width, window, g, tile, c, k):
    return (
        _window_specs(width, window, g, tile, c)
        + _window_specs(width, window, g, tile, 8)
        + [
            pl.BlockSpec((1, tile, c), lambda bb, gg: (bb, gg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 8), lambda bb, gg: (bb, gg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k), lambda bb, gg: (bb, gg, 0),
                         memory_space=pltpu.VMEM),
        ]
    )


def _fwd_call(features, meta, li, temperature, tile, width, window,
              interpret):
    b, m, c = features.shape
    g = m // tile
    kern = functools.partial(
        _fwd_kernel, width=width, temperature=temperature, tile=tile
    )
    meta_f = meta if features.dtype != jnp.bfloat16 else meta.astype(
        jnp.bfloat16
    )
    out = pl.pallas_call(
        kern,
        grid=(b, g),
        in_specs=_common_specs(width, window, g, tile, c, li.shape[-1]),
        out_specs=pl.BlockSpec((1, tile, 8), lambda bb, gg: (bb, gg, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, 8), jnp.float32),
        interpret=interpret,
    )(*([features] * width + [meta_f] * width
        + [features, meta_f, li]))
    loss_sum = jnp.sum(out[:, :, 0], axis=-1)
    mask_sum = jnp.sum(out[:, :, 1], axis=-1)
    return loss_sum, mask_sum


def _bwd_call(features, meta, li, g_loss, temperature, tile, width, window,
              interpret):
    b, m, c = features.shape
    g = m // tile
    kern = functools.partial(
        _bwd_kernel, width=width, temperature=temperature, tile=tile,
        window=window, num_tiles=g,
    )
    gl = g_loss.astype(jnp.float32).reshape(1, b)
    meta_f = meta if features.dtype != jnp.bfloat16 else meta.astype(
        jnp.bfloat16
    )
    in_specs = _common_specs(width, window, g, tile, c, li.shape[-1]) + [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # (1, B) gl row
    ]
    dwin = pl.pallas_call(
        kern,
        grid=(b, g),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, width, tile, c), lambda bb, gg: (bb, gg, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, g, width, tile, c), jnp.float32),
        interpret=interpret,
    )(*([features] * width + [meta_f] * width
        + [features, meta_f, li, gl]))

    starts = _starts_np(g, width, window)
    dx = jnp.zeros((b, g, tile, c), jnp.float32)
    for j in range(width):
        dx = dx.at[:, starts + j].add(dwin[:, :, j])
    return dx.reshape(b, m, c).astype(features.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def cbl_tile_softnn2(features, label_soft, li, temperature, tile, width,
                     window, interpret=False):
    """Fused flagship CBL stage loss (softnn · l2 · cnt), v2 streaming.

    features   [B, M, C] SORTED rows (pre-normalized for norml2);
    label_soft [B, M, ncls] sub-scene soft labels (no gradient);
    li         [B, M, K] window-relative neighbor indices (shadow = W).
    Returns (loss_sum [B], mask_sum [B]); the caller computes
    masked_mean = Σ loss_sum / Σ mask_sum (losses/contrast.py).
    """
    meta = _row_meta(label_soft)
    return _fwd_call(features, meta, li, temperature, tile, width, window,
                     interpret)


def _vjp_fwd(features, label_soft, li, temperature, tile, width, window,
             interpret=False):
    meta = _row_meta(label_soft)
    out = _fwd_call(features, meta, li, temperature, tile, width, window,
                    interpret)
    return out, (features, meta, li)


def _vjp_bwd(temperature, tile, width, window, interpret, res, g):
    features, meta, li = res
    g_loss, _g_mask = g  # mask_sum is label-only → zero feature gradient
    dfeat = _bwd_call(features, meta, li, g_loss, temperature, tile, width,
                      window, interpret)
    return dfeat, None, None


cbl_tile_softnn2.defvjp(_vjp_fwd, _vjp_bwd)
