"""Fused point-transformer attention — the whole PointTransformerLayer inner
loop (neighbor gather + PE tower + weight tower + masked softmax + weighted
reduce) per Morton tile in VMEM, with an analytic-VJP backward.

Why (PERF.md round 4): the XLA path materializes every [B, N, K, C]-shaped
intermediate (kv_nb, pe, w_pre, tower activations) in HBM; the step is VPU
elementwise + HBM round-trips, not FLOPs. Here one window read feeds the
k|v one-hot MXU gather, the positional-encoding tower, the weight tower,
softmax and the reduce — no [B, N, K, C] tensor ever exists.

BatchNorm: requires ModelConfig.bn_mode='stale' (models/blocks.py::
StaleBatchNorm — normalize with running stats, update from batch stats).
The stale stats make every BN a per-channel affine with coefficients known
before the step, folded into this kernel's constants; the batch statistics
the running averages need (Σ, Σ² of the bn1/bn2 inputs) fall out of the
forward pass for free as extra outputs. Exact-BN ('batch') keeps the XLA
path — it needs a live reduction over the [B, N, K, C] tensor mid-tower.

Mosaic constraints honored (the round-3 bisection, ops/pallas/cbl_tile2.py):
per-k transients only inside the unrolled K-loop (K ≤ 16 here), window
BlockSpecs with clipped starts, f32 accumulators, concat-of-cols full-block
stores, no dynamic slices, 2-D iota only.

Equivalent reference work: pytorch/model/blocks.py:31-44 (the vector
self-attention) and the CUDA grouping/aggregation kernels it calls
(pytorch/lib/pointops).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _starts_np(num_tiles: int, width: int, window: int) -> np.ndarray:
    return np.clip(np.arange(num_tiles) - window, 0, num_tiles - width)


def _window_specs(width, window, num_tiles, tile, lanes, sub=1, split=1,
                  gsub=None):
    """One [1, T, lanes] block per window slot, start clipped per tile —
    identical pattern to cbl_tile2._window_specs.

    `sub` > 1: the grid iterates SUB-tiles (tile // sub rows per cell, round
    5) to bound VMEM at wide C; window blocks keep the full index-tile shape
    and map through the sub-tile's parent index tile (cell // sub).
    `split` > 1: grid (b·split, g2/split), cell (bb%split)·gsub+gg — the
    bit-exact grid re-partition that keeps the minor grid dim ≤64
    (ops/pallas/win_topk.py::auto_split; the preset shape's 256-cell dim
    500s in the remote Mosaic helper)."""
    if gsub is None:
        gsub = (num_tiles * sub) // split
    specs = []
    for j in range(width):
        specs.append(
            pl.BlockSpec(
                (1, tile, lanes),
                functools.partial(
                    lambda bb, gg, j=0: (
                        bb // split,
                        jnp.clip(
                            ((bb % split) * gsub + gg) // sub - window,
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


def _param_spec():
    """Small [r, c] parameter arrays: whole-array VMEM block, same for every
    grid cell."""
    return pl.BlockSpec(memory_space=pltpu.VMEM)


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


def _matmul(a, b):
    """f32 MXU matmul (operands are already f32 in-kernel)."""
    return lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _neighbor_kv(li_col, kv_win, iota_w):
    """One neighbor's [T, 2C] features via a one-hot MXU matmul. Shadow
    indices (== W) produce all-zero rows, matching ops/tile_gather.py."""
    oh = (li_col[:, None] == iota_w).astype(kv_win.dtype)
    prec = None if kv_win.dtype == jnp.bfloat16 else lax.Precision.HIGHEST
    return lax.dot_general(
        oh, kv_win, (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )


def _onehots(li, k0, k1, iota_w, dtype):
    """[chunk·T, W] one-hot for k-slots [k0, k1): built as PER-K [T, W]
    compares then concatenated. Concatenating the [T, 1] column slices
    first (the round-4 form) gives operands whose Mosaic lane offsets
    differ per k ({0,0}..{0,K-1}) and the remote helper rejects the concat
    with 'result/input offset mismatch on non-concat dimension' (observed
    2026-08-20 on the combined train-step module at B=1 N=65536); the
    [T, W] compares are full-width offset-{0,0} operands, which is the
    layout class every shipping kernel concat already uses."""
    ohs = [
        (li[:, kk][:, None] == iota_w).astype(dtype) for kk in range(k0, k1)
    ]
    return ohs[0] if len(ohs) == 1 else jnp.concatenate(ohs, axis=0)


def _gather_rows(li, win, tile, k, wsz, gchunk):
    """K-batched one-hot gather, VMEM-bounded: the [K·T, W] one-hot is
    materialized in chunks of `gchunk` k-slots (round 5 — the full one-hot
    at K=16, W=768 alone is ~6 MB and was the scoped-VMEM OOM driver at
    wide C). Returns ([K·T, lanes(win)] f32 rows, [K·T, 1] f32 validity —
    the one-hot row-sum: exactly 1.0 for in-window slots, 0.0 for shadow),
    k-major rows."""
    iota_w = lax.broadcasted_iota(jnp.int32, (tile, wsz), 1)
    outs, vals = [], []
    prec = None if win.dtype == jnp.bfloat16 else lax.Precision.HIGHEST
    for k0 in range(0, k, gchunk):
        oh = _onehots(li, k0, min(k0 + gchunk, k), iota_w, win.dtype)
        outs.append(
            lax.dot_general(
                oh, win, (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32,
            )
        )
        # row-sum of a one-hot is exact in any dtype (single 1, rest 0)
        vals.append(
            jnp.sum(oh, axis=1, keepdims=True).astype(jnp.float32)
        )
    rows = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    valid = vals[0] if len(vals) == 1 else jnp.concatenate(vals, axis=0)
    return rows, valid


def _scatter_rows(li, rows, tile, k, wsz, gchunk):
    """Transposed chunked one-hot: [K·T, C] row grads → [W, C] window grads
    (the backward of _gather_rows)."""
    iota_w = lax.broadcasted_iota(jnp.int32, (tile, wsz), 1)
    acc = None
    for k0 in range(0, k, gchunk):
        kc = min(k0 + gchunk, k) - k0
        oh = _onehots(li, k0, k0 + kc, iota_w, jnp.float32)
        part = lax.dot_general(
            oh, rows[k0 * tile : (k0 + kc) * tile],
            (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    return acc


def _pe1_rows(rel, a1v, c1v, tile, k):
    """[K·T, 3] first PE layer: per-k [T, 3] matmuls on the narrow rel
    slices, concatenated AFTER the matmul (matmul outputs are offset-{0,0};
    concatenating the lane-offset-shifted [T, 3] rel slices directly trips
    the same Mosaic offset-mismatch as _onehots documents)."""
    parts = [
        _matmul(rel[:, kk * 3 : kk * 3 + 3].astype(jnp.float32), a1v)
        for kk in range(k)
    ]
    return (parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
            ) + c1v


def _tower(w_pre, g1, h1, w3, b3, g2, h2, w4, b4):
    """Folded weight tower: bn1→relu→fc1→bn2→relu→fc2 with the stale-BN
    affines (g, h) baked in (models/blocks.py:84-89). Returns (w4_out [T,Cs],
    bvec [T,Cs] the bn2 input, a [T,C] the bn1 output pre-relu, r1)."""
    a = w_pre * g1 + h1
    r1 = jnp.maximum(a, 0.0)
    bvec = _matmul(r1, w3) + b3
    c_ = bvec * g2 + h2
    r2 = jnp.maximum(c_, 0.0)
    return _matmul(r2, w4) + b4, bvec, a, r1


def _pe(rel_k, a1, c1, w2, b2):
    """Folded PE tower: dense3→bn→relu→denseC (blocks.py:79-82)."""
    pe1 = _matmul(rel_k, a1) + c1
    return _matmul(jnp.maximum(pe1, 0.0), w2) + b2


def _fwd_kernel(*refs, width, tile, k, c, cs, shares, wsz, gchunk):
    (
        kv_wins, q_ref, rel_ref, li_ref,
        a1, c1, w2, b2, g1, h1, w3, b3, g2, h2, w4, b4,
        out_ref, s1_ref, s2_ref,
    ) = (
        refs[:width], refs[width], refs[width + 1], refs[width + 2],
        *refs[width + 3 : width + 15],
        refs[width + 15], refs[width + 16], refs[width + 17],
    )
    w_sz = wsz
    kv_win = jnp.concatenate([r[0] for r in kv_wins], axis=0)  # [W, 2C]
    q = q_ref[0].astype(jnp.float32)
    rel = rel_ref[0]  # [T, K*3]
    li = li_ref[0]  # [T, K]
    iota_w = lax.broadcasted_iota(jnp.int32, (tile, w_sz), 1)

    a1v, c1v = a1[:].astype(jnp.float32), c1[:].astype(jnp.float32)
    w2v, b2v = w2[:].astype(jnp.float32), b2[:].astype(jnp.float32)
    g1v, h1v = g1[:].astype(jnp.float32), h1[:].astype(jnp.float32)
    w3v, b3v = w3[:].astype(jnp.float32), b3[:].astype(jnp.float32)
    g2v, h2v = g2[:].astype(jnp.float32), h2[:].astype(jnp.float32)
    w4v, b4v = w4[:].astype(jnp.float32), b4[:].astype(jnp.float32)

    m_run = jnp.full((tile, cs), _NEG, jnp.float32)
    den = jnp.zeros((tile, cs), jnp.float32)
    num = jnp.zeros((tile, c), jnp.float32)
    s1_sum = jnp.zeros((1, c), jnp.float32)
    s1_sq = jnp.zeros((1, c), jnp.float32)
    s2_sum = jnp.zeros((1, cs), jnp.float32)
    s2_sq = jnp.zeros((1, cs), jnp.float32)

    for kk in range(k):
        kv_k = _neighbor_kv(li[:, kk], kv_win, iota_w)
        k_k, v_k = kv_k[:, :c], kv_k[:, c:]
        pe_k = _pe(rel[:, kk * 3 : kk * 3 + 3].astype(jnp.float32),
                   a1v, c1v, w2v, b2v)
        w_pre = k_k - q + pe_k
        w4_k, bvec, _, _ = _tower(
            w_pre, g1v, h1v, w3v, b3v, g2v, h2v, w4v, b4v
        )
        # batch stats for the stale-BN running updates (ALL slots contribute,
        # like the XLA path where BN sees the full [B,N,K,C] tensor)
        s1_sum = s1_sum + jnp.sum(w_pre, axis=0, keepdims=True)
        s1_sq = s1_sq + jnp.sum(w_pre * w_pre, axis=0, keepdims=True)
        s2_sum = s2_sum + jnp.sum(bvec, axis=0, keepdims=True)
        s2_sq = s2_sq + jnp.sum(bvec * bvec, axis=0, keepdims=True)
        # masked online softmax over K (shadow slots → weight 0)
        in_win = (li[:, kk] < w_sz)[:, None]
        a_val = jnp.where(in_win, w4_k, _NEG)
        m_new = jnp.maximum(m_run, a_val)
        sc = jnp.exp(m_run - m_new)
        e = jnp.where(in_win, jnp.exp(a_val - m_new), 0.0)
        den = den * sc + e
        sc_c = jnp.concatenate([sc] * shares, axis=1)
        e_c = jnp.concatenate([e] * shares, axis=1)
        num = num * sc_c + e_c * (v_k + pe_k)
        m_run = m_new

    den_c = jnp.concatenate([den] * shares, axis=1)
    out_ref[0] = (num / den_c).astype(out_ref.dtype)
    s1_ref[0] = jnp.concatenate(
        [s1_sum, s1_sq] + [jnp.zeros((6, c), jnp.float32)], axis=0
    )
    s2_ref[0] = jnp.concatenate(
        [s2_sum, s2_sq] + [jnp.zeros((6, cs), jnp.float32)], axis=0
    )


def _fwd_kernel_b(*refs, width, tile, k, c, cs, shares, wsz, gchunk):
    """K-batched forward body (round-4 redesign, PERF.md): the per-k variant
    spends its time in K separate [T, ·] ops whose [T, Cs≤64] operands use a
    few percent of the VPU lanes and whose [T, W] gather matmuls under-fill
    the MXU. Here the K loop is folded into the ROW dimension instead:

      oh [K·T, W] @ kv_win            one gather matmul (K× the rows)
      pe/tower over [K·T, C]          one tower, full-lane elementwise
      softmax over k                  static row slices, register-only

    Same math, same outputs, same Mosaic construct set as the per-k body
    (concat of full blocks, static slices, 2-D iota, f32 accumulators)."""
    (
        kv_wins, q_ref, rel_ref, li_ref,
        a1, c1, w2, b2, g1, h1, w3, b3, g2, h2, w4, b4,
        out_ref, s1_ref, s2_ref,
    ) = (
        refs[:width], refs[width], refs[width + 1], refs[width + 2],
        *refs[width + 3 : width + 15],
        refs[width + 15], refs[width + 16], refs[width + 17],
    )
    w_sz = wsz
    kv_win = jnp.concatenate([r[0] for r in kv_wins], axis=0)  # [W, 2C]
    q = q_ref[0].astype(jnp.float32)
    rel = rel_ref[0]  # [T, K*3]
    li = li_ref[0]  # [T, K]

    ps = [
        p[:].astype(jnp.float32)
        for p in (a1, c1, w2, b2, g1, h1, w3, b3, g2, h2, w4, b4)
    ]
    a1v, c1v, w2v, b2v, g1v, h1v, w3v, b3v, g2v, h2v, w4v, b4v = ps

    kv_all, valid_all = _gather_rows(
        li, kv_win, tile, k, w_sz, gchunk
    )  # [K·T, 2C], [K·T, 1]
    k_all, v_all = kv_all[:, :c], kv_all[:, c:]
    pe1_all = _pe1_rows(rel, a1v, c1v, tile, k)  # [K·T, 3]
    pe_all = _matmul(jnp.maximum(pe1_all, 0.0), w2v) + b2v  # [K·T, C]
    q_all = jnp.concatenate([q] * k, axis=0)  # [K·T, C]
    w_pre = k_all - q_all + pe_all
    w4_all, bvec_all, _, _ = _tower(
        w_pre, g1v, h1v, w3v, b3v, g2v, h2v, w4v, b4v
    )  # [K·T, Cs]

    s1_sum = jnp.sum(w_pre, axis=0, keepdims=True)
    s1_sq = jnp.sum(w_pre * w_pre, axis=0, keepdims=True)
    s2_sum = jnp.sum(bvec_all, axis=0, keepdims=True)
    s2_sq = jnp.sum(bvec_all * bvec_all, axis=0, keepdims=True)

    # masked softmax over k: all scores are materialized, so a direct
    # two-pass max/sum over static row slices (no online rescaling)
    in_all = valid_all > 0.5  # [K·T, 1] (shadow slots: all-zero one-hot row)
    a_all = jnp.where(in_all, w4_all, _NEG)  # [K·T, Cs]
    m = a_all[0:tile]
    for kk in range(1, k):
        m = jnp.maximum(m, a_all[kk * tile : (kk + 1) * tile])
    e_all = jnp.where(
        in_all, jnp.exp(w4_all - jnp.concatenate([m] * k, axis=0)), 0.0
    )
    vpe_all = v_all + pe_all
    den = jnp.zeros((tile, cs), jnp.float32)
    num = jnp.zeros((tile, c), jnp.float32)
    for kk in range(k):
        sl = slice(kk * tile, (kk + 1) * tile)
        e = e_all[sl]
        den = den + e
        num = num + jnp.concatenate([e] * shares, axis=1) * vpe_all[sl]

    out_ref[0] = (num / jnp.concatenate([den] * shares, axis=1)).astype(
        out_ref.dtype
    )
    s1_ref[0] = jnp.concatenate(
        [s1_sum, s1_sq] + [jnp.zeros((6, c), jnp.float32)], axis=0
    )
    s2_ref[0] = jnp.concatenate(
        [s2_sum, s2_sq] + [jnp.zeros((6, cs), jnp.float32)], axis=0
    )


def _impl_batched() -> bool:
    import os

    return os.environ.get("PT_ATTN_IMPL", "batched") != "perk"


def _common_inputs(q, kv, rel, li, params):
    b, m, c = q.shape
    k = li.shape[-1]
    rel2 = rel.reshape(b, m, k * 3)
    return (kv, q, rel2, li) + tuple(params), (b, m, c, k)


_VMEM_BUDGET = 9 * 2**20  # conservative share of the ~16 MB scoped VMEM


def _pick_subtile(tile, width, k, c, bwd):
    """Rows per grid cell (round 5): the batched bodies keep ~6 (fwd) / ~12
    (bwd) [K·rows, C]-class f32 live values; at wide C the full index tile
    blows scoped VMEM (the round-4 'wider-C 500' class). Halve the per-cell
    rows until the estimate fits; window blocks stay index-tile sized.
    PT_ATTN_SUBTILE overrides (A/B + regression hook)."""
    import os

    env = os.environ.get("PT_ATTN_SUBTILE", "")
    if env:
        return max(8, min(int(env), tile))
    st = tile
    live = 12 if bwd else 6
    fixed = width * tile * 2 * c * 4 * (2 if bwd else 1)  # win (+dkv) blocks
    while st > 8 and live * k * st * c * 4 + fixed + 2 * 2**20 > _VMEM_BUDGET:
        st //= 2
    return st


def _pick_gchunk(st, wsz, k):
    """k-slots per one-hot chunk so each [chunk·st, W] one-hot stays ≤2 MB."""
    return max(1, min(k, (2 * 2**20) // max(st * wsz * 4, 1)))


def _split_env(g2: int) -> int:
    from .win_topk import auto_split

    return auto_split(g2, "PT_ATTN_SPLIT")


def _fwd_call(q, kv, rel, li, params, tile, width, window, shares, interpret):
    (kv_a, q_a, rel_a, li_a, *ps), (b, m, c, k) = _common_inputs(
        q, kv, rel, li, params
    )
    g = m // tile
    cs = c // shares
    wsz = width * tile
    st = _pick_subtile(tile, width, k, c, bwd=False)
    sub = tile // st
    g2 = m // st
    split = _split_env(g2)
    gsub = g2 // split
    gchunk = _pick_gchunk(st, wsz, k)
    kern = functools.partial(
        _fwd_kernel_b if _impl_batched() else _fwd_kernel,
        width=width, tile=st, k=k, c=c, cs=cs, shares=shares,
        wsz=wsz, gchunk=gchunk,
    )
    in_specs = (
        _window_specs(width, window, g, tile, 2 * c, sub, split, gsub)
        + [_tile_spec(st, c, split, gsub), _tile_spec(st, k * 3, split, gsub),
           _tile_spec(st, k, split, gsub)]
        + [_param_spec()] * len(ps)
    )

    def flat(bb, gg):  # per-cell stat rows: flat cell index under the split
        return ((bb // split) * g2 + (bb % split) * gsub + gg, 0, 0)

    out, s1, s2 = pl.pallas_call(
        kern,
        grid=(b * split, gsub),
        in_specs=in_specs,
        out_specs=(
            _tile_spec(st, c, split, gsub),
            pl.BlockSpec((1, 8, c), flat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, cs), flat, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, c), q.dtype),
            jax.ShapeDtypeStruct((b * g2, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((b * g2, 8, cs), jnp.float32),
        ),
        interpret=interpret,
    )(*([kv_a] * width + [q_a, rel_a, li_a] + list(ps)))
    cnt = b * m * k
    stats1 = (jnp.sum(s1[:, 0], 0) / cnt, jnp.sum(s1[:, 1], 0) / cnt)
    stats2 = (jnp.sum(s2[:, 0], 0) / cnt, jnp.sum(s2[:, 1], 0) / cnt)
    return out, stats1, stats2


def pt_attn_reference(q, kv, rel, li, params, tile, width, shares):
    """Pure-JAX re-derivation of the kernel math (used by tests and as the
    interpret-mode oracle; mirrors models/blocks.py:50-101 with folded BN)."""
    from ..tile_gather import tile_window_gather

    a1, c1, w2, b2, g1, h1, w3, b3, g2, h2, w4, b4 = [
        p.astype(jnp.float32) for p in params
    ]
    b_, m, c = q.shape
    k = li.shape[-1]
    cs = c // shares
    kv_nb = tile_window_gather(kv, li, tile, width).astype(jnp.float32)
    k_nb, v_nb = kv_nb[..., :c], kv_nb[..., c:]
    pe1 = jnp.einsum("bmki,ij->bmkj", rel.astype(jnp.float32), a1) + c1[0]
    pe = jnp.einsum("bmki,ic->bmkc", jnp.maximum(pe1, 0.0), w2) + b2[0]
    w_pre = k_nb - q.astype(jnp.float32)[:, :, None, :] + pe
    s1 = (jnp.mean(w_pre, (0, 1, 2)), jnp.mean(w_pre**2, (0, 1, 2)))
    a = w_pre * g1[0] + h1[0]
    r1 = jnp.maximum(a, 0.0)
    bvec = jnp.einsum("bmkc,cd->bmkd", r1, w3) + b3[0]
    s2 = (jnp.mean(bvec, (0, 1, 2)), jnp.mean(bvec**2, (0, 1, 2)))
    c_ = bvec * g2[0] + h2[0]
    w4o = jnp.einsum("bmkd,de->bmke", jnp.maximum(c_, 0.0), w4) + b4[0]
    w_sz = tile * width
    w4o = jnp.where((li == w_sz)[..., None], -jnp.inf, w4o)
    att = jax.nn.softmax(w4o, axis=2)
    vpe = (v_nb + pe).reshape(b_, m, k, shares, cs)
    out = jnp.sum(vpe * att[:, :, :, None, :], axis=2).reshape(b_, m, c)
    return out.astype(q.dtype), s1, s2


# ---------------------------------------------------------------------------
# backward: analytic VJP, three recompute passes over the K loop per tile
# (pass A: softmax max/denominator; pass B: α, dα, the softmax-jacobian sum S
# and the v|pe att-path grads; pass C: dw4 → tower/PE/param/window grads).
# Recomputing the one-hot gathers is cheap (MXU); storing per-k activations
# at C=512, K=16 would not fit VMEM.
# ---------------------------------------------------------------------------


def _bwd_kernel(*refs, width, tile, k, c, cs, shares, window, num_tiles,
                wsz, gchunk):
    (
        kv_wins, q_ref, rel_ref, li_ref,
        a1, c1, w2, b2, g1, h1, w3, b3, g2, h2, w4, b4,
        gout_ref,
        dkv_ref, dq_ref, dp_ref,
    ) = (
        refs[:width], refs[width], refs[width + 1], refs[width + 2],
        *refs[width + 3 : width + 15],
        refs[width + 15],
        refs[width + 16], refs[width + 17], refs[width + 18],
    )
    w_sz = wsz
    kv_win = jnp.concatenate([r[0] for r in kv_wins], axis=0)
    q = q_ref[0].astype(jnp.float32)
    rel = rel_ref[0]
    li = li_ref[0]
    gout = gout_ref[0].astype(jnp.float32)  # [T, C]
    iota_w = lax.broadcasted_iota(jnp.int32, (tile, w_sz), 1)

    a1v, c1v = a1[:].astype(jnp.float32), c1[:].astype(jnp.float32)
    w2v, b2v = w2[:].astype(jnp.float32), b2[:].astype(jnp.float32)
    g1v, h1v = g1[:].astype(jnp.float32), h1[:].astype(jnp.float32)
    w3v, b3v = w3[:].astype(jnp.float32), b3[:].astype(jnp.float32)
    g2v, h2v = g2[:].astype(jnp.float32), h2[:].astype(jnp.float32)
    w4v, b4v = w4[:].astype(jnp.float32), b4[:].astype(jnp.float32)

    def gather_k(kk):
        kv_k = _neighbor_kv(li[:, kk], kv_win, iota_w)
        pe_k = _pe(rel[:, kk * 3 : kk * 3 + 3].astype(jnp.float32),
                   a1v, c1v, w2v, b2v)
        return kv_k[:, :c], kv_k[:, c:], pe_k

    def w4_of(kk, k_k, pe_k):
        w_pre = k_k - q + pe_k
        return _tower(w_pre, g1v, h1v, w3v, b3v, g2v, h2v, w4v, b4v), w_pre

    # ---- pass A: final softmax max + denominator ----
    m_run = jnp.full((tile, cs), _NEG, jnp.float32)
    den = jnp.zeros((tile, cs), jnp.float32)
    for kk in range(k):
        k_k, _, pe_k = gather_k(kk)
        (w4_k, _, _, _), _ = w4_of(kk, k_k, pe_k)
        in_win = (li[:, kk] < w_sz)[:, None]
        a_val = jnp.where(in_win, w4_k, _NEG)
        m_new = jnp.maximum(m_run, a_val)
        den = den * jnp.exp(m_run - m_new) + jnp.where(
            in_win, jnp.exp(a_val - m_new), 0.0
        )
        m_run = m_new

    # ---- pass B: att-path grads + softmax-jacobian sum S ----
    # α_k = e_k/den; out = Σ α ⊙_s vpe; dvpe = α_tiled ⊙ gout;
    # dα_k[t, j] = Σ_{c in group j} gout·vpe; S = Σ_k α_k dα_k
    S = jnp.zeros((tile, cs), jnp.float32)
    acc_dkv = jnp.zeros((w_sz, 2 * c), jnp.float32)
    dW2 = jnp.zeros((3, c), jnp.float32)
    db2 = jnp.zeros((1, c), jnp.float32)
    dA1 = jnp.zeros((3, 3), jnp.float32)
    dc1 = jnp.zeros((1, 3), jnp.float32)

    def pe_bwd(kk, dpe, dW2, db2, dA1, dc1):
        """Accumulate PE-tower param grads from a [T, C] dpe (no drel)."""
        rel_k = rel[:, kk * 3 : kk * 3 + 3].astype(jnp.float32)
        pe1 = _matmul(rel_k, a1v) + c1v
        r = jnp.maximum(pe1, 0.0)
        dW2 = dW2 + lax.dot_general(
            r, dpe, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db2 = db2 + jnp.sum(dpe, axis=0, keepdims=True)
        dr = lax.dot_general(
            dpe, w2v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (pe1 > 0)
        dA1 = dA1 + lax.dot_general(
            rel_k, dr, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dc1 = dc1 + jnp.sum(dr, axis=0, keepdims=True)
        return dW2, db2, dA1, dc1

    for kk in range(k):
        k_k, v_k, pe_k = gather_k(kk)
        (w4_k, _, _, _), _ = w4_of(kk, k_k, pe_k)
        in_win = (li[:, kk] < w_sz)[:, None]
        alpha = jnp.where(
            in_win, jnp.exp(w4_k - m_run), 0.0
        ) / den  # [T, Cs]
        vpe = v_k + pe_k
        gv = gout * vpe  # [T, C]
        # group-sum over the `shares` repeats: channel si*Cs+gi → group gi
        dalpha = gv[:, :cs]
        for si in range(1, shares):
            dalpha = dalpha + gv[:, si * cs : (si + 1) * cs]
        S = S + alpha * dalpha
        # dvpe = α tiled ⊙ gout → dv (scatter) and dpe (param accumulation)
        alpha_c = jnp.concatenate([alpha] * shares, axis=1)
        dvpe = alpha_c * gout
        oh = (li[:, kk][:, None] == iota_w).astype(jnp.float32)
        pad = jnp.zeros((tile, c), jnp.float32)
        acc_dkv = acc_dkv + lax.dot_general(
            oh, jnp.concatenate([pad, dvpe], axis=1),
            (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        dW2, db2, dA1, dc1 = pe_bwd(kk, dvpe, dW2, db2, dA1, dc1)

    # ---- pass C: dw4 → tower backward → dk/dq/param grads ----
    dq_acc = jnp.zeros((tile, c), jnp.float32)
    dg1 = jnp.zeros((1, c), jnp.float32)
    dh1 = jnp.zeros((1, c), jnp.float32)
    dW3 = jnp.zeros((c, cs), jnp.float32)
    db3 = jnp.zeros((1, cs), jnp.float32)
    dg2 = jnp.zeros((1, cs), jnp.float32)
    dh2 = jnp.zeros((1, cs), jnp.float32)
    dW4 = jnp.zeros((cs, cs), jnp.float32)
    db4 = jnp.zeros((1, cs), jnp.float32)
    for kk in range(k):
        k_k, v_k, pe_k = gather_k(kk)
        (w4_k, bvec, a_pre, r1), w_pre = w4_of(kk, k_k, pe_k)
        in_win = (li[:, kk] < w_sz)[:, None]
        alpha = jnp.where(in_win, jnp.exp(w4_k - m_run), 0.0) / den
        vpe = v_k + pe_k
        gv = gout * vpe
        dalpha = gv[:, :cs]
        for si in range(1, shares):
            dalpha = dalpha + gv[:, si * cs : (si + 1) * cs]
        dw4 = alpha * (dalpha - S)  # [T, Cs]
        # tower backward (folded affines; see _tower)
        c_ = bvec * g2v + h2v
        r2 = jnp.maximum(c_, 0.0)
        dW4 = dW4 + lax.dot_general(
            r2, dw4, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db4 = db4 + jnp.sum(dw4, axis=0, keepdims=True)
        dr2 = lax.dot_general(
            dw4, w4v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dc_ = dr2 * (c_ > 0)
        dg2 = dg2 + jnp.sum(dc_ * bvec, axis=0, keepdims=True)
        dh2 = dh2 + jnp.sum(dc_, axis=0, keepdims=True)
        dbv = dc_ * g2v
        dW3 = dW3 + lax.dot_general(
            r1, dbv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db3 = db3 + jnp.sum(dbv, axis=0, keepdims=True)
        dr1 = lax.dot_general(
            dbv, w3v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        da = dr1 * (a_pre > 0)
        dg1 = dg1 + jnp.sum(da * w_pre, axis=0, keepdims=True)
        dh1 = dh1 + jnp.sum(da, axis=0, keepdims=True)
        dwpre = da * g1v  # [T, C]
        dq_acc = dq_acc - dwpre
        oh = (li[:, kk][:, None] == iota_w).astype(jnp.float32)
        pad = jnp.zeros((tile, c), jnp.float32)
        acc_dkv = acc_dkv + lax.dot_general(
            oh, jnp.concatenate([dwpre, pad], axis=1),
            (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        dW2, db2, dA1, dc1 = pe_bwd(kk, dwpre, dW2, db2, dA1, dc1)

    # ---- stores (per-slot 2-D values — the cbl_tile2-proven pattern) ----
    it = wsz // width  # index-tile rows (= tile unless sub-tiled)
    for j in range(width):
        dkv_ref[0, 0, j] = acc_dkv[j * it : (j + 1) * it]
    dq_ref[0] = dq_acc
    # param grads, packed into one [rows, c] f32 block (c >= cs >= 3):
    # rows: dA1(3) dc1(1) dW2(3) db2(1) dg1(1) dh1(1) dW3(c) db3(1) dg2(1)
    #       dh2(1) dW4(cs) db4(1)
    def padc(x):
        r, cc = x.shape
        return x if cc == c else jnp.concatenate(
            [x, jnp.zeros((r, c - cc), jnp.float32)], axis=1
        )

    dp_ref[0] = jnp.concatenate(
        [padc(dA1), padc(dc1), dW2, db2, padc(dg1), padc(dh1),
         padc(dW3), padc(db3), padc(dg2), padc(dh2), padc(dW4), padc(db4)],
        axis=0,
    )


def _bwd_kernel_b(*refs, width, tile, k, c, cs, shares, window, num_tiles,
                  wsz, gchunk):
    """K-batched backward body (see _fwd_kernel_b). Everything the per-k
    variant recomputed three times per k is materialized once over [K·T, ·]
    rows; every param-grad accumulation is a single row-contracted matmul,
    and the dkv window scatter is ONE ohᵀ @ [dwpre|dvpe] matmul instead of
    2K one-hot scatters. Outputs bit-match the per-k packing."""
    (
        kv_wins, q_ref, rel_ref, li_ref,
        a1, c1, w2, b2, g1, h1, w3, b3, g2, h2, w4, b4,
        gout_ref,
        dkv_ref, dq_ref, dp_ref,
    ) = (
        refs[:width], refs[width], refs[width + 1], refs[width + 2],
        *refs[width + 3 : width + 15],
        refs[width + 15],
        refs[width + 16], refs[width + 17], refs[width + 18],
    )
    w_sz = wsz
    kv_win = jnp.concatenate([r[0] for r in kv_wins], axis=0)
    q = q_ref[0].astype(jnp.float32)
    rel = rel_ref[0]
    li = li_ref[0]
    gout = gout_ref[0].astype(jnp.float32)  # [T, C]

    ps = [
        p[:].astype(jnp.float32)
        for p in (a1, c1, w2, b2, g1, h1, w3, b3, g2, h2, w4, b4)
    ]
    a1v, c1v, w2v, b2v, g1v, h1v, w3v, b3v, g2v, h2v, w4v, b4v = ps

    # ---- batched forward recompute ----
    kv_all, valid_all = _gather_rows(
        li, kv_win, tile, k, w_sz, gchunk
    )  # [K·T, 2C], [K·T, 1]
    k_all, v_all = kv_all[:, :c], kv_all[:, c:]
    pe1_all = _pe1_rows(rel, a1v, c1v, tile, k)  # [K·T, 3]
    r_pe = jnp.maximum(pe1_all, 0.0)
    pe_all = _matmul(r_pe, w2v) + b2v  # [K·T, C]
    q_all = jnp.concatenate([q] * k, axis=0)
    w_pre = k_all - q_all + pe_all
    a_pre = w_pre * g1v + h1v
    r1 = jnp.maximum(a_pre, 0.0)
    bvec = _matmul(r1, w3v) + b3v
    c_ = bvec * g2v + h2v
    r2 = jnp.maximum(c_, 0.0)
    w4_all = _matmul(r2, w4v) + b4v  # [K·T, Cs]

    in_all = valid_all > 0.5  # [K·T, 1] (shadow slots: all-zero one-hot row)
    a_all = jnp.where(in_all, w4_all, _NEG)
    m = a_all[0:tile]
    for kk in range(1, k):
        m = jnp.maximum(m, a_all[kk * tile : (kk + 1) * tile])
    den = jnp.zeros((tile, cs), jnp.float32)
    m_all = jnp.concatenate([m] * k, axis=0)
    e_all = jnp.where(in_all, jnp.exp(w4_all - m_all), 0.0)
    for kk in range(k):
        den = den + e_all[kk * tile : (kk + 1) * tile]
    alpha_all = e_all / jnp.concatenate([den] * k, axis=0)  # [K·T, Cs]

    # ---- attention-path grads ----
    gout_all = jnp.concatenate([gout] * k, axis=0)  # [K·T, C]
    vpe_all = v_all + pe_all
    gv_all = gout_all * vpe_all
    dalpha = gv_all[:, :cs]
    for si in range(1, shares):
        dalpha = dalpha + gv_all[:, si * cs : (si + 1) * cs]
    ad = alpha_all * dalpha
    S = ad[0:tile]
    for kk in range(1, k):
        S = S + ad[kk * tile : (kk + 1) * tile]
    dw4 = alpha_all * (dalpha - jnp.concatenate([S] * k, axis=0))
    dvpe = jnp.concatenate([alpha_all] * shares, axis=1) * gout_all

    # ---- tower backward (one contraction per parameter) ----
    def rowdot(x, y):
        return lax.dot_general(
            x, y, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def coldot(x, w):
        return lax.dot_general(
            x, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dW4 = rowdot(r2, dw4)
    db4 = jnp.sum(dw4, axis=0, keepdims=True)
    dc_ = coldot(dw4, w4v) * (c_ > 0)
    dg2 = jnp.sum(dc_ * bvec, axis=0, keepdims=True)
    dh2 = jnp.sum(dc_, axis=0, keepdims=True)
    dbv = dc_ * g2v
    dW3 = rowdot(r1, dbv)
    db3 = jnp.sum(dbv, axis=0, keepdims=True)
    da = coldot(dbv, w3v) * (a_pre > 0)
    dg1 = jnp.sum(da * w_pre, axis=0, keepdims=True)
    dh1 = jnp.sum(da, axis=0, keepdims=True)
    dwpre = da * g1v  # [K·T, C]
    dq_sum = dwpre[0:tile]
    for kk in range(1, k):
        dq_sum = dq_sum + dwpre[kk * tile : (kk + 1) * tile]

    # ---- dkv window scatter: transposed one-hot matmuls (chunked) ----
    acc_dkv = _scatter_rows(
        li, jnp.concatenate([dwpre, dvpe], axis=1), tile, k, w_sz, gchunk
    )  # [W, 2C]

    # ---- PE param grads (both pe consumers: w_pre and vpe) ----
    dpe = dwpre + dvpe
    dW2 = rowdot(r_pe, dpe)
    db2 = jnp.sum(dpe, axis=0, keepdims=True)
    dr_pe = coldot(dpe, w2v) * (pe1_all > 0)
    # dA1 = rel_allᵀ @ dr_pe, summed per k over the narrow rel slices (the
    # concatenated [K·T, 3] rel_all would need the offset-shifted concat
    # _pe1_rows documents; per-k matmul operands relayout fine)
    dA1 = jnp.zeros((3, 3), jnp.float32)
    for kk in range(k):
        dA1 = dA1 + rowdot(
            rel[:, kk * 3 : kk * 3 + 3].astype(jnp.float32),
            dr_pe[kk * tile : (kk + 1) * tile],
        )
    dc1 = jnp.sum(dr_pe, axis=0, keepdims=True)

    it = wsz // width  # index-tile rows (= tile unless sub-tiled)
    for j in range(width):
        dkv_ref[0, 0, j] = acc_dkv[j * it : (j + 1) * it]
    dq_ref[0] = -dq_sum

    def padc(x):
        r, cc = x.shape
        return x if cc == c else jnp.concatenate(
            [x, jnp.zeros((r, c - cc), jnp.float32)], axis=1
        )

    dp_ref[0] = jnp.concatenate(
        [padc(dA1), padc(dc1), dW2, db2, padc(dg1), padc(dh1),
         padc(dW3), padc(db3), padc(dg2), padc(dh2), padc(dW4), padc(db4)],
        axis=0,
    )


def _bwd_call(q, kv, rel, li, params, g_out, tile, width, window, shares,
              interpret):
    (kv_a, q_a, rel_a, li_a, *ps), (b, m, c, k) = _common_inputs(
        q, kv, rel, li, params
    )
    g = m // tile
    cs = c // shares
    wsz = width * tile
    st = _pick_subtile(tile, width, k, c, bwd=True)
    sub = tile // st
    g2 = m // st
    split = _split_env(g2)
    gsub = g2 // split
    gchunk = _pick_gchunk(st, wsz, k)
    kern = functools.partial(
        _bwd_kernel_b if _impl_batched() else _bwd_kernel,
        width=width, tile=st, k=k, c=c, cs=cs, shares=shares,
        window=window, num_tiles=g, wsz=wsz, gchunk=gchunk,
    )
    in_specs = (
        _window_specs(width, window, g, tile, 2 * c, sub, split, gsub)
        + [_tile_spec(st, c, split, gsub), _tile_spec(st, k * 3, split, gsub),
           _tile_spec(st, k, split, gsub)]
        + [_param_spec()] * len(ps)
        + [_tile_spec(st, c, split, gsub)]  # g_out
    )
    prows = 3 + 1 + 3 + 1 + 1 + 1 + c + 1 + 1 + 1 + cs + 1

    def flat(bb, gg):
        return ((bb // split) * g2 + (bb % split) * gsub + gg, 0, 0)

    dkv_win, dq, dp = pl.pallas_call(
        kern,
        grid=(b * split, gsub),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, 1, width, tile, 2 * c),
                lambda bb, gg: (
                    bb // split, (bb % split) * gsub + gg, 0, 0, 0
                ),
                memory_space=pltpu.VMEM,
            ),
            _tile_spec(st, c, split, gsub),
            pl.BlockSpec((1, prows, c), flat, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, g2, width, tile, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((b, m, c), jnp.float32),
            jax.ShapeDtypeStruct((b * g2, prows, c), jnp.float32),
        ),
        interpret=interpret,
    )(*([kv_a] * width + [q_a, rel_a, li_a] + list(ps) + [g_out]))

    # overlap-add the per-slot window grads back onto rows (cbl_tile2
    # pattern); with sub-tiling several grid cells target the same index
    # tile — .at[].add sums duplicates by scatter-add semantics
    starts = np.clip(np.arange(g2) // sub - window, 0, g - width)
    dkv = jnp.zeros((b, g, tile, 2 * c), jnp.float32)
    for j in range(width):
        dkv = dkv.at[:, starts + j].add(dkv_win[:, :, j])
    dkv = dkv.reshape(b, m, 2 * c).astype(kv.dtype)

    # unpack the packed per-(b,g) param-grad block and reduce over tiles
    dpsum = jnp.sum(dp, axis=0)  # [prows, c]
    r = 0

    def take(rows, cols):
        nonlocal r
        out = dpsum[r : r + rows, :cols]
        r += rows
        return out

    dA1 = take(3, 3)
    dc1 = take(1, 3)
    dW2 = take(3, c)
    db2 = take(1, c)
    dg1 = take(1, c)
    dh1 = take(1, c)
    dW3 = take(c, cs)
    db3 = take(1, cs)
    dg2 = take(1, cs)
    dh2 = take(1, cs)
    dW4 = take(cs, cs)
    db4 = take(1, cs)
    dparams = (dA1, dc1, dW2, db2, dg1, dh1, dW3, db3, dg2, dh2, dW4, db4)
    dparams = tuple(
        dp_.astype(p.dtype) for dp_, p in zip(dparams, params)
    )
    return dq.astype(q.dtype), dkv, dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def pt_attn(q, kv, rel, li, tile, width, window, shares, interpret, *params):
    """Fused PointTransformerLayer attention (see module docstring).

    q [B,M,C], kv [B,M,2C] (linear_k|linear_v concat), rel [B,M,K,3],
    li [B,M,K] window-relative (shadow = width·tile); params = the 12 folded
    tower arrays (A1 [3,3], c1 [1,3], W2 [3,C], b2 [1,C], g1/h1 [1,C],
    W3 [C,Cs], b3/g2/h2 [1,Cs], W4 [Cs,Cs], b4 [1,Cs]).
    Returns (out [B,M,C], (Σw̄_pre, Σw̄²_pre) [C], (Σb̄, Σb̄²) [Cs]) — the
    batch-stat MEANS for the two stale-BN running updates. Stats carry no
    gradient (they feed stop-gradient variable updates)."""
    return _fwd_call(q, kv, rel, li, params, tile, width, window, shares,
                     interpret)


def _vjp_fwd(q, kv, rel, li, tile, width, window, shares, interpret, *params):
    out = _fwd_call(q, kv, rel, li, params, tile, width, window, shares,
                    interpret)
    return out, (q, kv, rel, li, params)


def _vjp_bwd(tile, width, window, shares, interpret, res, g):
    q, kv, rel, li, params = res
    g_out, _g_s1, _g_s2 = g  # stats feed non-differentiated stat updates
    dq, dkv, dparams = _bwd_call(
        q, kv, rel, li, params, g_out.astype(jnp.float32),
        tile, width, window, shares, interpret,
    )
    return (dq, dkv, None, None) + dparams


pt_attn.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# dispatch: probe-compile once per shape on TPU, fall back to the XLA path
# (models/blocks.py) — same pattern as ops/tile_gather.py::_pallas_ok.
# PT_ATTN=auto (default) | on (raise on probe failure) | off.
# ---------------------------------------------------------------------------
_PROBED: dict = {}


def pt_attn_ok(tile: int, width: int, k: int, c: int, shares: int,
               dtype, n: int = 0) -> bool:
    import os
    import warnings

    mode = os.environ.get("PT_ATTN", "auto")
    if mode == "off":
        return False
    # optional level allowlist by channel width, e.g. PT_ATTN_C="32,64":
    # lets deployment (and the A/B harness) enable the kernel only at levels
    # whose compiled form this toolchain's Mosaic helper accepts
    allow_c = os.environ.get("PT_ATTN_C", "")
    if allow_c and str(c) not in allow_c.split(","):
        return False
    if mode == "interpret":  # test hook: dispatch with interpret=True
        return True
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    key = (tile, width, k, c, shares, jnp.dtype(dtype).name,
           _impl_batched(),
           _pick_subtile(tile, width, k, c, bwd=True), n,
           os.environ.get("PT_ATTN_SPLIT", "auto"))
    if key in _PROBED:
        return _PROBED[key]

    # raise the scoped-VMEM limit if the backend isn't up yet (no-op after
    # init — and then the probe measures the real env, which is the point)
    from ...utils.cache import setup_tpu_flags

    setup_tpu_flags()

    cs = c // shares
    # probe at the REAL level geometry when the caller passes its row count
    # (round-4/5 lesson, same as cbl_dense: a reduced grid has constant
    # (hoistable) window index maps and different pipelining — it passed
    # where the real grid failed). Fallback: g > width so index maps vary.
    g = n // tile if n else width + 2
    g = max(g, width)
    m = g * tile
    rng = np.random.RandomState(0)

    def arr(shape, dt=jnp.float32):
        return jnp.asarray(rng.randn(*shape).astype(np.float32), dt)

    params = _probe_params(c, cs)
    q = arr((1, m, c), dtype)
    kv = arr((1, m, 2 * c), dtype)
    rel = arr((1, m, k, 3))
    li = jnp.zeros((1, m, k), jnp.int32)

    def attempt():
        out, _, _ = pt_attn(q, kv, rel, li, tile, width, (width - 1) // 2,
                            shares, False, *params)
        jax.block_until_ready(out)
        gr = jax.grad(
            lambda qq: jnp.sum(
                pt_attn(qq, kv, rel, li, tile, width, (width - 1) // 2,
                        shares, False, *params)[0].astype(jnp.float32)
            )
        )(q)
        jax.block_until_ready(gr)

    ok, err = False, None
    for _ in range(2):  # the remote Mosaic helper is intermittently flaky
        try:
            attempt()
            ok = True
            break
        except Exception as e:
            err = e
    if not ok:
        if mode == "on":
            raise RuntimeError(
                f"PT_ATTN=on but the fused attention kernel failed to "
                f"compile for shape {key}: {err}"
            )
        warnings.warn(
            f"fused attention kernel unavailable for {key} "
            f"({type(err).__name__}); using the XLA path"
        )
    _PROBED[key] = ok
    return ok


def _probe_params(c, cs):
    rng = np.random.RandomState(1)

    def arr(shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.1)

    return (
        arr((3, 3)), arr((1, 3)), arr((3, c)), arr((1, c)),
        arr((1, c)) + 1.0, arr((1, c)),
        arr((c, cs)), arr((1, cs)), arr((1, cs)) + 1.0, arr((1, cs)),
        arr((cs, cs)), arr((1, cs)),
    )
