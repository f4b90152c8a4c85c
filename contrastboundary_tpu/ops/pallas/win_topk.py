"""Fused window top-k — the Morton-tile KNN extraction in one VMEM pass.

Why (round-4 profile, PERF.md): the L0 contrast search (k=36, W=768) is the
single biggest op in the train step at ~20 ms — the lax.map + lax.top_k tile
loop pays a 768-wide sort per tile, and the batched iterative-argmax
alternative is HBM-bound (each of the k argmax passes re-reads the full
[B,G,T,W] distance tensor from HBM: ~200 MB × k). This kernel computes the
[T, W] distance tile ONCE in VMEM (MXU matmul) and runs all k
(max, first-argmax, mask) passes on it in-register — VPU-bound, ~6× less
HBM traffic than one XLA argmax pass.

Results are EXACT and bit-identical to ops/knn.py::_iter_topk / lax.top_k
(first-index tie-breaking): per pass, the winner is the minimum lane index
among maxima (max + iota-min — the first-argmax construct the round-3 Mosaic
bisection proved compiles on this toolchain; plain lane argmax does not).

Modes mirror ops/knn.py::tile_self_knn:
  plain         top-k of the window (the merged self+contrast search)
  exclude_self  the query's own window position is masked to +inf first
  ensure_self   slot 0 overwritten with (self_pos, 0.0) after the search

Equivalent reference work: the nanoflann KDTree searches
(tensorflow/ops/cpp_wrappers/cloud/cloud.h) and the CUDA heap KNN
(pytorch/lib/pointops/src/knnquery/knnquery_cuda_kernel.cu).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _self_start(gg, window, g, width):
    return jnp.clip(gg - window, 0, g - width)


def _cross_start(gg, window, gq, gs, width):
    center = (gg * gs) // gq
    return jnp.clip(center - window, 0, gs - width)


def auto_split(g: int, env: str) -> int:
    """Grid split for long single-batch tile runs (round 5, VERDICT item 4):
    grid (b, g) becomes (b·s, g/s) with cell (bb, gg) owning batch bb//s and
    tile (bb%s)·(g/s)+gg — bit-exact, purely a re-partition of the same
    cells. Why: the remote Mosaic helper deterministically 500s kernels
    whose minor grid dim reaches 256 (the preset shape B=1×65536, gq=256)
    while the SAME per-cell program at (4, 64) compiles and wins; splitting
    reproduces the winning geometry. Auto halves the minor dim to ≤64
    (doubling s while it divides g); `env` (e.g. WIN_TOPK_SPLIT) overrides,
    0/1 = off."""
    import os

    val = os.environ.get(env, "auto")
    if val not in ("", "auto"):
        s = int(val)
        return s if s >= 1 and g % s == 0 else 1
    s = 1
    while g // s > 64 and g % (s * 2) == 0:
        s *= 2
    return s


def _split_ids(split):
    """Index-map helpers under a grid split: (batch, flat tile) of (bb, gg)
    on grid (b·split, g//split)."""
    def batch(bb):
        return bb // split

    def tile_of(bb, gg, gsub):
        return (bb % split) * gsub + gg

    return batch, tile_of


def _window_specs(width, tile, start_of, split, gsub):
    """One [1, T, 3] support block per window slot j at tile start_of(t)+j
    for t the flat query-tile index (the clipped-window pattern proven in
    cbl_tile2/pt_attn, grid-split aware)."""
    batch, tile_of = _split_ids(split)
    return [
        pl.BlockSpec(
            (1, tile, 3),
            functools.partial(
                lambda bb, gg, j=0: (
                    batch(bb), start_of(tile_of(bb, gg, gsub)) + j, 0
                ),
                j=j,
            ),
            memory_space=pltpu.VMEM,
        )
        for j in range(width)
    ]


def _topk_kernel(*refs, tile, width, k, mode, window, g, split):
    q_ref = refs[0]
    win_refs = refs[1 : 1 + width]
    idx_ref, val_ref = refs[1 + width], refs[2 + width]
    w_sz = width * tile

    q = q_ref[0].astype(jnp.float32)  # [T, 3]
    win = jnp.concatenate([r[0] for r in win_refs], axis=0).astype(
        jnp.float32
    )  # [W, 3]
    qn = jnp.sum(q * q, axis=-1, keepdims=True)  # [T, 1]
    sn = jnp.sum(win * win, axis=-1)  # [W]
    qs = lax.dot_general(
        q, win, (((1,), (1,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [T, W]
    d2 = jnp.maximum(qn + sn[None, :] - 2.0 * qs, 0.0)
    neg = -d2

    iota = lax.broadcasted_iota(jnp.int32, (tile, w_sz), 1)
    if mode in ("exclude_self", "ensure_self"):
        gg = (pl.program_id(0) % split) * (g // split) + pl.program_id(1)
        start = _self_start(gg, window, g, width)
        row = lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        self_pos = (gg - start) * tile + row  # [T, 1] window-relative
        if mode == "exclude_self":
            neg = jnp.where(iota == self_pos, -jnp.inf, neg)

    vals, idxs = [], []
    for kk in range(k):
        v = jnp.max(neg, axis=-1, keepdims=True)  # [T, 1]
        # first-argmax = min lane index among maxima (max + iota-min)
        i = jnp.min(
            jnp.where(neg == v, iota, w_sz), axis=-1, keepdims=True
        )
        vals.append(v)
        idxs.append(i)
        if kk + 1 < k:
            neg = jnp.where(iota == i, -jnp.inf, neg)

    vi = jnp.concatenate(vals, axis=1)  # [T, k]
    ii = jnp.concatenate(idxs, axis=1)
    if mode == "ensure_self":
        col = lax.broadcasted_iota(jnp.int32, (tile, k), 1)
        ii = jnp.where(col == 0, self_pos, ii)
        vi = jnp.where(col == 0, 0.0, vi)
    idx_ref[0] = ii
    val_ref[0] = vi


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile", "width", "window", "mode", "gs",
                     "interpret", "split"),
)
def window_topk(
    query: jax.Array,
    support: jax.Array,
    k: int,
    *,
    tile: int,
    width: int,
    window: int,
    mode: str = "plain",
    gs: int | None = None,
    interpret: bool = False,
    split: int = 1,
):
    """Per-tile window top-k (smallest squared distances first).

    query [B, M, 3], support [B, N, 3], both Morton-sorted on the same curve.
    Query tile g scores the support window starting at tile
    clip(g − window, 0, gs − width) (self geometry, M == N) or
    clip((g·gs)//gq − window, 0, gs − width) (cross geometry, pass gs).
    Returns (local_idx [B, M, k] int32 in [0, width·tile), neg_d2 [B, M, k]
    f32 descending) — identical contract to the batched-iter path in
    ops/knn.py (callers map −inf slots to shadows and add window starts for
    global indices).
    """
    b, m, _ = query.shape
    gq = m // tile
    cross = gs is not None
    gsup = support.shape[1] // tile
    if cross:
        start_of = functools.partial(
            _cross_start, window=window, gq=gq, gs=gsup, width=width
        )
        mode_k = "plain"
    else:
        start_of = functools.partial(
            _self_start, window=window, g=gq, width=width
        )
        mode_k = mode
    assert gq % split == 0, (gq, split)
    gsub = gq // split
    batch, tile_of = _split_ids(split)
    kern = functools.partial(
        _topk_kernel, tile=tile, width=width, k=k, mode=mode_k,
        window=window, g=gq, split=split,
    )
    q_spec = pl.BlockSpec(
        (1, tile, 3),
        lambda bb, gg: (batch(bb), tile_of(bb, gg, gsub), 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = lambda lanes: pl.BlockSpec(
        (1, tile, lanes),
        lambda bb, gg: (batch(bb), tile_of(bb, gg, gsub), 0),
        memory_space=pltpu.VMEM,
    )
    idx, val = pl.pallas_call(
        kern,
        grid=(b * split, gsub),
        in_specs=[q_spec] + _window_specs(width, tile, start_of, split, gsub),
        out_specs=(out_spec(k), out_spec(k)),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, k), jnp.int32),
            jax.ShapeDtypeStruct((b, m, k), jnp.float32),
        ),
        interpret=interpret,
    )(query, *([support] * width))
    return idx, val


# ---------------------------------------------------------------------------
# dispatch: probe-compile once per shape on TPU, fall back to the XLA paths.
# WIN_TOPK=auto (default) | on (raise on probe failure) | off | interpret.
# ---------------------------------------------------------------------------
_PROBED: dict = {}


def window_topk_ok(tile: int, width: int, k: int, mode: str,
                   window: int, gq: int, gs: int | None) -> bool:
    """Probe-compile the kernel at the REAL grid geometry (gq query tiles,
    gs support tiles, the real window) before dispatching. A reduced-grid
    probe is not a trustworthy gate: the index-map constants and grid are
    baked into the Mosaic kernel, and a g=width+2 probe compiled fine at a
    shape whose real 256-tile grid the compile helper then 500'd on
    (round 4, B=1 N=65536)."""
    import os
    import warnings

    env = os.environ.get("WIN_TOPK", "auto")
    if env == "off":
        return False
    if env == "interpret":
        return True
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    # lane-register shapes: T multiple of 8 sublanes, W multiple of 128 lanes
    if tile % 8 or (width * tile) % 128:
        return False
    # bisection gates: WIN_TOPK_KEYS (comma list of t<tile>w<width>k<k>
    # tokens — only those keys dispatch) and WIN_TOPK_CROSS=off/SELF=off
    keys_env = os.environ.get("WIN_TOPK_KEYS", "")
    if keys_env and f"t{tile}w{width}k{k}" not in keys_env.split(","):
        return False
    if gs is not None and os.environ.get("WIN_TOPK_CROSS", "") == "off":
        return False
    if gs is None and os.environ.get("WIN_TOPK_SELF", "") == "off":
        return False
    split = auto_split(gq, "WIN_TOPK_SPLIT")
    key = (tile, width, k, mode, window, gq, gs, split)
    if key in _PROBED:
        return _PROBED[key]

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(1, gq * tile, 3).astype(np.float32))
    sup = (
        jnp.asarray(rng.rand(1, gs * tile, 3).astype(np.float32))
        if gs is not None else pts
    )

    ok, err = False, None
    for _ in range(2):  # the remote Mosaic helper is intermittently flaky
        try:
            idx, val = window_topk(
                pts, sup, k, tile=tile, width=width, window=window,
                mode=mode, gs=gs, split=split,
            )
            jax.block_until_ready((idx, val))
            ok = True
            break
        except Exception as e:  # noqa: BLE001 — any compile failure → fallback
            err = e
    if not ok:
        if env == "on":
            raise RuntimeError(
                f"WIN_TOPK=on but the window top-k kernel failed to compile "
                f"for {key}: {err}"
            )
        warnings.warn(
            f"window top-k kernel unavailable for {key} "
            f"({type(err).__name__}); using the XLA path"
        )
    _PROBED[key] = ok
    return ok
