"""Fused window top-k kernel (ops/pallas/win_topk.py) — interpret-mode
bit-equality against the batched iterative-argmax XLA path it replaces.
The kernel must be EXACT (first-index ties), or the pyramid regression
tests that pin tile_self_knn against the map+top_k path would drift."""
import numpy as np
import pytest

import jax.numpy as jnp

from contrastboundary_tpu.ops.knn import tile_cross_knn, tile_self_knn
from contrastboundary_tpu.ops.pallas.win_topk import window_topk


@pytest.fixture()
def pts(rng):
    p = rng.rand(2, 64, 3).astype(np.float32)
    # Morton-sort per cloud so window locality resembles production
    from contrastboundary_tpu.core.gather import batch_gather
    from contrastboundary_tpu.ops.sampling import serialized_order

    pj = jnp.asarray(p)
    return np.asarray(batch_gather(pj, serialized_order(pj)))


def _np_window_topk(pts, tile, window, k, mode):
    """Numpy oracle: per-tile window search, first-index ties."""
    b, m, _ = pts.shape
    g = m // tile
    width = min(2 * window + 1, g)
    w_sz = width * tile
    starts = np.clip(np.arange(g) - window, 0, g - width)
    idx = np.zeros((b, m, k), np.int32)
    val = np.zeros((b, m, k), np.float32)
    for bb in range(b):
        for gg in range(g):
            s0 = starts[gg] * tile
            win = pts[bb, s0 : s0 + w_sz]
            q = pts[bb, gg * tile : (gg + 1) * tile]
            d2 = ((q[:, None] - win[None]) ** 2).sum(-1)
            for t in range(tile):
                row = -d2[t].astype(np.float64)
                self_pos = gg * tile + t - s0
                if mode == "exclude_self":
                    row[self_pos] = -np.inf
                order = []
                r = row.copy()
                for _ in range(k):
                    i = int(np.argmax(r))
                    order.append(i)
                    r[i] = -np.inf
                q_i = gg * tile + t
                idx[bb, q_i] = order
                val[bb, q_i] = row[order]
                if mode == "ensure_self":
                    idx[bb, q_i, 0] = self_pos
                    val[bb, q_i, 0] = 0.0
    return idx, val


@pytest.mark.parametrize("mode", ["plain", "exclude_self", "ensure_self"])
def test_kernel_matches_numpy_oracle(pts, mode):
    tile, window, k = 8, 1, 5
    width = min(2 * window + 1, pts.shape[1] // tile)
    ii, vv = window_topk(
        jnp.asarray(pts), jnp.asarray(pts), k, tile=tile, width=width,
        window=window, mode=mode, interpret=True,
    )
    ri, rv = _np_window_topk(pts, tile, window, k, mode)
    np.testing.assert_array_equal(np.asarray(ii), ri)
    np.testing.assert_allclose(np.asarray(vv), rv, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("flags", [
    dict(exclude_self=True, ensure_self=False),
    dict(exclude_self=False, ensure_self=True),
    dict(exclude_self=False, ensure_self=False),
])
def test_tile_self_knn_kernel_path_bit_identical(pts, flags, monkeypatch):
    args = dict(tile=8, window=1, recall=None, assume_sorted=True, **flags)
    monkeypatch.setenv("WIN_TOPK", "off")
    _, li_ref, w_ref = tile_self_knn(jnp.asarray(pts), 5, **args)
    monkeypatch.setenv("WIN_TOPK", "interpret")
    _, li_k, w_k = tile_self_knn(jnp.asarray(pts), 5, **args)
    assert w_ref == w_k
    np.testing.assert_array_equal(np.asarray(li_ref), np.asarray(li_k))


def test_tile_cross_knn_kernel_path_bit_identical(pts, monkeypatch):
    sup = jnp.asarray(pts)
    q = sup[:, ::4]  # strided pick of a sorted cloud stays sorted
    monkeypatch.setenv("WIN_TOPK", "off")
    i_ref, d_ref = tile_cross_knn(q, sup, 4, tile=8, window=1, recall=None)
    # tile_cross_knn is jitted and the env is read at TRACE time — drop the
    # cached trace so the second call actually takes the kernel path
    tile_cross_knn.clear_cache()
    monkeypatch.setenv("WIN_TOPK", "interpret")
    i_k, d_k = tile_cross_knn(q, sup, 4, tile=8, window=1, recall=None)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_k))
    np.testing.assert_allclose(
        np.asarray(d_ref), np.asarray(d_k), rtol=1e-5, atol=1e-6
    )


def test_duplicate_points_tie_break(monkeypatch):
    """Padded (duplicate) points: ties resolve to the FIRST window index in
    both paths (the reference's stable-sort convention)."""
    base = np.random.RandomState(0).rand(1, 32, 3).astype(np.float32)
    base[0, 8:16] = base[0, 0:8]  # duplicate a tile
    monkeypatch.setenv("WIN_TOPK", "off")
    _, li_ref, _ = tile_self_knn(
        jnp.asarray(base), 4, tile=8, window=1, recall=None,
        assume_sorted=True,
    )
    monkeypatch.setenv("WIN_TOPK", "interpret")
    _, li_k, _ = tile_self_knn(
        jnp.asarray(base), 4, tile=8, window=1, recall=None,
        assume_sorted=True,
    )
    np.testing.assert_array_equal(np.asarray(li_ref), np.asarray(li_k))


def test_cross_window_gather_matches_batch_gather(rng):
    """cross_window_gather (one-hot MXU cross-level gather, round 4) must
    reproduce batch_gather on the global indices tile_cross_knn returns,
    and its VJP must equal the scatter-add backward."""
    import jax

    from contrastboundary_tpu.core.gather import batch_gather
    from contrastboundary_tpu.ops.tile_gather import (
        cross_window_gather, cross_window_starts,
    )

    tile, window = 8, 1
    sup_pts = np.sort(rng.rand(2, 64, 1), axis=1)  # monotone = "sorted"
    sup_pts = np.repeat(sup_pts, 3, axis=-1).astype(np.float32)
    q_pts = sup_pts[:, ::4]  # strided subset stays sorted
    from contrastboundary_tpu.ops.knn import tile_cross_knn

    idx, _ = tile_cross_knn(
        jnp.asarray(q_pts), jnp.asarray(sup_pts), 3, tile=tile,
        window=window, recall=None,
    )
    gq, gs = q_pts.shape[1] // tile, sup_pts.shape[1] // tile
    span = -(-gs // gq)
    width = min(span + 2 * window, gs)
    starts = cross_window_starts(gq, gs, width, window)
    st_rows = np.repeat(starts * tile, tile)
    li = np.asarray(idx) - st_rows[None, :, None]
    n = sup_pts.shape[1]
    li = np.where(np.asarray(idx) == n, width * tile, li).astype(np.int32)

    feats = rng.rand(2, 64, 5).astype(np.float32)
    want = np.asarray(
        batch_gather(jnp.asarray(feats), jnp.minimum(idx, n - 1))
    )
    want = np.where((np.asarray(idx) == n)[..., None], 0.0, want)
    got = np.asarray(cross_window_gather(
        jnp.asarray(feats), jnp.asarray(li), n, tile, width, window
    ))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # VJP vs autodiff through batch_gather
    g_out = rng.rand(*got.shape).astype(np.float32)

    def f_ref(x):
        nb = batch_gather(x, jnp.minimum(idx, n - 1))
        nb = jnp.where((idx == n)[..., None], 0.0, nb)
        return jnp.sum(nb * g_out)

    def f_new(x):
        return jnp.sum(
            cross_window_gather(x, jnp.asarray(li), n, tile, width, window)
            * g_out
        )

    gx_ref = np.asarray(jax.grad(f_ref)(jnp.asarray(feats)))
    gx_new = np.asarray(jax.grad(f_new)(jnp.asarray(feats)))
    np.testing.assert_allclose(gx_new, gx_ref, rtol=1e-5, atol=1e-5)


def test_grid_split_bit_identical(pts):
    """split (round 5, VERDICT item 4) is a pure grid re-partition: the
    (b·s, g/s) kernel must be bit-identical to the (b, g) one in every
    mode (the self_pos reconstruction from both program_ids included)."""
    tile, window, k = 8, 1, 5
    width = min(2 * window + 1, pts.shape[1] // tile)
    for mode in ["plain", "exclude_self", "ensure_self"]:
        i1, v1 = window_topk(
            jnp.asarray(pts), jnp.asarray(pts), k, tile=tile, width=width,
            window=window, mode=mode, interpret=True, split=1,
        )
        for split in (2, 4):
            i2, v2 = window_topk(
                jnp.asarray(pts), jnp.asarray(pts), k, tile=tile,
                width=width, window=window, mode=mode, interpret=True,
                split=split,
            )
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_auto_split_policy(monkeypatch):
    from contrastboundary_tpu.ops.pallas.win_topk import auto_split

    monkeypatch.delenv("WIN_TOPK_SPLIT", raising=False)
    assert auto_split(256, "WIN_TOPK_SPLIT") == 4  # preset shape gq
    assert auto_split(64, "WIN_TOPK_SPLIT") == 1   # record shape gq
    assert auto_split(96, "WIN_TOPK_SPLIT") == 2   # halve while divisible
    assert auto_split(100, "WIN_TOPK_SPLIT") == 2
    monkeypatch.setenv("WIN_TOPK_SPLIT", "8")
    assert auto_split(256, "WIN_TOPK_SPLIT") == 8
    assert auto_split(100, "WIN_TOPK_SPLIT") == 1  # non-dividing → off
    monkeypatch.setenv("WIN_TOPK_SPLIT", "1")
    assert auto_split(256, "WIN_TOPK_SPLIT") == 1
