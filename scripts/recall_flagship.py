"""Measure tile-window KNN recall vs exact KNN at the FLAGSHIP scale
(N=65536) for the self-attention and contrast searches, window 1 vs 2.

Round-2 ABLATION measured 0.87 level-0 contrast recall on N=4096 toys;
Morton-window recall FALLS with N (a fixed ±width·tile row window covers a
shrinking spatial radius), so the flagship preset needs its own number
(VERDICT weak #4/#8). Prints one line per (search, window).
"""
import numpy as np
import jax
import jax.numpy as jnp

from contrastboundary_tpu.utils.cache import setup_compile_cache
setup_compile_cache()

from contrastboundary_tpu.ops.knn import knn, tile_self_knn
from contrastboundary_tpu.ops.sampling import serialized_order
from contrastboundary_tpu.core.gather import batch_gather


def recall(points, k, tile, window, exclude_self):
    b, n, _ = points.shape
    order = serialized_order(points)
    spts = batch_gather(points, order)
    _, li, width = tile_self_knn(
        spts, k, tile=tile, window=window, exclude_self=exclude_self,
        ensure_self=not exclude_self, recall=None, assume_sorted=True,
    )
    w = width * tile
    # window-relative -> global sorted-row indices
    g = n // tile
    starts = np.clip(np.arange(g) - window, 0, g - width) * tile
    starts_j = jnp.asarray(starts, jnp.int32)
    rows = jnp.arange(n) // tile
    base = starts_j[rows][None, :, None]
    gi = jnp.where(li < w, base + li, n)

    ex_idx, _ = knn(
        spts, spts, k, exclude_self=exclude_self,
        ensure_self=not exclude_self, recall=None, chunk=2048,
    )
    gi_np = np.asarray(gi)[0]
    ex_np = np.asarray(ex_idx)[0]
    sub = np.random.RandomState(1).choice(n, min(n, 8192), replace=False)
    m = (ex_np[sub][:, :, None] == gi_np[sub][:, None, :]).any(-1)
    return float(m.mean())


def main():
    rng = np.random.RandomState(0)
    # synthetic-room-like cloud: box walls/floor + blobs at real density
    n = 65536
    pts = np.concatenate([
        np.c_[rng.rand(n // 2) * 8, rng.rand(n // 2) * 8,
              np.zeros(n // 2)],
        rng.rand(n - n // 2, 3) * np.array([8, 8, 3]),
    ]).astype(np.float32)
    rng.shuffle(pts)
    points = jnp.asarray(pts[None])

    for name, k, excl in (("self-attn k=8", 8, False),
                          ("contrast k=35", 35, True)):
        for window in (1, 2, 4):
            r = recall(points, k, 256, window, excl)
            print(f"{name} window={window}: recall {r:.4f}", flush=True)


if __name__ == "__main__":
    main()
