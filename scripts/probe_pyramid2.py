"""Pyramid COMPONENT probe (axon-proof chained timing, see probe_pyramid.py).

Locates the ~65 ms backbone-pyramid cost: Morton sort, per-level tile
self-KNN, cross-level KNNs, contrast/subscene KNNs.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from contrastboundary_tpu.utils.cache import setup_compile_cache
setup_compile_cache()

from contrastboundary_tpu.core.gather import batch_gather
from contrastboundary_tpu.ops.knn import tile_self_knn, tile_cross_knn
from contrastboundary_tpu.ops.sampling import serialized_order

B, N = 4, 16384


def chain_time(f, p0, iters=20, base_iters=5, rounds=3):
    best_hi = best_lo = float("inf")
    for _ in range(rounds):
        for iters_, which in ((iters, "hi"), (base_iters, "lo")):
            p = p0
            t0 = time.time()
            s = jnp.float32(0.0)
            for _ in range(iters_):
                s = f(p + 0.0 * s)
            _ = float(s)
            dt = time.time() - t0
            if which == "hi":
                best_hi = min(best_hi, dt)
            else:
                best_lo = min(best_lo, dt)
    return (best_hi - best_lo) / (iters - base_iters)


def arm(name, fn, p0):
    f = jax.jit(lambda p: fn(p) * 1e-20)
    _ = float(f(p0))
    per = chain_time(f, p0)
    print(f"{name}: {per*1e3:.1f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    p0 = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 4.0)

    def sort_only(p):
        return jnp.sum(serialized_order(p).astype(jnp.float32))

    def sort_gather(p):
        o = serialized_order(p)
        return jnp.sum(batch_gather(p, o))

    def sorted_pts(p):
        return batch_gather(p, serialized_order(p))

    def self_knn_l0(p):
        sp = sorted_pts(p)
        _, li, _ = tile_self_knn(
            sp, 8, tile=256, window=1, exclude_self=False, ensure_self=True,
            recall=0.95, assume_sorted=True,
        )
        return jnp.sum(li.astype(jnp.float32))

    def contrast_knn_l0(p):
        sp = sorted_pts(p)
        _, li, _ = tile_self_knn(
            sp, 35, tile=256, window=1, exclude_self=True,
            recall=0.95, assume_sorted=True,
        )
        return jnp.sum(li.astype(jnp.float32))

    def cross_l1(p):
        sp = sorted_pts(p)
        q = sp[:, ::4]
        gi, _ = tile_cross_knn(q, sp, 16, tile=256, window=1, recall=0.95)
        return jnp.sum(gi.astype(jnp.float32))

    def near0_l1(p):
        sp = sorted_pts(p)
        q = sp[:, ::4]
        gi, _ = tile_cross_knn(sp, q, 1, tile=256, window=1, recall=0.95)
        return jnp.sum(gi.astype(jnp.float32))

    arm("morton argsort", sort_only, p0)
    arm("argsort + gather", sort_gather, p0)
    arm("L0 self KNN k=8 (sorted input)", self_knn_l0, p0)
    arm("L0 contrast KNN k=35 (sorted input)", contrast_knn_l0, p0)
    arm("L1 down cross KNN k=16", cross_l1, p0)
    arm("L1 near0 cross KNN k=1 (16k queries)", near0_l1, p0)


if __name__ == "__main__":
    main()
