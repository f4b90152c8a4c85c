"""Why do the SELF window-top-k kernels lose at the preset shape B=1×65536
(VERDICT round-4 item 4)?  Round-4 step A/B: self kernels ON = 111.8 ms vs
OFF = 86.7 ms, while the same kernels WIN at B=4×16384 (20.2 → 3.4 ms on the
L0 search).  Total grid cells are identical (4×64 vs 1×256), so per-cell
work cannot explain it — this probe isolates the kernel itself and its XLA
alternatives per (shape, k) to find where the 25 ms goes.

Arms, timed by chained host readbacks (CLAUDE.md measurement discipline:
queue iters, read back once, best of rounds, single process):
  kern      window_topk at the real geometry (ensure_self, the L0 merged
            self+contrast search k=36+pad and the plain k=16 backbone case)
  iter      ops/knn.py batched iterative-argmax XLA path (same contract)
  topk      the lax.map + lax.top_k tile loop (what iter replaced)

Shapes: (B=4, N=16384) and (B=1, N=65536) — same total points, same tile
(256) and width (3), differing ONLY in how cells split across grid dims.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from contrastboundary_tpu.utils.cache import setup_compile_cache

setup_compile_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from contrastboundary_tpu.ops.pallas.win_topk import window_topk

TILE, WIDTH = 256, 3
WINDOW = (WIDTH - 1) // 2


def make_arms(b, n, k):
    rng = np.random.RandomState(0)
    pts = jnp.asarray(np.sort(rng.rand(b, n, 3).astype(np.float32), axis=1))
    arms = {}

    def kern():
        idx, val = window_topk(
            pts, pts, k, tile=TILE, width=WIDTH, window=WINDOW,
            mode="ensure_self",
        )
        return idx

    arms["kern"] = kern

    # the XLA batched-iter path on the same window geometry: one
    # [B,G,T,W] distance einsum + k (max, first-argmax, mask) passes
    g = n // TILE
    starts = np.clip(np.arange(g) - WINDOW, 0, g - WIDTH)

    @jax.jit
    def iter_path(p):
        win = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(p, int(s) * TILE, WIDTH * TILE, 1)
             for s in starts], axis=1,
        )  # [B, G, W, 3]
        q = p.reshape(b, g, TILE, 3)
        d2 = (
            jnp.sum(q * q, -1)[..., None]
            + jnp.sum(win * win, -1)[:, :, None, :]
            - 2.0 * jnp.einsum("bgtc,bgwc->bgtw", q, win)
        )
        neg = -d2
        iota = jax.lax.broadcasted_iota(jnp.int32, neg.shape, 3)
        idxs = []
        for kk in range(k):
            v = jnp.max(neg, -1, keepdims=True)
            i = jnp.min(jnp.where(neg == v, iota, WIDTH * TILE), -1,
                        keepdims=True)
            idxs.append(i)
            if kk + 1 < k:
                neg = jnp.where(iota == i, -jnp.inf, neg)
        return jnp.concatenate(idxs, -1).reshape(b, n, k)

    arms["iter"] = lambda: iter_path(pts)

    @jax.jit
    def topk_path(p):
        win = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(p, int(s) * TILE, WIDTH * TILE, 1)
             for s in starts], axis=1,
        )
        q = p.reshape(b, g, TILE, 3)
        d2 = (
            jnp.sum(q * q, -1)[..., None]
            + jnp.sum(win * win, -1)[:, :, None, :]
            - 2.0 * jnp.einsum("bgtc,bgwc->bgtw", q, win)
        )
        _, i = jax.lax.top_k(-d2, k)
        return i.reshape(b, n, k)

    arms["topk"] = lambda: topk_path(pts)
    return arms


def main():
    ks = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1
                           else ["16", "36"])]
    for b, n in [(4, 16384), (1, 65536)]:
        for k in ks:
            arms = make_arms(b, n, k)
            # compile + sync
            built = {}
            for name, fn in arms.items():
                try:
                    t0 = time.time()
                    out = fn()
                    np.asarray(out[0, 0])
                    built[name] = fn
                    print(f"B={b} N={n} k={k} built {name} "
                          f"({time.time()-t0:.0f}s)", flush=True)
                except Exception as e:
                    print(f"B={b} N={n} k={k} FAILED {name}: "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            best = {a: float("inf") for a in built}
            iters, rounds = 20, 4
            for _ in range(rounds):
                for name, fn in built.items():
                    t0 = time.time()
                    out = None
                    for _ in range(iters):
                        out = fn()
                    np.asarray(out[0, 0])  # chained readback sync
                    best[name] = min(
                        best[name], (time.time() - t0) / iters * 1000
                    )
            print(
                f"BEST B={b} N={n} k={k}: "
                + " ".join(f"{a}={best[a]:.2f}ms" for a in built),
                flush=True,
            )


if __name__ == "__main__":
    main()
