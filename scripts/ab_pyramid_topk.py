"""Pyramid-only within-session A/B: WIN_TOPK off vs auto, plus HLO checks
that each arm compiled what we think it compiled (the train-step A/B was
flat while traces said −8 ms — find out where the win goes)."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from contrastboundary_tpu.utils.cache import setup_compile_cache

setup_compile_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from contrastboundary_tpu.ops import PyramidSpec, build_pyramid
from contrastboundary_tpu.ops.knn import tile_cross_knn

SPEC = PyramidSpec(
    k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
    layout="sorted", sampler="strided",
)


def build_arm(name, b, n):
    os.environ["WIN_TOPK"] = "off" if name == "xla" else "auto"
    # the env is read at TRACE time and these are nested jits with global
    # trace caches — clear them or arm 2 replays arm 1's paths verbatim
    build_pyramid.clear_cache()
    tile_cross_knn.clear_cache()
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(b, n, 3).astype(np.float32) * 4.0)

    def fn(p):
        pyr = build_pyramid(p, SPEC)
        # force every output (no DCE): scalar mix of all index/rel arrays
        tot = jnp.float32(0)
        for group in (pyr.self_idx, pyr.contrast_idx, pyr.down_idx,
                      pyr.up_idx, pyr.near0_idx, pyr.subscene_idx):
            for a in group:
                if a is not None:
                    tot += jnp.sum(a.astype(jnp.float32) % 7)
        for group in (pyr.self_rel, pyr.down_rel, pyr.up_w):
            for a in group:
                if a is not None:
                    tot += jnp.sum(a.astype(jnp.float32))
        return tot

    jitted = jax.jit(fn)
    txt = jitted.lower(pts).compile().as_text()
    n_ker = txt.count("tpu_custom_call")
    n_sort = txt.count(" sort(")
    print(f"  [{name}] HLO: {n_ker} window_topk custom-calls, "
          f"{n_sort} sorts", flush=True)

    def run(iters):
        out = None
        for _ in range(iters):
            out = jitted(pts)
        return float(out)  # host readback sync

    run(1)
    return run


def main():
    for b, n in [(4, 16384), (1, 65536)]:
        print(f"=== B={b} N={n} ===", flush=True)
        runners = {}
        for a in ("xla", "ker"):
            t0 = time.time()
            runners[a] = build_arm(a, b, n)
            print(f"  built {a} ({time.time()-t0:.0f}s)", flush=True)
        best = {a: float("inf") for a in runners}
        for r in range(4):
            for a in runners:
                t0 = time.time()
                runners[a](10)
                dt = (time.time() - t0) / 10 * 1000
                best[a] = min(best[a], dt)
                print(f"  round {r} {a}: {dt:.1f} ms", flush=True)
        print("  BEST: " + " ".join(f"{a}={best[a]:.1f}ms" for a in best),
              flush=True)


if __name__ == "__main__":
    main()
