"""On-device checks for the window top-k kernel (round 4):
1) which real-geometry keys probe OK at the preset shape B=1 N=65536
   (the reduced-grid probe let a 500-ing instantiation through);
2) L0 kernel-vs-XLA index agreement on the REAL MXU — the step A/B showed a
   0.3% loss delta, expected to be ulp-level distance ties, quantify it.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from contrastboundary_tpu.utils.cache import setup_compile_cache

setup_compile_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from contrastboundary_tpu.ops import PyramidSpec, build_pyramid
from contrastboundary_tpu.ops.knn import tile_self_knn

SPEC = PyramidSpec(
    k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
    layout="sorted", sampler="strided",
)


def main():
    rng = np.random.RandomState(0)

    # --- 2) L0 parity on device: kernel vs XLA (map+top_k) path ---
    pts = jnp.asarray(rng.rand(4, 16384, 3).astype(np.float32) * 4.0)
    from contrastboundary_tpu.core.gather import batch_gather
    from contrastboundary_tpu.ops.sampling import serialized_order

    spts = batch_gather(pts, serialized_order(pts))
    os.environ["WIN_TOPK"] = "off"
    _, li_x, w = tile_self_knn(spts, 36, tile=256, window=1,
                               exclude_self=False, recall=None,
                               assume_sorted=True)
    li_x = np.asarray(li_x)
    os.environ["WIN_TOPK"] = "auto"
    _, li_k, _ = tile_self_knn(spts, 36, tile=256, window=1,
                               exclude_self=False, recall=None,
                               assume_sorted=True)
    li_k = np.asarray(li_k)
    mism = (li_x != li_k).mean()
    # set-level agreement per row (order-insensitive)
    set_mism = 0
    for b in range(li_x.shape[0]):
        for i in range(0, li_x.shape[1], 97):
            if set(li_x[b, i]) != set(li_k[b, i]):
                set_mism += 1
    print(f"L0 k=36 slot mismatch rate: {mism:.6f}; "
          f"rows w/ different SETS (sampled): {set_mism}", flush=True)

    # --- 1) preset-shape pyramid with kernels: what probes OK now ---
    import warnings

    pts1 = jnp.asarray(rng.rand(1, 65536, 3).astype(np.float32) * 4.0)
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        pyr = build_pyramid(pts1, SPEC)
        jax.block_until_ready(pyr.self_idx[0])
    for wmsg in wlist:
        print("WARN:", str(wmsg.message)[:160], flush=True)
    print("preset-shape pyramid built OK", flush=True)


if __name__ == "__main__":
    main()
