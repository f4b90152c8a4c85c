"""Within-session whole-step A/B at the PRESET shape (B=1 × N=65536, the
s3dis_pt_cbl training crop) for the round-5 grid split (VERDICT item 4).

Round-4 state: the self window-top-k kernels LOSE at B=1 (111.8 vs 86.7 ms)
and the combined step module deterministically 500s in the remote Mosaic
helper at the 256-tile grid, so bench starts the preset measure at
WIN_TOPK_SELF=off. The grid split (ops/pallas/win_topk.py::auto_split)
re-partitions (1, 256) → (4, 64) — the exact geometry where the same
kernels WIN at B=4 — bit-exactly.

Arms (each builds a fresh jitted step so env is re-read at trace time):
  selfoff   WIN_TOPK_SELF=off              (the round-4 bench policy)
  split     all kernels on, auto split      (the round-5 candidate)
  nosplit   all kernels on, WIN_TOPK_SPLIT=1 (the round-4 failure repro —
            expect a Mosaic 500 → probe fallback, or a slow kernel)

Method per CLAUDE.md: interleaved rounds, queue-N-steps-block-once
(host readback), best of rounds, single process.
"""
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

from contrastboundary_tpu.losses.contrast import ContrastConfig
from contrastboundary_tpu.models import PointTransformerSeg
from contrastboundary_tpu.ops import PyramidSpec, build_pyramid
from contrastboundary_tpu.ops.knn import tile_cross_knn
from contrastboundary_tpu.train import (
    TrainStepConfig,
    create_train_state,
    make_train_step,
)
from contrastboundary_tpu.train.state import make_optimizer

SPEC = PyramidSpec(
    k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
    layout="sorted", sampler="strided",
)

ENVS = ("WIN_TOPK", "WIN_TOPK_SELF", "WIN_TOPK_CROSS", "WIN_TOPK_SPLIT",
        "CBL_DENSE_SPLIT", "PT_ATTN", "CBL_DENSE")
ARMS = {
    "selfoff": {"WIN_TOPK_SELF": "off"},
    "split": {},
    "nosplit": {"WIN_TOPK_SPLIT": "1", "CBL_DENSE_SPLIT": "1"},
}


def build_arm(name, b, n):
    for k in ENVS:
        os.environ.pop(k, None)
    os.environ["PT_ATTN"] = "off"  # attention kernel decided separately
    os.environ.update(ARMS[name])
    build_pyramid.clear_cache()
    tile_cross_knn.clear_cache()

    model = PointTransformerSeg(num_classes=13, dtype=jnp.bfloat16)
    cfg = TrainStepConfig(
        num_classes=13, spec=SPEC, contrast=ContrastConfig()
    )
    rng = np.random.RandomState(0)
    batch = {
        "points": jnp.asarray(rng.rand(b, n, 3).astype(np.float32) * 4.0),
        "features": jnp.asarray(rng.rand(b, n, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 13, (b, n)).astype(np.int32)),
    }
    pyr = build_pyramid(batch["points"], SPEC)
    feats0 = batch["features"]
    if pyr.order0 is not None:
        feats0 = jnp.take_along_axis(feats0, pyr.order0[..., None], 1)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), feats0, pyr, train=True
    )
    state = create_train_state(
        variables, make_optimizer(0.05, momentum=0.9, weight_decay=1e-4)
    )
    step = make_train_step(model, cfg)
    holder = {"state": state}

    def run(iters):
        s = holder["state"]
        m = None
        for _ in range(iters):
            s, m = step(s, batch)
        float(m["loss"])  # host readback = the only reliable axon sync
        holder["state"] = s

    run(1)
    return run


def main():
    arms = sys.argv[1].split(",") if len(sys.argv) > 1 else list(ARMS)
    b, n = 1, 65536
    runners = {}
    for a in arms:
        t0 = time.time()
        try:
            runners[a] = build_arm(a, b, n)
            print(f"built {a} ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"FAILED {a}: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    arms = [a for a in arms if a in runners]
    best = {a: float("inf") for a in arms}
    iters, rounds = 10, 4
    for r in range(rounds):
        for a in arms:
            t0 = time.time()
            runners[a](iters)
            dt = (time.time() - t0) / iters * 1000
            best[a] = min(best[a], dt)
            print(f"round {r} {a}: {dt:.1f} ms", flush=True)
    print("BEST: " + " ".join(
        f"{a}={best[a]:.1f}ms ({b*n/best[a]*1000/1000:.0f}k pts/s)"
        for a in arms
    ), flush=True)


if __name__ == "__main__":
    main()
