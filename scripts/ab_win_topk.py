"""Within-session A/B: fused Pallas window top-k vs the XLA search paths.

Arms (flagship bf16 train step, B=4 N=16384 then B=1 N=65536):
  xla — WIN_TOPK=off (round-3 production: budget-gated iter/map+top_k)
  ker — WIN_TOPK=auto (Pallas kernel wherever the probe passes)

Method per CLAUDE.md: same process, interleaved rounds, queue-10 block-once
via host readback, best of 4.
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
from contrastboundary_tpu.train import (
    TrainStepConfig, create_train_state, make_train_step,
)
from contrastboundary_tpu.train.state import make_optimizer

SPEC = PyramidSpec(
    k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
    layout="sorted", sampler="strided",
)


def build_arm(name, b, n):
    os.environ["PT_ATTN"] = "off"
    os.environ["WIN_TOPK"] = "off" if name == "xla" else "auto"
    from contrastboundary_tpu.ops.knn import tile_cross_knn, windowed_knn
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
        loss = float(m["loss"])  # host readback = the only reliable sync
        holder["state"] = s
        return loss

    run(1)
    return run


def main():
    arms = sys.argv[1].split(",") if len(sys.argv) > 1 else ["xla", "ker"]
    shapes = [(4, 16384), (1, 65536)]
    if len(sys.argv) > 2:  # e.g. "1x65536"
        b_, n_ = sys.argv[2].split("x")
        shapes = [(int(b_), int(n_))]
    for b, n in shapes:
        print(f"=== B={b} N={n} ===", flush=True)
        runners = {}
        for a in arms:
            t0 = time.time()
            try:
                runners[a] = build_arm(a, b, n)
            except Exception as e:
                print(f"  FAILED {a}: {type(e).__name__}: {str(e)[:300]}",
                      flush=True)
                continue
            print(f"  built {a} ({time.time()-t0:.0f}s)", flush=True)
        live = [a for a in arms if a in runners]
        best = {a: float("inf") for a in live}
        loss = {}
        iters, rounds = 10, 4
        for r in range(rounds):
            for a in live:
                t0 = time.time()
                loss[a] = runners[a](iters)
                dt = (time.time() - t0) / iters * 1000
                best[a] = min(best[a], dt)
                print(f"  round {r} {a}: {dt:.1f} ms", flush=True)
        print(f"  BEST {b}x{n}: " + " ".join(
            f"{a}={best[a]:.1f}ms" for a in live
        ) + "   loss " + " ".join(f"{a}={loss[a]:.4f}" for a in live),
            flush=True)


if __name__ == "__main__":
    main()
