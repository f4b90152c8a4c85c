"""Within-session A/B: BN compute dtype f32 (default, torch-AMP convention)
vs the block dtype (BN_COMPUTE=model → bf16 in the fast path).

Motivation (round-5 continuation): the attention stack costs 27.1 ms of the
68 ms step (noattn arm, PERF.md round 5) and all four fused-kernel attempts
lost — but the XLA path still materializes every [B,N,K,C] tower tensor and
its cotangent in f32 because make_bn pins dtype=f32. flax computes the batch
STATISTICS in f32 either way; BN_COMPUTE=model only rounds the normalized
activations to bf16 (the rounding every nn.Dense already applies to its
input), halving the HBM bytes of the BN-adjacent elementwise traffic.

Arms (flagship bf16, B=4 N=16384 by default; AB_SHAPES= to override):
  base    — production step (BN f32)
  bnbf16  — BN_COMPUTE=model (BN compute/output in bf16)

Method per CLAUDE.md: interleaved rounds, queue-10-steps-block-once, best of
4 rounds per arm, single process.
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
    TrainStepConfig,
    create_train_state,
    make_train_step,
)
from contrastboundary_tpu.train.state import make_optimizer

SPEC = PyramidSpec(
    k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
    layout="sorted", sampler="strided",
)


def build_arm(name, b, n):
    if name == "bnbf16":
        os.environ["BN_COMPUTE"] = "model"
    else:
        os.environ.pop("BN_COMPUTE", None)
    model = PointTransformerSeg(num_classes=13, dtype=jnp.bfloat16)
    cfg = TrainStepConfig(num_classes=13, spec=SPEC, contrast=ContrastConfig())
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
        loss = float(m["loss"])  # host readback = the only reliable axon sync
        holder["state"] = s
        return loss

    loss0 = run(1)  # compile + transfer sync
    os.environ.pop("BN_COMPUTE", None)
    return run, loss0


def main():
    arms = sys.argv[1].split(",") if len(sys.argv) > 1 else ["base", "bnbf16"]
    shapes = [(4, 16384)]
    if os.environ.get("AB_SHAPES"):
        shapes = [
            tuple(int(v) for v in s.split("x"))
            for s in os.environ["AB_SHAPES"].split(",")
        ]
    for b, n in shapes:
        print(f"=== B={b} N={n} ===", flush=True)
        runners = {}
        for a in arms:
            t0 = time.time()
            runners[a], loss0 = build_arm(a, b, n)
            print(f"  built {a} ({time.time()-t0:.0f}s) step-1 loss "
                  f"{loss0:.4f}", flush=True)
        live = [a for a in arms if a in runners]
        best = {a: float("inf") for a in live}
        iters, rounds = 10, 4
        for r in range(rounds):
            for a in live:
                t0 = time.time()
                runners[a](iters)
                dt = (time.time() - t0) / iters * 1000
                best[a] = min(best[a], dt)
                print(f"  round {r} {a}: {dt:.1f} ms", flush=True)
        print(f"  BEST {b}x{n}: " + " ".join(
            f"{a}={best[a]:.1f}ms" for a in live
        ), flush=True)
        if "base" in best:
            base = best["base"]
            print("  deltas vs base: " + " ".join(
                f"{a} {base - best[a]:+.1f} ms" for a in live if a != "base"
            ), flush=True)


if __name__ == "__main__":
    main()
