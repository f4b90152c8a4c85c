"""Round-4 within-session A/B matrix: window-top-k kernel (WIN_TOPK) ×
cross-window one-hot gathers (XGATHER) on the flagship bf16 train step.

Usage: python scripts/ab_round4.py <arm1,arm2,...> <BxN> [arm=ENV:val;ENV:val ...]
Arms: base (both off), wt (kernel only), xg (gathers only), both, or custom
"name=WIN_TOPK:auto;XGATHER:on;WIN_TOPK_CROSS:off" specs.
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
    TrainStepConfig, create_train_state, make_train_step,
)
from contrastboundary_tpu.train.state import make_optimizer

SPEC = PyramidSpec(
    k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
    layout="sorted", sampler="strided",
)

ARMS = {
    "base": {"WIN_TOPK": "off", "XGATHER": "off"},
    "wt": {"WIN_TOPK": "auto", "XGATHER": "off"},
    "xg": {"WIN_TOPK": "off", "XGATHER": "on"},
    "both": {"WIN_TOPK": "auto", "XGATHER": "on"},
}


def arm_env(spec_str):
    if "=" in spec_str:
        name, envs = spec_str.split("=", 1)
        d = dict(kv.split(":") for kv in envs.split(";"))
        return name, d
    return spec_str, ARMS[spec_str]


def build_arm(envs, b, n):
    os.environ["PT_ATTN"] = "off"
    for k in ("WIN_TOPK", "XGATHER", "WIN_TOPK_CROSS", "WIN_TOPK_SELF",
              "WIN_TOPK_KEYS"):
        os.environ.pop(k, None)
    os.environ.update(envs)
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
    arm_specs = [arm_env(a) for a in sys.argv[1].split(",")]
    b, n = (int(x) for x in sys.argv[2].split("x"))
    print(f"=== B={b} N={n} ===", flush=True)
    runners = {}
    for name, envs in arm_specs:
        t0 = time.time()
        try:
            runners[name] = build_arm(envs, b, n)
        except Exception as e:
            print(f"  FAILED {name}: {type(e).__name__}: {str(e)[:250]}",
                  flush=True)
            continue
        print(f"  built {name} ({time.time()-t0:.0f}s)", flush=True)
    live = [nm for nm, _ in arm_specs if nm in runners]
    best = {a: float("inf") for a in live}
    loss = {}
    for r in range(4):
        for a in live:
            t0 = time.time()
            loss[a] = runners[a](10)
            dt = (time.time() - t0) / 10 * 1000
            best[a] = min(best[a], dt)
            print(f"  round {r} {a}: {dt:.1f} ms", flush=True)
    print(f"  BEST {b}x{n}: " + " ".join(
        f"{a}={best[a]:.1f}ms" for a in live
    ) + "   loss " + " ".join(f"{a}={loss[a]:.4f}" for a in live),
        flush=True)


if __name__ == "__main__":
    main()
