"""Capture a device trace of the flagship train step and print the top ops
by self-time (round 4: find where the 92 ms actually goes before building
anything). Writes the raw trace under /tmp/trace_step/ and prints an
aggregated table parsed from the xplane proto via tensorboard_plugin_profile.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_step.py [arm]
arm: base (default) | nocbl | pyr
"""
from __future__ import annotations

import glob
import os
import sys

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
B, N = 4, 16384
TRACE_DIR = "/tmp/trace_step"


def build(arm: str):
    os.environ["PT_ATTN"] = "off"
    contrast = None if arm == "nocbl" else ContrastConfig()
    model = PointTransformerSeg(num_classes=13, dtype=jnp.bfloat16)
    cfg = TrainStepConfig(num_classes=13, spec=SPEC, contrast=contrast)
    rng = np.random.RandomState(0)
    batch = {
        "points": jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 4.0),
        "features": jnp.asarray(rng.rand(B, N, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 13, (B, N)).astype(np.int32)),
    }
    if arm == "pyr":
        fn = jax.jit(lambda pts: build_pyramid(pts, SPEC))

        def run(iters):
            out = None
            for _ in range(iters):
                out = fn(batch["points"])
            np.asarray(out.points[-1][0, 0])  # readback sync (deep output)

        run(1)
        return run

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
        float(m["loss"])
        holder["state"] = s

    run(1)
    return run


def main():
    arm = sys.argv[1] if len(sys.argv) > 1 else "base"
    run = build(arm)
    run(5)  # warm, sync
    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        run(5)
    pbs = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", pbs, flush=True)
    if not pbs:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = rtd.xspace_to_tool_data(pbs, tool, {})
            out = f"/tmp/trace_{arm}_{tool}.out"
            with open(out, "wb") as f:
                f.write(data if isinstance(data, bytes) else data.encode())
            print(f"wrote {out} ({os.path.getsize(out)} bytes)", flush=True)
        except Exception as e:
            print(f"{tool} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
