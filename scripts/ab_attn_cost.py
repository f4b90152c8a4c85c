"""Within-session A/B: what does the backbone attention stack actually cost,
and what can BN folding + a fused attention kernel reclaim? (round-4 items
1+2; PERF.md roofline said the step is VPU elementwise + small matmuls).

Arms (flagship bf16, B=4 N=16384 + preset B=1 N=65536):
  base    — production step (bn_mode='batch')
  stale   — StaleBatchNorm everywhere: normalization coefficients known
            pre-step → XLA folds them into adjacent ops; batch-stat
            reductions remain (they feed the running-average update)
  noattn  — PointTransformerLayer body replaced by a single Dense (monkey-
            patch): upper bound of ANY attention-kernel win
  nocbl   — contrast=None: sizes the CBL share after round-3's top-k work
  pyr     — pyramid only

Method per CLAUDE.md: interleaved rounds, queue-10-steps-block-once, best of
4 rounds per arm, single process.
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

from flax import linen as nn

from contrastboundary_tpu.losses.contrast import ContrastConfig
from contrastboundary_tpu.models import PointTransformerSeg
from contrastboundary_tpu.models import blocks as blocks_mod
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

_ORIG_LAYER = blocks_mod.PointTransformerLayer


class NoAttnLayer(nn.Module):
    """Shape-preserving stand-in: one Dense, no gather/PE/tower/softmax.
    PointTransformerBlock resolves `PointTransformerLayer` from the module
    global at trace time, so rebinding the name swaps every block's body."""

    out_planes: int
    share_planes: int = 8
    bn_mode: str = "batch"
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, p, x, nb_idx, train=True, rel=None, local=None):
        return nn.Dense(self.out_planes, dtype=self.dtype, name="linear_q")(x)


def build_arm(name, b, n):
    import os

    # "...@perk" suffix selects the round-4 per-k kernel body; default is
    # the K-batched body (ops/pallas/pt_attn.py::_fwd_kernel_b)
    os.environ["PT_ATTN_IMPL"] = (
        "perk" if name.endswith("@perk") else "batched"
    )
    name = name[: -len("@perk")] if name.endswith("@perk") else name
    blocks_mod.PointTransformerLayer = (
        NoAttnLayer if name == "noattn" else _ORIG_LAYER
    )
    # arm "kernel" = all levels; "kernel32" / "kernel32+64" = only those C
    is_kernel = name.startswith("kernel")
    os.environ["PT_ATTN"] = "auto" if is_kernel else "off"
    os.environ["PT_ATTN_C"] = (
        name[len("kernel"):].replace("+", ",") if is_kernel else ""
    )
    bn_mode = "stale" if name == "stale" or is_kernel else "batch"
    contrast = None if name == "nocbl" else ContrastConfig()
    model = PointTransformerSeg(
        num_classes=13, dtype=jnp.bfloat16, bn_mode=bn_mode
    )
    cfg = TrainStepConfig(num_classes=13, spec=SPEC, contrast=contrast)
    rng = np.random.RandomState(0)
    batch = {
        "points": jnp.asarray(rng.rand(b, n, 3).astype(np.float32) * 4.0),
        "features": jnp.asarray(rng.rand(b, n, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 13, (b, n)).astype(np.int32)),
    }
    if name == "pyr":
        fn = jax.jit(lambda pts: build_pyramid(pts, SPEC).points[0])

        def run(iters):
            out = None
            for _ in range(iters):
                out = fn(batch["points"])
            # host READBACK, not block_until_ready: only a readback reliably
            # synchronizes over the axon tunnel (PERF.md round 3)
            np.asarray(out[0, 0])

        run(1)
        blocks_mod.PointTransformerLayer = _ORIG_LAYER
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
        float(m["loss"])  # host readback = the only reliable axon sync
        holder["state"] = s

    run(1)  # compile + transfer sync
    blocks_mod.PointTransformerLayer = _ORIG_LAYER
    return run


def main():
    import os

    arms = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "base", "stale", "noattn", "nocbl", "pyr"
    ]
    # AB_SHAPES="4x16384" (comma list) restricts the shape sweep — the
    # round-5 chip queue runs the attention decision at the record shape
    # only (the preset shape has its own harness, ab_preset_split.py)
    shapes = [(4, 16384), (1, 65536)]
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
            try:
                runners[a] = build_arm(a, b, n)
            except Exception as e:
                blocks_mod.PointTransformerLayer = _ORIG_LAYER
                print(f"  FAILED {a}: {type(e).__name__}: {str(e)[:300]}",
                      flush=True)
                continue
            print(f"  built {a} ({time.time()-t0:.0f}s)", flush=True)
        arms = [a for a in arms if a in runners]
        best = {a: float("inf") for a in arms}
        iters, rounds = 10, 4
        for r in range(rounds):
            for a in arms:
                t0 = time.time()
                runners[a](iters)
                dt = (time.time() - t0) / iters * 1000
                best[a] = min(best[a], dt)
                print(f"  round {r} {a}: {dt:.1f} ms", flush=True)
        print(f"  BEST {b}x{n}: " + " ".join(
            f"{a}={best[a]:.1f}ms" for a in arms
        ), flush=True)
        if "base" in best:
            base = best["base"]
            print("  deltas vs base: " + " ".join(
                f"{a} {base - best[a]:+.1f} ms" for a in arms if a != "base"
            ), flush=True)


if __name__ == "__main__":
    main()
