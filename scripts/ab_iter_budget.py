"""Within-session A/B: L0 contrast KNN (k=35, W=768) via the sequential
map+lax.top_k tile loop (current dispatch: budget 1e9 excludes it) vs the
fully-batched iterative-argmax path (budget raised to cover its 1.76G
element*passes). Whole-step + pyramid-only timings, interleaved rounds,
queue-N-block-once (PERF.md discipline)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from contrastboundary_tpu.utils.cache import setup_compile_cache
setup_compile_cache()

import contrastboundary_tpu.ops.knn as knn_mod
from contrastboundary_tpu.losses.contrast import ContrastConfig
from contrastboundary_tpu.models import PointTransformerSeg
from contrastboundary_tpu.ops import PyramidSpec, build_pyramid
from contrastboundary_tpu.train import (
    TrainStepConfig, create_train_state, make_train_step,
)
from contrastboundary_tpu.train.state import make_optimizer

B, N = 4, 16384


def spec_full():
    return PyramidSpec(
        k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
        layout="sorted", sampler="strided",
    )


def make_batch():
    rng = np.random.RandomState(0)
    return {
        "points": jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 4.0),
        "features": jnp.asarray(rng.rand(B, N, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 13, (B, N)).astype(np.int32)),
    }


def build_arms(budget):
    knn_mod._ITER_TOPK_BUDGET = budget
    spec = spec_full()
    batch = make_batch()

    def pyr_all(pts):
        pyr = build_pyramid(pts, spec)
        leaves = [x for x in jax.tree.leaves(pyr) if hasattr(x, "dtype")]
        return sum(jnp.sum(l[..., -1].astype(jnp.float32)) for l in leaves)

    pyr_fn = jax.jit(pyr_all)

    model = PointTransformerSeg(num_classes=13, dtype=jnp.bfloat16)
    cfg = TrainStepConfig(num_classes=13, spec=spec, contrast=ContrastConfig())
    pyr = build_pyramid(batch["points"], spec)
    feats0 = jnp.take_along_axis(batch["features"], pyr.order0[..., None], 1)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), feats0, pyr, train=True
    )
    tx = make_optimizer(0.05, momentum=0.9, weight_decay=1e-4)
    state = create_train_state(variables, tx)
    step = make_train_step(model, cfg)
    return pyr_fn, step, state, batch


def timeit(fn, arg, iters=10, rounds=1):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        o = None
        for _ in range(iters):
            o = fn(arg)
        jax.block_until_ready(o)
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    # IMPORTANT: the two arms trace different executables but share ops/knn;
    # build each arm fully (tracing reads the budget global at build time).
    arms = {}
    for name, budget in (("map+topk", 1_000_000_000), ("iter35", 2_000_000_000)):
        pyr_fn, step, state, batch = build_arms(budget)
        jax.block_until_ready(pyr_fn(batch["points"]))  # compile
        state, m = step(state, batch)  # compile
        print(f"{name} warm: loss {float(m['loss']):.4f}", flush=True)
        arms[name] = dict(pyr=pyr_fn, step=step, state=state, batch=batch,
                          best_p=float("inf"), best_s=float("inf"))

    for r in range(4):
        for name, a in arms.items():
            tp = timeit(a["pyr"], a["batch"]["points"])
            a["best_p"] = min(a["best_p"], tp)
            t0 = time.time()
            s = a["state"]
            for _ in range(10):
                s, _ = a["step"](s, a["batch"])
            jax.block_until_ready(s.params)
            ts = (time.time() - t0) / 10 * 1e3
            a["state"] = s
            a["best_s"] = min(a["best_s"], ts)
            print(f"round {r} {name}: pyramid {tp:.1f} ms, step {ts:.1f} ms",
                  flush=True)

    for name, a in arms.items():
        pts = B * N
        print(f"BEST {name}: pyramid {a['best_p']:.1f} ms, step "
              f"{a['best_s']:.1f} ms ({pts/a['best_s']:.0f}k pts/s)")


if __name__ == "__main__":
    main()
