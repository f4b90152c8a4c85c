"""Whole-step within-session A/B: flagship bf16 train step with the XLA
one-hot gather vs the Pallas VMEM-one-hot gather (CBL + backbone kv).
Interleaved rounds, queue-N-block-once, best-of (PERF.md discipline)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from contrastboundary_tpu.utils.cache import setup_compile_cache
setup_compile_cache()

from contrastboundary_tpu.losses.contrast import ContrastConfig
from contrastboundary_tpu.models import PointTransformerSeg
from contrastboundary_tpu.ops import PyramidSpec, build_pyramid
from contrastboundary_tpu.train import (
    TrainStepConfig, create_train_state, make_train_step,
)
from contrastboundary_tpu.train.state import make_optimizer
import contrastboundary_tpu.ops.tile_gather as tg


def build_step(b, n):
    spec = PyramidSpec(
        k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
        layout="sorted", sampler="strided",
    )
    model = PointTransformerSeg(num_classes=13, dtype=jnp.bfloat16)
    cfg = TrainStepConfig(num_classes=13, spec=spec, contrast=ContrastConfig())
    rng = np.random.RandomState(0)
    batch = {
        "points": jnp.asarray(rng.rand(b, n, 3).astype(np.float32) * 4.0),
        "features": jnp.asarray(rng.rand(b, n, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 13, (b, n)).astype(np.int32)),
    }
    pyr = build_pyramid(batch["points"], spec)
    feats0 = batch["features"]
    if pyr.order0 is not None:
        feats0 = jnp.take_along_axis(feats0, pyr.order0[..., None], 1)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), feats0, pyr, train=True
    )
    tx = make_optimizer(0.05, momentum=0.9, weight_decay=1e-4)
    state = create_train_state(variables, tx)
    step = make_train_step(model, cfg)
    return step, state, batch


def main():
    b, n = 4, 16384
    # arm A: force XLA path
    real_auto = tg.tile_window_gather_auto
    tg.tile_window_gather_auto = lambda x, li, t, w: tg.tile_window_gather(
        x, li, t, w
    )
    step_xla, state_a, batch = build_step(b, n)
    state_a, m = step_xla(state_a, batch)
    print("xla warm, loss", float(m["loss"]), flush=True)

    # arm B: pallas (probe-gated; prints a warning + falls back if rejected)
    tg.tile_window_gather_auto = real_auto
    step_pl, state_b, _ = build_step(b, n)
    state_b, m = step_pl(state_b, batch)
    print("pallas warm, loss", float(m["loss"]), flush=True)

    iters, rounds = 10, 4
    best = {"xla": float("inf"), "pallas": float("inf")}
    for r in range(rounds):
        for name, step, st in (("xla", step_xla, state_a),
                               ("pallas", step_pl, state_b)):
            t0 = time.time()
            s = st
            for _ in range(iters):
                s, mm = step(s, batch)
            jax.block_until_ready(s.params)
            dt = (time.time() - t0) / iters
            best[name] = min(best[name], dt)
            if name == "xla":
                state_a = s
            else:
                state_b = s
            print(f"round {r} {name}: {dt*1e3:.1f} ms", flush=True)
    pts = b * n
    print(
        f"\nBEST: xla {best['xla']*1e3:.1f} ms ({pts/best['xla']/1e3:.0f}k "
        f"pts/s) | pallas {best['pallas']*1e3:.1f} ms "
        f"({pts/best['pallas']/1e3:.0f}k pts/s) | "
        f"speedup {best['xla']/best['pallas']:.3f}x"
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
