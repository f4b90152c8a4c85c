"""Within-session delta-method step breakdown of the flagship bf16 preset
shape (B=4 x 16384, layout='sorted'), round 3.

Each arm jits a progressively larger slice of the train step; component
costs are adjacent-arm deltas, all measured in ONE process (device weather
varies 1.6-1.8x across sessions; see PERF.md). Queue-N-steps/block-once,
best of rounds, per the axon dispatch-floor rule.
"""
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

B, N = 4, 16384


def make_batch():
    rng = np.random.RandomState(0)
    return {
        "points": jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 4.0),
        "features": jnp.asarray(rng.rand(B, N, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 13, (B, N)).astype(np.int32)),
    }


def spec_full():
    return PyramidSpec(
        k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
        layout="sorted", sampler="strided",
    )


def timeit(fn, arg, iters=10, rounds=4):
    out = fn(arg)
    jax.block_until_ready(out)
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
    batch = make_batch()
    spec = spec_full()

    # pyramid arms must depend on EVERY output (returning one leaf lets XLA
    # dead-code-eliminate all the KNN work — the round-3 "0.0 ms" artifact)
    def pyr_all(pts, sp):
        pyr = build_pyramid(pts, sp)
        leaves = [x for x in jax.tree.leaves(pyr) if hasattr(x, "dtype")]
        return sum(jnp.sum(l[..., -1].astype(jnp.float32)) for l in leaves)

    # arm 1: pyramid only (no contrast/subscene)
    spec_min = PyramidSpec(layout="sorted", sampler="strided")
    f = jax.jit(lambda pts: pyr_all(pts, spec_min))
    t_pyr_min = timeit(f, batch["points"])
    print(f"pyramid (backbone only): {t_pyr_min:.1f} ms", flush=True)

    # arm 1b: + contrast KNNs, no subscene
    spec_c = PyramidSpec(
        k_contrast=(36, 24, 24, 24, 24), layout="sorted", sampler="strided"
    )
    f = jax.jit(lambda pts: pyr_all(pts, spec_c))
    t_pyr_c = timeit(f, batch["points"])
    print(f"pyramid (+contrast KNNs): {t_pyr_c:.1f} ms", flush=True)

    # arm 2: full pyramid (contrast + subscene KNNs)
    f = jax.jit(lambda pts: pyr_all(pts, spec))
    t_pyr = timeit(f, batch["points"])
    print(f"pyramid (full, +contrast/subscene): {t_pyr:.1f} ms", flush=True)

    # model setup
    model = PointTransformerSeg(num_classes=13, dtype=jnp.bfloat16)
    pyr = build_pyramid(batch["points"], spec)
    feats0 = batch["features"]
    if pyr.order0 is not None:
        feats0 = jnp.take_along_axis(feats0, pyr.order0[..., None], 1)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), feats0, pyr, train=True
    )
    tx = make_optimizer(0.05, momentum=0.9, weight_decay=1e-4)

    # arm 3: pyramid + forward (train-mode, logits only)
    def fwd(pts):
        pyrl = build_pyramid(pts, spec)
        f0 = jnp.take_along_axis(batch["features"], pyrl.order0[..., None], 1)
        out = model.apply(
            variables, f0, pyrl, train=True,
            mutable=["batch_stats"],
        )
        return out[0].logits
    t_fwd = timeit(jax.jit(fwd), batch["points"])
    print(f"pyramid + forward: {t_fwd:.1f} ms  (fwd ~ {t_fwd - t_pyr:.1f})",
          flush=True)

    # arm 3a: forward variants isolating sub-costs (timing only — each
    # variant re-inits its own params; deltas vs arm 3 locate the cost)
    for vname, kw in (
        ("no attention blocks", dict(blocks=(1, 1, 1, 1, 1))),
        ("no multihead", dict(use_multihead=False)),
    ):
        mv = PointTransformerSeg(num_classes=13, dtype=jnp.bfloat16, **kw)
        vv = jax.jit(mv.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), feats0, pyr, train=True
        )

        def fwd_v(pts, mv=mv, vv=vv):
            pyrl = build_pyramid(pts, spec)
            f0 = jnp.take_along_axis(
                batch["features"], pyrl.order0[..., None], 1
            )
            out = mv.apply(vv, f0, pyrl, train=True, mutable=["batch_stats"])
            return out[0].logits
        t_v = timeit(jax.jit(fwd_v), batch["points"])
        print(f"pyramid + forward [{vname}]: {t_v:.1f} ms", flush=True)

    # arm 3b: eval-mode forward (BN running stats — isolates the train-mode
    # batch-stat reductions)
    def fwd_eval(pts):
        pyrl = build_pyramid(pts, spec)
        f0 = jnp.take_along_axis(batch["features"], pyrl.order0[..., None], 1)
        out = model.apply(variables, f0, pyrl, train=False)
        return out.logits
    t_fe = timeit(jax.jit(fwd_eval), batch["points"])
    print(f"pyramid + forward (eval BN): {t_fe:.1f} ms", flush=True)

    # arm 4/5: full train step, CE only vs CE + 5-stage CBL.
    # make_train_step donates the state: always rebind, never reuse.
    for name, contrast in (
        ("CE only", None),
        ("CE + CBL", ContrastConfig()),
    ):
        cfg = TrainStepConfig(num_classes=13, spec=spec, contrast=contrast)
        step = make_train_step(model, cfg)
        # deep-copy: the donated step would otherwise delete `variables`'
        # buffers out from under the next arm
        st = create_train_state(jax.tree.map(jnp.copy, variables), tx)
        st, _ = step(st, batch)  # warm (donates and rebinds)
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            for _ in range(10):
                st, m = step(st, batch)
            jax.block_until_ready(st.params)
            best = min(best, (time.time() - t0) / 10)
        print(f"train step ({name}): {best*1e3:.1f} ms "
              f"({B*N/best/1e3:.0f}k pts/s)", flush=True)


if __name__ == "__main__":
    main()
