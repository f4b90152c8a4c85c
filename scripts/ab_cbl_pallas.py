"""On-device check + within-session whole-step A/B of the fused CBL v2
kernel vs the XLA tile path (flagship bf16 preset shape)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from contrastboundary_tpu.utils.cache import setup_compile_cache
setup_compile_cache()

from contrastboundary_tpu.losses.contrast import (
    ContrastConfig, cbl_stage_loss,
)
from contrastboundary_tpu.models import PointTransformerSeg
from contrastboundary_tpu.ops import PyramidSpec, build_pyramid
from contrastboundary_tpu.train import (
    TrainStepConfig, create_train_state, make_train_step,
)
from contrastboundary_tpu.train.state import make_optimizer


def kernel_check():
    """Numerics vs XLA at a realistic sub-shape, compiled on device."""
    rng = np.random.RandomState(0)
    b, m, k, ncls, c = 1, 4096, 35, 13, 32
    tile, width, window = 256, 3, 1
    w = width * tile
    feats = jnp.asarray(rng.randn(b, m, c).astype(np.float32))
    lab = rng.randint(-1, ncls, (b, m))
    onehot = np.eye(ncls, dtype=np.float32)[np.maximum(lab, 0)] * (
        lab >= 0
    )[..., None]
    label_soft = jnp.asarray(onehot)
    li = jnp.asarray(rng.randint(0, w + 1, (b, m, k)).astype(np.int32))

    def loss(impl, f):
        return cbl_stage_loss(
            f, li, label_soft, ContrastConfig(impl=impl),
            local=(tile, width),
        )

    # f32 only: this deployment's Mosaic 500s on the bf16 variant (probed
    # 2026-08-17); the dispatch casts bf16 features to f32 instead.
    for dtype in (jnp.float32,):
        f = feats.astype(dtype)
        t0 = time.time()
        try:
            p = float(jax.jit(lambda f: loss("pallas", f))(f))
            gp = jax.jit(jax.grad(lambda f: loss("pallas", f)))(f)
            jax.block_until_ready(gp)
        except Exception as e:
            print(f"kernel {dtype.__name__}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        dt = time.time() - t0
        x = float(jax.jit(lambda f: loss("xla", f))(f))
        gx = jax.jit(jax.grad(lambda f: loss("xla", f)))(f)
        gerr = float(jnp.max(jnp.abs(
            gp.astype(jnp.float32) - gx.astype(jnp.float32)
        )))
        print(
            f"kernel {dtype.__name__}: ok (compile+run {dt:.0f}s) "
            f"loss pallas {p:.5f} xla {x:.5f} | max grad err {gerr:.2e}",
            flush=True,
        )


def build_step(impl, b, n):
    spec = PyramidSpec(
        k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
        layout="sorted", sampler="strided",
    )
    model = PointTransformerSeg(num_classes=13, dtype=jnp.bfloat16)
    cfg = TrainStepConfig(
        num_classes=13, spec=spec, contrast=ContrastConfig(impl=impl)
    )
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


def step_ab():
    b, n = 4, 16384
    step_x, st_x, batch = build_step("xla", b, n)
    st_x, m = step_x(st_x, batch)
    print("xla warm, loss", float(m["loss"]), flush=True)
    step_p, st_p, _ = build_step("auto", b, n)
    st_p, m = step_p(st_p, batch)
    print("pallas warm, loss", float(m["loss"]), flush=True)

    iters, rounds = 10, 4
    best = {"xla": float("inf"), "pallas": float("inf")}
    for r in range(rounds):
        for name, step, st in (("xla", step_x, st_x), ("pallas", step_p, st_p)):
            t0 = time.time()
            s = st
            for _ in range(iters):
                s, _mm = step(s, batch)
            jax.block_until_ready(s.params)
            dt = (time.time() - t0) / iters
            best[name] = min(best[name], dt)
            if name == "xla":
                st_x = s
            else:
                st_p = s
            print(f"round {r} {name}: {dt*1e3:.1f} ms", flush=True)
    pts = b * n
    print(
        f"\nBEST: xla {best['xla']*1e3:.1f} ms ({pts/best['xla']/1e3:.0f}k) | "
        f"pallas-cbl {best['pallas']*1e3:.1f} ms "
        f"({pts/best['pallas']/1e3:.0f}k) | "
        f"speedup {best['xla']/best['pallas']:.3f}x"
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    kernel_check()
    step_ab()
