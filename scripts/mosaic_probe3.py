"""Mosaic probe round 3: isolate which construct inside the softnn tail
(probe2 'e') and the bf16 store (probe2 'h') breaks the remote helper."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from contrastboundary_tpu.utils.cache import setup_compile_cache
setup_compile_cache()

T, C, K = 256, 64, 8
G = 4
M = G * T
W = 3 * T
RESULTS = []


def probe(name):
    def deco(fn):
        def run():
            try:
                fn()
                RESULTS.append((name, "PASS"))
                print(f"[PASS] {name}", flush=True)
            except Exception as e:
                msg = f"{type(e).__name__}: {str(e)[:160]}"
                RESULTS.append((name, f"FAIL {msg}"))
                print(f"[FAIL] {name}: {msg}", flush=True)
        return run
    return deco


def window_specs():
    specs = []
    for j in range(3):
        specs.append(
            pl.BlockSpec(
                (1, T, C),
                functools.partial(
                    lambda bb, gg, j=0: (bb, jnp.clip(gg - 1, 0, G - 3) + j, 0),
                    j=j,
                ),
                memory_space=pltpu.VMEM,
            )
        )
    specs.append(
        pl.BlockSpec((1, T, K), lambda bb, gg: (bb, gg, 0),
                     memory_space=pltpu.VMEM)
    )
    return specs


def tail_call(tail):
    """gather -> dist [T, K] + valid [T, K] -> tail() -> [T, 128] out."""
    def kern(*refs):
        win = jnp.concatenate([r[0] for r in refs[:3]], axis=0)
        li_ref = refs[3]
        o_ref = refs[4]
        iota_w = lax.broadcasted_iota(jnp.int32, (T, W), 1)
        cols, vals = [], []
        for kk in range(K):
            oh = (li_ref[0, :, kk][:, None] == iota_w).astype(jnp.float32)
            nb = lax.dot_general(
                oh, win, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cols.append(jnp.sqrt(jnp.sum(nb * nb, -1, keepdims=True) + 1e-12))
            vals.append(li_ref[0, :, kk][:, None] < W)
        dist = jnp.concatenate(cols, axis=1)
        valid = jnp.concatenate(vals, axis=1)
        o_ref[0] = tail(dist, valid)

    x = jnp.ones((2, M, C), jnp.float32)
    li = jnp.zeros((2, M, K), jnp.int32)
    out = pl.pallas_call(
        kern,
        grid=(2, G),
        in_specs=window_specs(),
        out_specs=pl.BlockSpec((1, T, 128), lambda bb, gg: (bb, gg, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, M, 128), jnp.float32),
    )(x, x, x, li)
    jax.block_until_ready(out)


@probe("e1-linear-tail-broadcast-write")
def e1():
    def tail(dist, valid):
        loss = jnp.sum(dist * valid.astype(jnp.float32), -1, keepdims=True)
        lane = lax.broadcasted_iota(jnp.int32, (T, 128), 1)
        return jnp.where(lane == 0, loss, 0.0)
    tail_call(tail)


@probe("e2-exp-tail")
def e2():
    def tail(dist, valid):
        ex = jnp.exp(-dist) * valid.astype(jnp.float32)
        loss = jnp.sum(ex, -1, keepdims=True)
        lane = lax.broadcasted_iota(jnp.int32, (T, 128), 1)
        return jnp.where(lane == 0, loss, 0.0)
    tail_call(tail)


@probe("e3-log-tail")
def e3():
    def tail(dist, valid):
        loss = -jnp.log(
            jnp.sum(dist * valid.astype(jnp.float32), -1, keepdims=True)
            + 1e-12
        )
        lane = lax.broadcasted_iota(jnp.int32, (T, 128), 1)
        return jnp.where(lane == 0, loss, 0.0)
    tail_call(tail)


@probe("e4-max-where-ref-sub")
def e4():
    def tail(dist, valid):
        a_ = -dist
        ref = jnp.max(jnp.where(valid, a_, -1e9), axis=-1, keepdims=True)
        z = jnp.where(valid, a_ - ref, -50.0)
        loss = jnp.sum(z, -1, keepdims=True)
        lane = lax.broadcasted_iota(jnp.int32, (T, 128), 1)
        return jnp.where(lane == 0, loss, 0.0)
    tail_call(tail)


@probe("e5-exp-after-maxsub")
def e5():
    def tail(dist, valid):
        a_ = -dist
        ref = jnp.max(jnp.where(valid, a_, -1e9), axis=-1, keepdims=True)
        z = jnp.where(valid, a_ - ref, -50.0)
        ex = jnp.exp(z) * valid.astype(jnp.float32)
        loss = jnp.sum(ex, -1, keepdims=True)
        lane = lax.broadcasted_iota(jnp.int32, (T, 128), 1)
        return jnp.where(lane == 0, loss, 0.0)
    tail_call(tail)


@probe("h1-bf16-store-2d")
def h1():
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.bfloat16)
    x = jnp.ones((T, 128), jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    jax.block_until_ready(out)


@probe("h2-bf16-store-3d-slice")
def h2():
    def kern(x_ref, o_ref):
        for kk in range(K):
            o_ref[:, kk, :] = x_ref[:].astype(jnp.bfloat16)
    x = jnp.ones((T, C), jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, K, C), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    jax.block_until_ready(out)


@probe("h3-bf16-store-full-3d")
def h3():
    def kern(x_ref, o_ref):
        o_ref[:] = jnp.broadcast_to(
            x_ref[:].astype(jnp.bfloat16)[:, None, :], (T, K, C)
        )
    x = jnp.ones((T, C), jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, K, C), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    jax.block_until_ready(out)


@probe("h4-bf16-store-2d-wide")
def h4():
    """bf16 store as [T, K*C] 2D (lane-concat layout)."""
    def kern(x_ref, o_ref):
        cols = [x_ref[:].astype(jnp.bfloat16) for _ in range(K)]
        o_ref[:] = jnp.concatenate(cols, axis=1)
    x = jnp.ones((T, C), jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, K * C), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    jax.block_until_ready(out)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for fn in [e1, e2, e3, e4, e5, h1, h2, h3, h4]:
        fn()
    print("\n=== SUMMARY ===")
    for name, r in RESULTS:
        print(f"{name:32s} {r}")
