"""Mosaic probe round 2: bisect the constructs separating the PASSING
gather-grid kernel (scripts/mosaic_probe.py p3) from the FAILING fused CBL
kernel, and find what breaks bf16.
"""
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


def grid_call(kern, out_shape, out_spec, extra_dtype=jnp.float32):
    x = jnp.ones((2, M, C), extra_dtype)
    li = jnp.zeros((2, M, K), jnp.int32)
    out = pl.pallas_call(
        kern,
        grid=(2, G),
        in_specs=window_specs(),
        out_specs=out_spec,
        out_shape=out_shape,
    )(x, x, x, li)
    jax.block_until_ready(out)


def base_body(refs, transform):
    """gather + transform(nb_k cols) -> [T, K] out"""
    win = jnp.concatenate([r[0] for r in refs[:3]], axis=0)
    li_ref = refs[3]
    o_ref = refs[4]
    iota_w = lax.broadcasted_iota(jnp.int32, (T, W), 1)
    cols = []
    for kk in range(K):
        oh = (li_ref[0, :, kk][:, None] == iota_w).astype(jnp.float32)
        nb = lax.dot_general(
            oh, win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, C]
        cols.append(transform(nb, li_ref[0, :, kk]))
    o_ref[0] = jnp.concatenate(cols, axis=1)[:, :K]


@probe("a-sum-cols")
def a():
    def kern(*refs):
        base_body(refs, lambda nb, lik: jnp.sum(nb, axis=-1, keepdims=True))
    grid_call(kern, jax.ShapeDtypeStruct((2, M, K), jnp.float32),
              pl.BlockSpec((1, T, K), lambda bb, gg: (bb, gg, 0),
                           memory_space=pltpu.VMEM))


@probe("b-sqrt-dist")
def b():
    def kern(*refs):
        base_body(refs, lambda nb, lik: jnp.sqrt(
            jnp.sum(nb * nb, axis=-1, keepdims=True) + 1e-12))
    grid_call(kern, jax.ShapeDtypeStruct((2, M, K), jnp.float32),
              pl.BlockSpec((1, T, K), lambda bb, gg: (bb, gg, 0),
                           memory_space=pltpu.VMEM))


@probe("c-valid-bool")
def c():
    def kern(*refs):
        def tr(nb, lik):
            d = jnp.sum(nb * nb, axis=-1, keepdims=True)
            valid = (lik[:, None] < W) & (d > 0)
            return jnp.where(valid, d, -1e9)
        base_body(refs, tr)
    grid_call(kern, jax.ShapeDtypeStruct((2, M, K), jnp.float32),
              pl.BlockSpec((1, T, K), lambda bb, gg: (bb, gg, 0),
                           memory_space=pltpu.VMEM))


@probe("d-first-argmax")
def d():
    def kern(*refs):
        def tr(nb, lik):
            mx = jnp.max(nb, axis=-1, keepdims=True)
            iota = lax.broadcasted_iota(jnp.int32, nb.shape, 1)
            am = jnp.min(jnp.where(nb >= mx, iota, 2**30), axis=-1,
                         keepdims=True)
            return am.astype(jnp.float32)
        base_body(refs, tr)
    grid_call(kern, jax.ShapeDtypeStruct((2, M, K), jnp.float32),
              pl.BlockSpec((1, T, K), lambda bb, gg: (bb, gg, 0),
                           memory_space=pltpu.VMEM))


@probe("e-exp-log-softnn")
def e():
    def kern(*refs):
        win = jnp.concatenate([r[0] for r in refs[:3]], axis=0)
        li_ref = refs[3]
        o_ref = refs[4]
        iota_w = lax.broadcasted_iota(jnp.int32, (T, W), 1)
        cols = []
        vals = []
        for kk in range(K):
            oh = (li_ref[0, :, kk][:, None] == iota_w).astype(jnp.float32)
            nb = lax.dot_general(
                oh, win, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d = jnp.sqrt(jnp.sum(nb * nb, axis=-1, keepdims=True) + 1e-12)
            cols.append(d)
            vals.append((li_ref[0, :, kk][:, None] < W))
        dist = jnp.concatenate(cols, axis=1)      # [T, K]
        valid = jnp.concatenate(vals, axis=1)
        a_ = -dist
        ref = jnp.max(jnp.where(valid, a_, -1e9), axis=-1, keepdims=True)
        z = jnp.where(valid, a_ - ref, -50.0)
        ex = jnp.exp(z) * valid.astype(jnp.float32)
        ratio = jnp.sum(ex, axis=-1, keepdims=True) / 8.0
        loss = -jnp.log(ratio + 1e-12)            # [T, 1]
        lane = lax.broadcasted_iota(jnp.int32, (T, 128), 1)
        o_ref[0] = jnp.where(lane == 0, loss, 0.0)
    grid_call(kern, jax.ShapeDtypeStruct((2, M, 128), jnp.float32),
              pl.BlockSpec((1, T, 128), lambda bb, gg: (bb, gg, 0),
                           memory_space=pltpu.VMEM))


@probe("f-bf16-in-f32-onehot")
def f():
    def kern(*refs):
        win = jnp.concatenate([r[0] for r in refs[:3]], axis=0)  # bf16
        li_ref = refs[3]
        o_ref = refs[4]
        iota_w = lax.broadcasted_iota(jnp.int32, (T, W), 1)
        for kk in range(K):
            oh = (li_ref[0, :, kk][:, None] == iota_w).astype(jnp.float32)
            nb = lax.dot_general(
                oh, win.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, kk, :] = nb
    grid_call(kern, jax.ShapeDtypeStruct((2, M, K, C), jnp.float32),
              pl.BlockSpec((1, T, K, C), lambda bb, gg: (bb, gg, 0, 0),
                           memory_space=pltpu.VMEM),
              extra_dtype=jnp.bfloat16)


@probe("g-bf16-onehot-matmul")
def g():
    def kern(*refs):
        win = jnp.concatenate([r[0] for r in refs[:3]], axis=0)  # bf16
        li_ref = refs[3]
        o_ref = refs[4]
        iota_w = lax.broadcasted_iota(jnp.int32, (T, W), 1)
        for kk in range(K):
            oh = (li_ref[0, :, kk][:, None] == iota_w).astype(jnp.bfloat16)
            nb = lax.dot_general(
                oh, win, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, kk, :] = nb
    grid_call(kern, jax.ShapeDtypeStruct((2, M, K, C), jnp.float32),
              pl.BlockSpec((1, T, K, C), lambda bb, gg: (bb, gg, 0, 0),
                           memory_space=pltpu.VMEM),
              extra_dtype=jnp.bfloat16)


@probe("h-bf16-out-store")
def h():
    def kern(*refs):
        win = jnp.concatenate([r[0] for r in refs[:3]], axis=0)
        li_ref = refs[3]
        o_ref = refs[4]
        iota_w = lax.broadcasted_iota(jnp.int32, (T, W), 1)
        for kk in range(K):
            oh = (li_ref[0, :, kk][:, None] == iota_w).astype(jnp.float32)
            nb = lax.dot_general(
                oh, win.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, kk, :] = nb.astype(jnp.bfloat16)
    grid_call(kern, jax.ShapeDtypeStruct((2, M, K, C), jnp.bfloat16),
              pl.BlockSpec((1, T, K, C), lambda bb, gg: (bb, gg, 0, 0),
                           memory_space=pltpu.VMEM),
              extra_dtype=jnp.bfloat16)


@probe("i-smem-scalar-input")
def i():
    def kern(s_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] * s_ref[0, 0]
    x = jnp.ones((T, 128), jnp.float32)
    s = jnp.ones((1, 1), jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s, x)
    jax.block_until_ready(out)


@probe("j-5d-output-block")
def j():
    def kern(*refs):
        win = jnp.concatenate([r[0] for r in refs[:3]], axis=0)
        o_ref = refs[4]
        for jj in range(3):
            o_ref[0, 0, jj] = win[jj * T:(jj + 1) * T, :]
    x = jnp.ones((2, M, C), jnp.float32)
    li = jnp.zeros((2, M, K), jnp.int32)
    out = pl.pallas_call(
        kern,
        grid=(2, G),
        in_specs=window_specs(),
        out_specs=pl.BlockSpec((1, 1, 3, T, C),
                               lambda bb, gg: (bb, gg, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, G, 3, T, C), jnp.float32),
    )(x, x, x, li)
    jax.block_until_ready(out)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for fn in [a, b, c, d, e, f, g, h, i, j]:
        fn()
    print("\n=== SUMMARY ===")
    for name, r in RESULTS:
        print(f"{name:28s} {r}")
