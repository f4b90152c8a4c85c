"""Mosaic probe round 4: the [T,128] lane-masked broadcast write is the
suspect (probe3 e1 fails with a LINEAR tail). Find a passing way to emit
per-point [T,1] results, and check transcendentals with [T,K] outputs."""
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


def tail_call(tail, lanes):
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
        out_specs=pl.BlockSpec((1, T, lanes), lambda bb, gg: (bb, gg, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, M, lanes), jnp.float32),
    )(x, x, x, li)
    jax.block_until_ready(out)
    return out


@probe("e6-loss-mask-concat-K-lanes")
def e6():
    """softnn tail, outputs loss|mask in a [T, K]-lane block via concat."""
    def tail(dist, valid):
        vf = valid.astype(jnp.float32)
        a_ = -dist
        ref = jnp.max(jnp.where(valid, a_, -1e9), axis=-1, keepdims=True)
        z = jnp.where(valid, a_ - ref, -50.0)
        ex = jnp.exp(z) * vf
        p = jnp.sum(ex * 0.5, -1, keepdims=True)
        n = jnp.sum(ex, -1, keepdims=True)
        loss = -jnp.log(p / jnp.maximum(n, 1e-12) + 1e-12)
        mask = (jnp.sum(vf, -1, keepdims=True) > 0).astype(jnp.float32)
        pad = jnp.zeros((T, K - 2), jnp.float32)
        return jnp.concatenate([loss * mask, mask, pad], axis=1)
    tail_call(tail, K)


@probe("e7-broadcast-to-128-no-where")
def e7():
    def tail(dist, valid):
        loss = jnp.sum(dist * valid.astype(jnp.float32), -1, keepdims=True)
        return jnp.broadcast_to(loss, (T, 128))
    tail_call(tail, 128)


@probe("e8-concat-zeros-128")
def e8():
    def tail(dist, valid):
        loss = jnp.sum(dist * valid.astype(jnp.float32), -1, keepdims=True)
        return jnp.concatenate([loss, jnp.zeros((T, 127), jnp.float32)], 1)
    tail_call(tail, 128)


@probe("e9-where-lane-on-K")
def e9():
    """the exact where(lane==0) pattern but on K lanes instead of 128."""
    def tail(dist, valid):
        loss = jnp.sum(dist * valid.astype(jnp.float32), -1, keepdims=True)
        lane = lax.broadcasted_iota(jnp.int32, (T, K), 1)
        return jnp.where(lane == 0, loss, 0.0)
    tail_call(tail, K)


@probe("e10-full-softnn-K-lanes-value-check")
def e10():
    def tail(dist, valid):
        vf = valid.astype(jnp.float32)
        a_ = -dist
        ref = jnp.max(jnp.where(valid, a_, -1e9), axis=-1, keepdims=True)
        z = jnp.where(valid, a_ - ref, -50.0)
        ex = jnp.exp(z) * vf
        p = jnp.sum(ex * 0.5, -1, keepdims=True)
        n = jnp.sum(ex, -1, keepdims=True)
        loss = -jnp.log(p / jnp.maximum(n, 1e-12) + 1e-12)
        pad = jnp.zeros((T, K - 1), jnp.float32)
        return jnp.concatenate([loss, pad], axis=1)
    out = tail_call(tail, K)
    v = np.asarray(out)[0, :, 0]
    expect = -np.log(0.5)
    assert np.allclose(v, expect, atol=1e-5), (v[:4], expect)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for fn in [e6, e7, e8, e9, e10]:
        fn()
    print("\n=== SUMMARY ===")
    for name, r in RESULTS:
        print(f"{name:36s} {r}")
