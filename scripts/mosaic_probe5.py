"""Mosaic probe round 5: per-k [T,1] RUNNING accumulators (elementwise max /
sum, no lane reduction over concatenated tensors) + narrow output stores.
If r2/r3 pass, a full softnn tail is expressible without the failing
constructs."""
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


def run_kern(kern, lanes):
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


def per_k_cols(refs):
    win = jnp.concatenate([r[0] for r in refs[:3]], axis=0)
    li_ref = refs[3]
    iota_w = lax.broadcasted_iota(jnp.int32, (T, W), 1)
    for kk in range(K):
        oh = (li_ref[0, :, kk][:, None] == iota_w).astype(jnp.float32)
        nb = lax.dot_general(
            oh, win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d = jnp.sqrt(jnp.sum(nb * nb, -1, keepdims=True) + 1e-12)
        v = (li_ref[0, :, kk][:, None] < W).astype(jnp.float32)
        yield d, v


@probe("r1-reduce-over-concat")
def r1():
    def kern(*refs):
        o_ref = refs[4]
        cols = [d for d, v in per_k_cols(refs)]
        cat = jnp.concatenate(cols, axis=1)
        s = jnp.sum(cat, -1, keepdims=True)
        o_ref[0] = cat + s
    run_kern(kern, K)


@probe("r2-running-softnn-colstore")
def r2():
    def kern(*refs):
        o_ref = refs[4]
        items = list(per_k_cols(refs))
        ref = jnp.full((T, 1), -1e9)
        for d, v in items:
            ref = jnp.maximum(ref, jnp.where(v > 0, -d, -1e9))
        p = jnp.zeros((T, 1))
        n = jnp.zeros((T, 1))
        for d, v in items:
            e = jnp.exp(jnp.where(v > 0, -d - ref, -50.0)) * v
            p = p + e * 0.5
            n = n + e
        loss = -jnp.log(p / jnp.maximum(n, 1e-12) + 1e-12)
        o_ref[0, :, 0:1] = loss
        o_ref[0, :, 1:2] = n
        for j in range(2, K):
            o_ref[0, :, j:j + 1] = jnp.zeros((T, 1))
    out = run_kern(kern, K)
    v = np.asarray(out)[0, :, 0]
    assert np.allclose(v, -np.log(0.5), atol=1e-5), v[:4]


@probe("r3-out-lane1")
def r3():
    def kern(*refs):
        o_ref = refs[4]
        acc = jnp.zeros((T, 1))
        for d, v in per_k_cols(refs):
            acc = acc + d * v
        o_ref[0] = acc
    run_kern(kern, 1)


@probe("r4-running-concat-out")
def r4():
    """per-k cols adjusted by a RUNNING [T,1] (no reduce over concat),
    emitted as [T,K] — what a fused-attention softmax needs."""
    def kern(*refs):
        o_ref = refs[4]
        items = list(per_k_cols(refs))
        ref = jnp.full((T, 1), -1e9)
        for d, v in items:
            ref = jnp.maximum(ref, jnp.where(v > 0, -d, -1e9))
        n = jnp.zeros((T, 1))
        es = []
        for d, v in items:
            e = jnp.exp(jnp.where(v > 0, -d - ref, -50.0)) * v
            es.append(e)
            n = n + e
        cols = [e / jnp.maximum(n, 1e-12) for e in es]
        o_ref[0] = jnp.concatenate(cols, axis=1)
    out = run_kern(kern, K)
    v = np.asarray(out)[0]
    assert np.allclose(v.sum(-1), 1.0, atol=1e-5)


@probe("r5-weighted-sum-matmul-out-C")
def r5():
    """attention-shaped: softmax weights (running accumulators) x per-k
    gathered values summed into [T, C] output."""
    def kern(*refs):
        win = jnp.concatenate([r[0] for r in refs[:3]], axis=0)
        li_ref = refs[3]
        o_ref = refs[4]
        iota_w = lax.broadcasted_iota(jnp.int32, (T, W), 1)
        nbs, ds, vs = [], [], []
        for kk in range(K):
            oh = (li_ref[0, :, kk][:, None] == iota_w).astype(jnp.float32)
            nb = lax.dot_general(
                oh, win, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            nbs.append(nb)
            ds.append(jnp.sqrt(jnp.sum(nb * nb, -1, keepdims=True) + 1e-12))
            vs.append((li_ref[0, :, kk][:, None] < W).astype(jnp.float32))
        ref = jnp.full((T, 1), -1e9)
        for d, v in zip(ds, vs):
            ref = jnp.maximum(ref, jnp.where(v > 0, -d, -1e9))
        n = jnp.zeros((T, 1))
        es = []
        for d, v in zip(ds, vs):
            e = jnp.exp(jnp.where(v > 0, -d - ref, -50.0)) * v
            es.append(e)
            n = n + e
        acc = jnp.zeros((T, C))
        for e, nb in zip(es, nbs):
            acc = acc + (e / jnp.maximum(n, 1e-12)) * nb
        o_ref[0] = acc
    x = jnp.ones((2, M, C), jnp.float32)
    li = jnp.zeros((2, M, K), jnp.int32)
    out = pl.pallas_call(
        kern,
        grid=(2, G),
        in_specs=window_specs(),
        out_specs=pl.BlockSpec((1, T, C), lambda bb, gg: (bb, gg, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, M, C), jnp.float32),
    )(x, x, x, li)
    jax.block_until_ready(out)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for fn in [r2, r3, r4, r5]:
        fn()
    print("\n=== SUMMARY ===")
    for name, r in RESULTS:
        print(f"{name:36s} {r}")
