"""Probe the deployment's remote Mosaic compiler (axon tpu_compile_helper).

Round-2 finding (ops/pallas/cbl_tile.py docstring): every constituent
construct compiled in isolation, but any real combination got an
undiagnosed HTTP 500. This probe re-tests a ladder of kernels from trivial
to the fused-CBL shape to find today's breaking boundary.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/mosaic_probe.py
"""
import functools
import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from contrastboundary_tpu.utils.cache import setup_compile_cache
setup_compile_cache()

T, W, C, K = 256, 768, 64, 8
RESULTS = []


def probe(name):
    def deco(fn):
        def run():
            try:
                fn()
                RESULTS.append((name, "PASS"))
                print(f"[PASS] {name}", flush=True)
            except Exception as e:
                msg = f"{type(e).__name__}: {str(e)[:300]}"
                RESULTS.append((name, f"FAIL {msg}"))
                print(f"[FAIL] {name}: {msg}", flush=True)
        return run
    return deco


@probe("trivial-copy")
def p0():
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.ones((T, 128), jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    jax.block_until_ready(out)


@probe("onehot-matmul-single")
def p1():
    def kern(li_ref, win_ref, o_ref):
        iota_w = lax.broadcasted_iota(jnp.int32, (T, W), 1)
        oh = (li_ref[:, 0][:, None] == iota_w).astype(jnp.float32)
        o_ref[:] = lax.dot_general(
            oh, win_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    li = jnp.zeros((T, K), jnp.int32)
    win = jnp.ones((W, C), jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(li, win)
    jax.block_until_ready(out)


@probe("gather-k-loop-bf16")
def p2():
    def kern(li_ref, win_ref, o_ref):
        iota_w = lax.broadcasted_iota(jnp.int32, (T, W), 1)
        for kk in range(K):
            oh = (li_ref[:, kk][:, None] == iota_w).astype(jnp.bfloat16)
            o_ref[:, kk, :] = lax.dot_general(
                oh, win_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

    li = jnp.zeros((T, K), jnp.int32)
    win = jnp.ones((W, C), jnp.bfloat16)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, K, C), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(li, win)
    jax.block_until_ready(out)


@probe("gather-grid-blockspec")
def p3():
    G = 4
    M = G * T

    def kern(*refs):
        win_refs = refs[:3]
        li_ref = refs[3]
        o_ref = refs[4]
        win = jnp.concatenate([r[0] for r in win_refs], axis=0)  # [W, C]
        iota_w = lax.broadcasted_iota(jnp.int32, (T, W), 1)
        for kk in range(K):
            oh = (li_ref[0, :, kk][:, None] == iota_w).astype(jnp.float32)
            o_ref[0, :, kk, :] = lax.dot_general(
                oh, win, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

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
    x = jnp.ones((2, M, C), jnp.float32)
    li = jnp.zeros((2, M, K), jnp.int32)
    out = pl.pallas_call(
        kern,
        grid=(2, G),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, T, K, C), lambda bb, gg: (bb, gg, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, M, K, C), jnp.float32),
    )(x, x, x, li)
    jax.block_until_ready(out)


@probe("softmax-exp-reduce")
def p4():
    def kern(x_ref, o_ref):
        v = x_ref[:]
        m = jnp.max(v, axis=-1, keepdims=True)
        e = jnp.exp(v - m)
        o_ref[:] = e / jnp.sum(e, axis=-1, keepdims=True)

    x = jnp.ones((T, 128), jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    jax.block_until_ready(out)


@probe("cbl-fwd-kernel-tiny")
def p5():
    from contrastboundary_tpu.ops.pallas.cbl_tile import cbl_tile_softnn

    b, m, ncls, c, k = 1, 512, 13, 16, 8
    tile, width = 256, 2
    fused = jnp.asarray(np.random.rand(b, m, ncls + c).astype(np.float32))
    li = jnp.asarray(
        np.random.randint(0, width * tile + 1, (b, m, k)).astype(np.int32)
    )
    ls, ms = cbl_tile_softnn(fused, li, ncls, 1.0, tile, width, 0)
    jax.block_until_ready(ls)


@probe("cbl-fwd-kernel-flagship-shape")
def p6():
    from contrastboundary_tpu.ops.pallas.cbl_tile import cbl_tile_softnn

    b, m, ncls, c, k = 1, 16384, 13, 32, 35
    tile, width = 256, 3
    fused = jnp.asarray(np.random.rand(b, m, ncls + c).astype(np.float32))
    li = jnp.asarray(
        np.random.randint(0, width * tile + 1, (b, m, k)).astype(np.int32)
    )
    ls, ms = cbl_tile_softnn(fused, li, ncls, 1.0, tile, width, 1)
    jax.block_until_ready(ls)


@probe("cbl-bwd-kernel-tiny")
def p7():
    from contrastboundary_tpu.ops.pallas.cbl_tile import cbl_tile_softnn

    b, m, ncls, c, k = 1, 512, 13, 16, 8
    tile, width = 256, 2
    fused = jnp.asarray(np.random.rand(b, m, ncls + c).astype(np.float32))
    li = jnp.asarray(
        np.random.randint(0, width * tile + 1, (b, m, k)).astype(np.int32)
    )

    def loss(f):
        ls, ms = cbl_tile_softnn(f, li, ncls, 1.0, tile, width, 0)
        return jnp.sum(ls) / jnp.maximum(jnp.sum(ms), 1.0)

    g = jax.grad(loss)(fused)
    jax.block_until_ready(g)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for fn in [p0, p1, p2, p3, p4, p5, p6, p7]:
        fn()
    print("\n=== SUMMARY ===")
    for name, r in RESULTS:
        print(f"{name:36s} {r}")
