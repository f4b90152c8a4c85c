"""Pyramid cost probe — axon-proof timing.

Round-3 finding: on this deployment `jax.block_until_ready` does NOT wait
(an independent-call loop measures enqueue only — pyramid arms read
"0.0 ms"). Only a host readback synchronizes, and a single readback costs
O(100 ms) of tunnel latency. So: CHAIN iterations by data dependence,
readback once, and difference two chain lengths to cancel the readback.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from contrastboundary_tpu.utils.cache import setup_compile_cache
setup_compile_cache()

from contrastboundary_tpu.ops import PyramidSpec, build_pyramid

B, N = 4, 16384


def pyr_scalar(pts, sp):
    pyr = build_pyramid(pts, sp)
    leaves = [x for x in jax.tree.leaves(pyr) if hasattr(x, "dtype")]
    return sum(jnp.sum(l[..., -1].astype(jnp.float32)) for l in leaves)


def chain_time(f, p0, iters, rounds=3):
    """min over rounds of [time to run `iters` data-chained f's + readback]"""
    best = float("inf")
    for _ in range(rounds):
        p = p0
        t0 = time.time()
        s = jnp.float32(0.0)
        for _ in range(iters):
            s = f(p + 0.0 * s)  # data dependence on the previous result
        _ = float(s)  # host readback = the only real sync
        best = min(best, time.time() - t0)
    return best


def probe(name, sp, p0):
    f = jax.jit(lambda p: pyr_scalar(p, sp) * 1e-20)
    _ = float(f(p0))  # compile + first-readback channel sync
    t20 = chain_time(f, p0, 20)
    t5 = chain_time(f, p0, 5)
    per = (t20 - t5) / 15
    print(f"{name}: {per*1e3:.1f} ms/call "
          f"(chain20 {t20*1e3:.0f} ms, chain5 {t5*1e3:.0f} ms)", flush=True)
    return per


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    p0 = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 4.0)
    probe("backbone only", PyramidSpec(layout="sorted", sampler="strided"), p0)
    probe(
        "full (contrast+subscene)",
        PyramidSpec(
            k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
            layout="sorted", sampler="strided",
        ),
        p0,
    )


if __name__ == "__main__":
    main()
