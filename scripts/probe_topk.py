"""Decompose the ~11 ms tile-KNN cost: batched distances alone, top-k
variants alone (exact, approx, iterative argmax) on the L0 shape
[B=4, G=64, T=256, W=768]. Chained+readback timing."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from contrastboundary_tpu.utils.cache import setup_compile_cache
setup_compile_cache()

B, G, T, W = 4, 64, 256, 768


def chain_time(f, x0, iters=20, base=5, rounds=3):
    best_hi = best_lo = float("inf")
    for _ in range(rounds):
        for it, which in ((iters, "hi"), (base, "lo")):
            x = x0
            t0 = time.time()
            s = jnp.float32(0.0)
            for _ in range(it):
                s = f(x + 0.0 * s)
            _ = float(s)
            dt = time.time() - t0
            if which == "hi":
                best_hi = min(best_hi, dt)
            else:
                best_lo = min(best_lo, dt)
    return (best_hi - best_lo) / (iters - base)


def arm(name, fn, x0):
    f = jax.jit(lambda x: fn(x) * 1e-20)
    _ = float(f(x0))
    per = chain_time(f, x0)
    print(f"{name}: {per*1e3:.2f} ms", flush=True)


def iter_topk(neg, k):
    x = neg
    iota = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(x, -1)
        v = jnp.max(x, -1)
        vals.append(v)
        idxs.append(i)
        x = jnp.where(iota == i[..., None], -jnp.inf, x)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    q0 = jnp.asarray(rng.rand(B, G, T, 3).astype(np.float32))
    w0 = jnp.asarray(rng.rand(B, G, W, 3).astype(np.float32))
    d0 = jnp.asarray(rng.rand(B, G, T, W).astype(np.float32))

    def dist_only(q):
        qn = jnp.sum(q * q, -1)
        sn = jnp.sum(w0 * w0, -1)
        qs = jnp.einsum(
            "bgtc,bgwc->bgtw", q, w0,
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d2 = qn[..., None] + sn[..., None, :] - 2.0 * qs
        return jnp.sum(d2)

    arm("distances only [B,G,T,W]", dist_only, q0)
    arm("exact lax.top_k k=8", lambda d: jnp.sum(lax.top_k(d, 8)[0]), d0)
    arm("exact lax.top_k k=35", lambda d: jnp.sum(lax.top_k(d, 35)[0]), d0)
    arm("approx_max_k k=8 r.95",
        lambda d: jnp.sum(lax.approx_max_k(d, 8, recall_target=0.95)[0]), d0)
    arm("approx_max_k k=35 r.95",
        lambda d: jnp.sum(lax.approx_max_k(d, 35, recall_target=0.95)[0]), d0)
    arm("iterative argmax k=8", lambda d: jnp.sum(iter_topk(d, 8)[0]), d0)
    # 2-stage exact: per-128-chunk top-k then merge (exact)
    def chunked(d, k):
        xc = d.reshape(B, G, T, W // 128, 128)
        vc, ic = lax.top_k(xc, k)
        ic = ic + (jnp.arange(W // 128, dtype=ic.dtype) * 128)[:, None]
        vf, sel = lax.top_k(vc.reshape(B, G, T, -1), k)
        return vf
    arm("chunked-exact k=8", lambda d: jnp.sum(chunked(d, 8)), d0)
    # bf16 distance variant: top_k on bf16 keys (half the sort traffic)
    arm("exact lax.top_k k=8 bf16",
        lambda d: jnp.sum(lax.top_k(d.astype(jnp.bfloat16), 8)[0].astype(jnp.float32)), d0)
    arm("exact lax.top_k k=35 bf16",
        lambda d: jnp.sum(lax.top_k(d.astype(jnp.bfloat16), 35)[0].astype(jnp.float32)), d0)


if __name__ == "__main__":
    main()
