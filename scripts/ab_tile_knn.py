"""A/B: sequential lax.map tile self-KNN (current) vs fully-batched
variants, and top-k strategies (batched lax.top_k vs exact hierarchical
chunked top-k). Chained+readback timing (block_until_ready is a no-op on
this deployment — see probe_pyramid.py).
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from contrastboundary_tpu.utils.cache import setup_compile_cache
setup_compile_cache()

from contrastboundary_tpu.core.gather import batch_gather
from contrastboundary_tpu.ops.knn import tile_self_knn
from contrastboundary_tpu.ops.sampling import serialized_order

B, N = 4, 16384


def _window_blocks(x, tile, width, starts_np):
    """x [B, M, C] -> [B, G, W, C] window blocks (static tile-level gather)."""
    b, m, c = x.shape
    g = m // tile
    xt = x.reshape(b, g, tile, c)
    win = xt[:, jnp.asarray(starts_np)[:, None] + jnp.arange(width)[None, :]]
    return win.reshape(b, g, width * tile, c)


def _chunked_exact_topk(neg_d2, k, chunk=128):
    """Exact top-k over the last axis via per-chunk top-k + final merge.
    top-k(union of chunkwise top-k) == global top-k, exactly."""
    *lead, w = neg_d2.shape
    if w <= chunk or k >= chunk:
        return lax.top_k(neg_d2, k)
    nch = -(-w // chunk)
    pad = nch * chunk - w
    x = neg_d2
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((*lead, pad), -jnp.inf, x.dtype)], axis=-1
        )
    xc = x.reshape(*lead, nch, chunk)
    vc, ic = lax.top_k(xc, k)  # [..., nch, k]
    ic = ic + (jnp.arange(nch, dtype=ic.dtype) * chunk)[:, None]
    vu = vc.reshape(*lead, nch * k)
    iu = ic.reshape(*lead, nch * k)
    vf, sel = lax.top_k(vu, k)
    return vf, jnp.take_along_axis(iu, sel, axis=-1)


def batched_tile_self_knn(points, k, tile, window, exclude_self,
                          ensure_self, topk):
    """Map-free tile self-KNN: one batched distance einsum [B,G,T,W] and one
    batched top-k. Same contract as ops/knn.py::tile_self_knn(assume_sorted)."""
    b, m, _ = points.shape
    g = m // tile
    width = min(2 * window + 1, g)
    w_sz = width * tile
    starts = np.clip(np.arange(g) - window, 0, g - width)

    q = points.reshape(b, g, tile, 3).astype(jnp.float32)
    win = _window_blocks(points, tile, width, starts).astype(jnp.float32)
    qn = jnp.sum(q * q, axis=-1)
    sn = jnp.sum(win * win, axis=-1)
    qs = jnp.einsum(
        "bgtc,bgwc->bgtw", q, win,
        precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )
    d2 = jnp.maximum(qn[..., None] + sn[..., None, :] - 2.0 * qs, 0.0)

    row = lax.broadcasted_iota(jnp.int32, (g, tile, 1), 1)
    self_pos = (
        jnp.arange(g, dtype=jnp.int32)[:, None, None] * tile + row
        - jnp.asarray(starts * tile, jnp.int32)[:, None, None]
    )  # [G, T, 1]
    if exclude_self:
        cidx = lax.broadcasted_iota(jnp.int32, (g, tile, w_sz), 2)
        d2 = jnp.where((cidx == self_pos)[None], jnp.inf, d2)
    neg, ci = topk(-d2, k)
    if ensure_self:
        ci = ci.at[..., 0].set(self_pos[None, ..., 0])
        neg = neg.at[..., 0].set(0.0)
    li = jnp.where(jnp.isinf(neg), w_sz, ci)
    return li.reshape(b, m, k)


def chain_time(f, p0, iters=20, base=5, rounds=3):
    best_hi = best_lo = float("inf")
    for _ in range(rounds):
        for it, which in ((iters, "hi"), (base, "lo")):
            p = p0
            t0 = time.time()
            s = jnp.float32(0.0)
            for _ in range(it):
                s = f(p + 0.0 * s)
            _ = float(s)
            dt = time.time() - t0
            if which == "hi":
                best_hi = min(best_hi, dt)
            else:
                best_lo = min(best_lo, dt)
    return (best_hi - best_lo) / (iters - base)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    p_raw = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 4.0)
    sp = batch_gather(p_raw, serialized_order(p_raw))
    sp = jax.block_until_ready(sp)

    cases = [("self k=8", 8, False, True), ("contrast k=35", 35, True, False)]
    for cname, k, excl, ens in cases:
        def cur(p, k=k, excl=excl, ens=ens):
            _, li, _ = tile_self_knn(
                p, k, tile=256, window=1, exclude_self=excl,
                ensure_self=ens, recall=0.95, assume_sorted=True,
            )
            return jnp.sum(li.astype(jnp.float32)) * 1e-20

        def bat_topk(p, k=k, excl=excl, ens=ens):
            li = batched_tile_self_knn(p, k, 256, 1, excl, ens, lax.top_k)
            return jnp.sum(li.astype(jnp.float32)) * 1e-20

        def bat_chunk(p, k=k, excl=excl, ens=ens):
            li = batched_tile_self_knn(
                p, k, 256, 1, excl, ens, _chunked_exact_topk
            )
            return jnp.sum(li.astype(jnp.float32)) * 1e-20

        # parity check (exact arms must agree on CPU-identical input)
        a = batched_tile_self_knn(sp, k, 256, 1, excl, ens, lax.top_k)
        c = batched_tile_self_knn(sp, k, 256, 1, excl, ens,
                                  _chunked_exact_topk)
        eq = float(jnp.mean((a == c).astype(jnp.float32)))
        print(f"[{cname}] batched-topk vs chunked parity: {eq:.4f}",
              flush=True)

        for name, fn in (("lax.map (current)", cur),
                         ("batched lax.top_k", bat_topk),
                         ("batched chunked-exact", bat_chunk)):
            f = jax.jit(fn)
            _ = float(f(sp))
            per = chain_time(f, sp)
            print(f"[{cname}] {name}: {per*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
