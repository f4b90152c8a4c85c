"""Point subsampling: exact FPS, bucketed (TPU-parallel) FPS, and
space-filling-curve serialized sampling.

TPU-native replacement for the reference's CUDA farthest-point sampling
(pytorch/lib/pointops/src/sampling/sampling_cuda_kernel.cu, used by
TransitionDown at pytorch/model/blocks.py:69). Exact FPS is a sequential
argmax chain — hostile to a wide vector machine — so the default production
path is *bucketed FPS*: points are sorted along a Morton space-filling curve,
split into G spatially-coherent buckets, and G independent FPS runs execute in
parallel via `vmap` (G-way parallel, G× fewer sequential steps). Coverage is
near-identical to exact FPS because buckets are spatially compact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _part1by2(x: jax.Array) -> jax.Array:
    """Spread the low 10 bits of x so there are 2 zero bits between each."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_code(points: jax.Array, bits: int = 10) -> jax.Array:
    """Morton (Z-order) code per point. points [..., N, 3] → [..., N] uint32.

    Coordinates are normalized per cloud to the unit cube then quantized to
    ``bits`` bits per axis.
    """
    mn = jnp.min(points, axis=-2, keepdims=True)
    mx = jnp.max(points, axis=-2, keepdims=True)
    scale = jnp.maximum(mx - mn, 1e-6)
    g = (points - mn) / scale * (2**bits - 1)
    g = jnp.clip(g, 0, 2**bits - 1).astype(jnp.uint32)
    return (
        _part1by2(g[..., 0]) | (_part1by2(g[..., 1]) << 1) | (_part1by2(g[..., 2]) << 2)
    )


def serialized_order(points: jax.Array) -> jax.Array:
    """Morton-sort order of a batch of clouds. points [B, N, 3] → [B, N] int32."""
    code = morton_code(points)
    return jnp.argsort(code, axis=-1).astype(jnp.int32)


def _fps_single(points: jax.Array, m: int, start: int = 0) -> jax.Array:
    """Exact farthest point sampling for one cloud. points [N,3] → idx [m].

    Matches the reference CUDA kernel's greedy recurrence: start from point 0,
    repeatedly take the point maximizing the min-distance to the selected set.
    """
    n = points.shape[0]
    pf = points.astype(jnp.float32)

    def body(i, carry):
        mind2, idx, last = carry
        d2 = jnp.sum((pf - pf[last]) ** 2, axis=-1)
        mind2 = jnp.minimum(mind2, d2)
        nxt = jnp.argmax(mind2).astype(jnp.int32)
        idx = idx.at[i].set(nxt)
        return mind2, idx, nxt

    idx0 = jnp.zeros((m,), jnp.int32).at[0].set(start)
    mind2 = jnp.full((n,), jnp.inf, jnp.float32)
    _, idx, _ = lax.fori_loop(1, m, body, (mind2, idx0, jnp.int32(start)))
    return idx


@functools.partial(jax.jit, static_argnames=("m",))
def fps(points: jax.Array, m: int) -> jax.Array:
    """Exact batched FPS. points [B, N, 3] → idx [B, m] int32."""
    return jax.vmap(lambda p: _fps_single(p, m))(points)


@functools.partial(jax.jit, static_argnames=("m", "num_buckets"))
def bucket_fps(points: jax.Array, m: int, num_buckets: int = 64) -> jax.Array:
    """Bucketed FPS: Morton-sort, split into ``num_buckets`` contiguous
    (spatially coherent) groups, run FPS within each group in parallel.

    points [B, N, 3] → idx [B, m] int32 (indices into the original order).
    Requires N % num_buckets == 0 and m % num_buckets == 0.
    """
    b, n, _ = points.shape
    g = num_buckets
    if n % g or m % g:
        raise ValueError(f"N={n} and m={m} must be divisible by num_buckets={g}")
    per = n // g
    m_per = m // g

    order = serialized_order(points)  # [B, N]
    sorted_pts = jax.vmap(lambda p, o: p[o])(points, order)
    grouped = sorted_pts.reshape(b, g, per, 3)
    local = jax.vmap(jax.vmap(lambda p: _fps_single(p, m_per)))(grouped)  # [B,G,m_per]
    order_g = order.reshape(b, g, per)
    picked = jnp.take_along_axis(order_g, local, axis=-1)  # [B, G, m_per]
    return picked.reshape(b, m)


@functools.partial(jax.jit, static_argnames=("m",))
def serialized_sample(points: jax.Array, m: int) -> jax.Array:
    """Strided pick along the Morton curve — O(N log N), fully parallel.
    points [B, N, 3] → idx [B, m]. Near-uniform spatial coverage."""
    n = points.shape[1]
    order = serialized_order(points)
    stride_idx = jnp.linspace(0, n - 1, m).round().astype(jnp.int32)
    return order[:, stride_idx]


@functools.partial(jax.jit, static_argnames=("m", "voxel_size"))
def voxel_sample(points: jax.Array, m: int, voxel_size: float) -> jax.Array:
    """Grid subsample to a fixed m: one representative point per occupied
    voxel, padded (when fewer voxels than m) or uniformly thinned along the
    hash curve (when more) via a linspace pick over the first-occurrences.

    The fixed-shape stand-in for the reference's data-dependent grid
    subsampling (tensorflow/ops/tf_custom_ops/tf_subsampling — voxel count
    varies per cloud); padding repeats real points so no masks are needed
    downstream. points [B, N, 3] → idx [B, m] int32.
    """
    from .voxel import voxelize_indices

    def one(p):
        n = p.shape[0]
        h = voxelize_indices(p, voxel_size)
        order = jnp.argsort(h)
        hs = h[order]
        first = jnp.concatenate([jnp.ones((1,), bool), hs[1:] != hs[:-1]])
        count = jnp.sum(first.astype(jnp.int32))
        # positions of first-occurrences packed to the front, via scatter
        # (a second argsort here compiles very slowly on the TPU backend);
        # non-first rows all land in slot n-1, which j never reads since
        # j < count ≤ n-1 whenever any voxel holds >1 point.
        rank = jnp.cumsum(first.astype(jnp.int32)) - 1
        slot = jnp.where(first, rank, n - 1)
        first_pos = (
            jnp.zeros((n,), jnp.int32)
            .at[slot]
            .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
        )
        j = (jnp.arange(m) * count) // m  # in [0, count)
        return order[first_pos[j]].astype(jnp.int32)

    return jax.vmap(one)(points)


def random_sample(key: jax.Array, batch: int, n: int, m: int) -> jax.Array:
    """Uniform random sample without replacement. → idx [B, m]."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: jax.random.choice(k, n, (m,), replace=False))(keys)
