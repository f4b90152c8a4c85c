"""Voxel-grid subsampling as a fixed-shape device op.

TPU-native replacement for the reference's C++ grid subsampling
(tensorflow/ops/cpp_wrappers/cpp_subsampling/grid_subsampling/grid_subsampling.cpp:5-106
and the batched TF op tf_subsampling/tf_batch_subsampling.cpp): per occupied
voxel, the output point is the **barycenter** of its member points, features
are averaged, and the label is the **majority vote** — reproduced here as
hash → sort → segment-reduce with a static output cap `max_voxels`
(padded slots are masked).

The data-dependent number of occupied voxels is the reference's fundamental
dynamic shape; here overflow voxels beyond `max_voxels` are dropped (the cap
is calibrated from data like the reference's `neighborhood_limits`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_GRID = 2048  # per-axis hash grid; clouds spanning > GRID*dl alias (masked ok)


def voxelize_indices(points: jax.Array, voxel_size: float) -> jax.Array:
    """Integer voxel hash per point. points [..., N, 3] → [..., N] int32."""
    return _hash(points, voxel_size)


def _hash(points: jax.Array, voxel_size: float) -> jax.Array:
    mn = jnp.min(points, axis=-2, keepdims=True)
    v = jnp.floor((points - mn) / voxel_size).astype(jnp.int32)
    v = jnp.clip(v, 0, _GRID - 1)
    return (v[..., 0] * _GRID + v[..., 1]) * _GRID + v[..., 2]


def _voxel_single(p, feats, labels, voxel_size, max_voxels, num_classes):
    n = p.shape[0]
    h = _hash(p[None], voxel_size)[0]  # [N]
    order = jnp.argsort(h)
    hs = h[order]
    first = jnp.concatenate([jnp.ones((1,), bool), hs[1:] != hs[:-1]])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # [N] segment id per sorted point
    seg = jnp.where(seg < max_voxels, seg, max_voxels)  # overflow → slot M (dropped)

    ps = p[order]
    num_seg = max_voxels + 1
    cnt = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), seg, num_seg)[:max_voxels]
    pt_sum = jax.ops.segment_sum(ps, seg, num_seg)[:max_voxels]
    denom = jnp.maximum(cnt, 1.0)[:, None]
    out_p = pt_sum / denom

    out_f = None
    if feats is not None:
        fs = feats[order]
        out_f = jax.ops.segment_sum(fs, seg, num_seg)[:max_voxels] / denom

    out_l = None
    if labels is not None:
        ls = labels[order]
        oh = jax.nn.one_hot(ls, num_classes, dtype=jnp.float32)  # -1 → zeros
        votes = jax.ops.segment_sum(oh, seg, num_seg)[:max_voxels]
        out_l = jnp.argmax(votes, axis=-1).astype(jnp.int32)
        # empty slots AND voxels whose members are all ignore-labeled → -1
        # (matches native/_grid_subsample_np)
        out_l = jnp.where(jnp.sum(votes, axis=-1) > 0, out_l, -1)

    mask = cnt > 0
    return out_p, out_f, out_l, mask


@functools.partial(
    jax.jit, static_argnames=("voxel_size", "max_voxels", "num_classes")
)
def voxel_grid_subsample(
    points: jax.Array,
    features: jax.Array | None = None,
    labels: jax.Array | None = None,
    *,
    voxel_size: float,
    max_voxels: int,
    num_classes: int = 0,
):
    """Batched voxel-grid subsample.

    Args:
      points:   [B, N, 3].
      features: optional [B, N, C] (averaged per voxel).
      labels:   optional [B, N] int (majority vote per voxel; requires
                num_classes > 0).
      voxel_size: grid cell edge (the reference's `sampleDl`).
      max_voxels: static output size M; overflow voxels dropped.

    Returns:
      (points [B, M, 3], features [B, M, C] | None, labels [B, M] | None,
       mask [B, M] bool — True for occupied slots).
    """
    f = lambda p, x, l: _voxel_single(p, x, l, voxel_size, max_voxels, num_classes)
    if features is None and labels is None:
        return jax.vmap(lambda p: f(p, None, None))(points)
    if features is None:
        return jax.vmap(lambda p, l: f(p, None, l))(points, labels)
    if labels is None:
        return jax.vmap(lambda p, x: f(p, x, None))(points, features)
    return jax.vmap(f)(points, features, labels)
