"""Inverse-distance-weighted KNN interpolation (upsampling).

TPU-native replacement for the reference's CUDA interpolation
(pytorch/lib/pointops/functions/pointops.py:164-178 and
interpolation_cuda_kernel.cu): weights are ``1/(d2 + 1e-8)`` normalized over
the k neighbors — note the reference weights by reciprocal **squared**
distance (knnquery returns dist2), which is reproduced here exactly.

Used by TransitionUp (k=3, pytorch/model/blocks.py:108) and MultiHead's
k=1 nearest projection (pytorch/model/heads.py:50).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.gather import batch_gather
from .knn import knn


def interpolation_weights(d2: jax.Array) -> jax.Array:
    """IDW weights from squared distances [..., k] → normalized [..., k]."""
    recip = 1.0 / (d2 + 1e-8)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def interpolate_from_idx(x: jax.Array, idx: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted gather-sum. x [B, N, C], idx [B, M, k], weights [B, M, k]
    → [B, M, C]."""
    nb = batch_gather(x, idx)  # [B, M, k, C]
    return jnp.sum(nb * weights[..., None].astype(nb.dtype), axis=-2)


def interpolate(
    p_src: jax.Array,
    p_dst: jax.Array,
    x_src: jax.Array,
    k: int = 3,
) -> jax.Array:
    """IDW-upsample features from src points onto dst points.

    p_src [B, N, 3], p_dst [B, M, 3], x_src [B, N, C] → [B, M, C].
    """
    idx, d2 = knn(p_dst, p_src, k)
    return interpolate_from_idx(x_src, idx, interpolation_weights(d2))


def nearest_interpolate(p_src: jax.Array, p_dst: jax.Array, x_src: jax.Array) -> jax.Array:
    """k=1 nearest-neighbor projection (reference MultiHead.upsample)."""
    idx, _ = knn(p_dst, p_src, 1)
    return batch_gather(x_src, idx[..., 0])
