"""Pluggable local-aggregation operators (the ConvNet family's conv).

Functional equivalents of tensorflow/models/local_aggregation_operators.py:
  PosPool          (:15-249)  — position-embedding-weighted pooling
  Identity         (:252-313) — center feature passthrough
  AdaptiveWeight   (:316-500) — MLP-predicted neighbor weights (± softmax)
  PointWiseMLP     (:503-617) — PointNet++-style set MLP + pool
  PseudoGrid/KPConv(:620-745) — kernel-point influence conv (depthwise)
batched dense `[B, M, K]` with shadow-index masking (idx == N → invalid):
masked mean divides by the valid count, masked max adds −65535, softmax
variants run masked — numerically identical to the reference's shadow-row
machinery without any concatenated fake rows.

All relative positions are normalized by the ball radius (d/r), as in the
reference (local_aggregation_operators.py:72).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.gather import shadow_gather
from ..core.masking import masked_softmax

Dtype = Any
_NEG = -65535.0


def _bn(train: bool, momentum: float, eps: float, name: str,
        model_dtype=None):
    from .blocks import _bn_dtype

    return nn.BatchNorm(
        use_running_average=not train, momentum=momentum, epsilon=eps,
        dtype=_bn_dtype(model_dtype), name=name,
    )


def _gather_geometry(p_query, p_support, nb_idx, radius):
    """Shadow-masked neighbor geometry: relative position normalized by
    radius, distances, direction, valid mask."""
    nb_p, valid = shadow_gather(p_support, nb_idx, fill=0.0)
    rel = (nb_p - p_query[:, :, None, :]) / radius
    rel = jnp.where(valid[..., None], rel, 0.0)
    dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1, keepdims=True))
    direction = rel / (dist + 1e-6)
    return rel, dist, direction, valid


def _reduce(agg, valid, reduction: str):
    """Masked reduction over the neighbor axis (axis=2). agg [B,M,K,C]."""
    if reduction == "sum":
        return jnp.sum(agg, axis=2)
    if reduction in ("mean", "avg"):
        s = jnp.sum(agg, axis=2)
        cnt = jnp.sum(valid.astype(agg.dtype), axis=2, keepdims=False)[..., None]
        return s / (cnt + 1e-5)
    if reduction == "max":
        neg = jnp.asarray(_NEG, agg.dtype)
        return jnp.max(jnp.where(valid[..., None], agg, neg), axis=2)
    raise ValueError(f"unknown reduction {reduction!r}")


def _sincos_embedding(rel, fdim):
    """Sinusoidal position embedding (PosPool 'sin_cos',
    local_aggregation_operators.py:117-148). rel [B,M,K,3] → [B,M,K,fdim]."""
    feat_dim = max(fdim // 6, 1)
    wave_length, alpha = 1000.0, 100.0
    feat_range = jnp.arange(feat_dim, dtype=jnp.float32)
    dim_mat = jnp.power(wave_length, feat_range / feat_dim)
    pos = (alpha * rel)[..., None] / dim_mat  # [B,M,K,3,feat_dim]
    emb = jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], axis=-1)
    emb = emb.reshape(rel.shape[:-1] + (6 * feat_dim,))
    if fdim == 9:
        emb = jnp.concatenate([emb, rel], axis=-1)
    return emb


class PosPoolAgg(nn.Module):
    """Parameter-free position-weighted pooling + optional output conv."""

    out_fdim: int
    position_embedding: str = "sin_cos"
    reduction: str = "mean"
    output_conv: bool = False
    bn_momentum: float = 0.99
    bn_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, p_query, p_support, nb_idx, features, radius, train=True):
        fdim = features.shape[-1]
        nb_f, valid = shadow_gather(features, nb_idx, fill=0.0)
        rel, dist, direction, valid = _gather_geometry(
            p_query, p_support, nb_idx, radius
        )

        pe = self.position_embedding
        if pe == "one":
            prior, mid = jnp.ones_like(dist), 1
        elif pe == "xyz":
            prior, mid = rel, 3
        elif pe == "distance":
            prior, mid = dist, 1
        elif pe == "exp_-d":
            prior, mid = jnp.exp(-dist), 1
        elif pe == "sin_cos":
            prior, mid = _sincos_embedding(rel, fdim), fdim
        elif pe == "two_order":
            x, y, z = rel[..., :1], rel[..., 1:2], rel[..., 2:3]
            prior = jnp.concatenate(
                [rel, x * y, x * z, y * z, x * x, y * y, z * z], axis=-1
            )
            mid = 9
        elif pe == "three_order":
            x, y, z = rel[..., :1], rel[..., 1:2], rel[..., 2:3]
            second = [x * y, x * z, y * z, x * x, y * y, z * z]
            third = [x**3, y**3, z**3, x * x * y, x * x * z, y * y * x,
                     y * y * z, z * z * x, z * z * y]
            prior = jnp.concatenate([rel] + second + third, axis=-1)
            mid = 18
        else:
            raise ValueError(f"unknown position_embedding {pe!r}")

        shared = max(fdim // mid, 1)
        b, m, k = nb_idx.shape
        fm = nb_f.reshape(b, m, k, mid, shared)
        agg = (prior[..., None] * fm).reshape(b, m, k, mid * shared)
        agg = _reduce(agg, valid, self.reduction)

        agg = nn.relu(_bn(train, self.bn_momentum, self.bn_eps, "pool_bn", model_dtype=self.dtype)(agg))
        if fdim != self.out_fdim or self.output_conv:
            agg = nn.Dense(self.out_fdim, use_bias=True, dtype=self.dtype,
                           name="output_conv")(agg)
            agg = nn.relu(_bn(train, self.bn_momentum, self.bn_eps, "out_bn", model_dtype=self.dtype)(agg))
        return agg


class AdaptiveWeightAgg(nn.Module):
    """MLP-predicted neighbor weights (the published ConvNet+CBL operator:
    local_input_feature='dp', reduction='mean', shared_channels=1, fc_num=1,
    no softmax — config/s3dis/adapt.yaml)."""

    out_fdim: int
    local_input_feature: str = "dp"
    reduction: str = "mean"
    shared_channels: int = 1
    fc_num: int = 1
    weight_softmax: str = ""  # '' | 'mask' | 'dense' | 'sparse' | 'unmask'
    output_conv: bool = False
    bn_momentum: float = 0.99
    bn_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, p_query, p_support, nb_idx, features, radius, train=True):
        fdim = features.shape[-1]
        shared = min(self.shared_channels, fdim)
        mid = fdim // shared
        b, m, k = nb_idx.shape

        nb_f, valid0 = shadow_gather(features, nb_idx, fill=0.0)
        center_f = nb_f[:, :, :1, :]  # first neighbor = self (distance order)
        rel_f = nb_f - center_f
        rel, dist, _, valid = _gather_geometry(p_query, p_support, nb_idx, radius)

        lif = self.local_input_feature
        if lif == "dp":
            w_in = rel
        elif lif == "df":
            w_in = rel_f
        elif lif == "dp_df":
            w_in = jnp.concatenate([rel, rel_f], axis=-1)
        elif lif == "fj":
            w_in = nb_f
        elif lif == "dp_fj":
            w_in = jnp.concatenate([rel, nb_f], axis=-1)
        elif lif == "fi_df":
            w_in = jnp.concatenate(
                [jnp.broadcast_to(center_f, nb_f.shape), rel_f], axis=-1
            )
        elif lif == "dp_fi_df":
            w_in = jnp.concatenate(
                [rel, jnp.broadcast_to(center_f, nb_f.shape), rel_f], axis=-1
            )
        else:
            raise ValueError(f"unknown local_input_feature {lif!r}")

        w = w_in.astype(self.dtype)
        for i in range(self.fc_num - 1):
            w = nn.relu(nn.Dense(mid, dtype=self.dtype, name=f"fc_{i}")(w))
        w = nn.Dense(mid, dtype=self.dtype, name=f"fc_{self.fc_num}")(w)

        if self.weight_softmax in ("mask", "dense", "sparse"):
            w = masked_softmax(w, valid[..., None], axis=2)
        elif self.weight_softmax == "unmask":
            w = jax.nn.softmax(w, axis=2)

        fm = nb_f.reshape(b, m, k, mid, shared)
        agg = (w[..., None] * fm).reshape(b, m, k, fdim)
        agg = _reduce(agg, valid, self.reduction)

        agg = nn.relu(_bn(train, self.bn_momentum, self.bn_eps, "pool_bn", model_dtype=self.dtype)(agg))
        if fdim != self.out_fdim or self.output_conv:
            agg = nn.Dense(self.out_fdim, use_bias=True, dtype=self.dtype,
                           name="output_conv")(agg)
            agg = nn.relu(_bn(train, self.bn_momentum, self.bn_eps, "out_bn", model_dtype=self.dtype)(agg))
        return agg


class PointWiseMLPAgg(nn.Module):
    """Set-MLP aggregation (PointNet++ style)."""

    out_fdim: int
    local_input_feature: str = "dp_fj"
    fc_num: int = 2
    reduction: str = "max"
    bn_momentum: float = 0.99
    bn_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, p_query, p_support, nb_idx, features, radius, train=True):
        fdim = features.shape[-1]
        nb_f, _ = shadow_gather(features, nb_idx, fill=0.0)
        center_f = nb_f[:, :, :1, :]
        rel_f = nb_f - center_f
        rel, _, _, valid = _gather_geometry(p_query, p_support, nb_idx, radius)

        lif = self.local_input_feature
        if lif == "dp_fj":
            s = jnp.concatenate([rel, nb_f], axis=-1)
        elif lif == "fi_df":
            s = jnp.concatenate([jnp.broadcast_to(center_f, nb_f.shape), rel_f], -1)
        elif lif == "dp_fi_df":
            s = jnp.concatenate(
                [rel, jnp.broadcast_to(center_f, nb_f.shape), rel_f], -1
            )
        elif lif == "dp_fi_df_fj":
            s = jnp.concatenate(
                [rel, jnp.broadcast_to(center_f, nb_f.shape), rel_f, nb_f], -1
            )
        else:
            raise ValueError(f"unknown local_input_feature {lif!r}")

        s = s.astype(self.dtype)
        mfdim = max(fdim // 2, 9)
        for i in range(self.fc_num - 1):
            s = nn.Dense(mfdim, dtype=self.dtype, name=f"fc_{i}")(s)
            s = nn.relu(_bn(train, self.bn_momentum, self.bn_eps, f"bn_{i}", model_dtype=self.dtype)(s))
        s = nn.Dense(self.out_fdim, dtype=self.dtype, name=f"fc_{self.fc_num}")(s)
        s = nn.relu(_bn(train, self.bn_momentum, self.bn_eps, f"bn_{self.fc_num}", model_dtype=self.dtype)(s))
        s = s * valid[..., None].astype(s.dtype)
        if self.reduction == "max":
            # zeros from masked rows are fine post-relu (matches reference
            # which multiplies by the mask then reduce_max)
            return jnp.max(s, axis=2)
        return _reduce(s, valid, self.reduction)


def generate_kernel_points(
    radius: float, num_points: int = 15, seed: int = 0, iters: int = 300
) -> np.ndarray:
    """Repulsion-optimized kernel point dispositions in a sphere (one point
    pinned at the center) — the standard KPConv construction; replaces the
    reference's missing `create_kernel_points` dependency
    (local_aggregation_operators.py:669)."""
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-1, 1, (num_points, 3))
    pts[0] = 0.0
    for _ in range(iters):
        diff = pts[:, None, :] - pts[None, :, :]
        d2 = np.sum(diff**2, -1) + np.eye(num_points)
        force = (diff / (d2[..., None] ** 1.5 + 1e-9)).sum(1)  # repulsion
        pts += 0.01 * force
        pts[0] = 0.0
        norm = np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
        pts = np.where(norm > 1.0, pts / norm, pts)  # keep inside unit sphere
    return (pts * 0.66 * radius).astype(np.float32)  # shell at ~2/3 radius


class PseudoGridAgg(nn.Module):
    """KPConv-style kernel-point convolution, depthwise weights [K_pts, fdim]
    + optional output conv. Influences: linear (default) / gaussian /
    constant; modes: sum / closest."""

    out_fdim: int
    radius: float  # ball radius of this level (static)
    density_parameter: float = 5.0
    kp_extent: float = 1.0
    num_kernel_points: int = 15
    kp_influence: str = "linear"
    convolution_mode: str = "sum"
    output_conv: bool = False
    bn_momentum: float = 0.99
    bn_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, p_query, p_support, nb_idx, features, radius, train=True):
        fdim = features.shape[-1]
        extent = self.kp_extent * self.radius / self.density_parameter
        k_radius = 1.5 * extent
        kp = jnp.asarray(
            generate_kernel_points(k_radius, self.num_kernel_points)
        )  # [P, 3]

        # shadow neighbors placed far away → zero influence
        nb_p, valid = shadow_gather(p_support, nb_idx, fill=1e6)
        rel = nb_p - p_query[:, :, None, :]  # [B,M,K,3] (NOT normalized)
        diff = rel[:, :, :, None, :] - kp  # [B,M,K,P,3]
        sq = jnp.sum(diff * diff, axis=-1)  # [B,M,K,P]

        if self.kp_influence == "constant":
            w = jnp.ones_like(sq)
        elif self.kp_influence == "linear":
            w = jnp.maximum(1.0 - jnp.sqrt(sq) / extent, 0.0)
        elif self.kp_influence == "gaussian":
            sigma = extent * 0.3
            w = jnp.exp(-sq / (2 * sigma**2))
        else:
            raise ValueError(f"unknown kp_influence {self.kp_influence!r}")

        if self.convolution_mode == "closest":
            closest = jnp.argmin(sq, axis=-1)
            w = w * jax.nn.one_hot(closest, self.num_kernel_points, dtype=w.dtype)
        elif self.convolution_mode != "sum":
            raise ValueError(f"unknown convolution_mode {self.convolution_mode!r}")

        nb_f, _ = shadow_gather(features, nb_idx, fill=0.0)
        # [B,M,P,K] @ [B,M,K,C] → [B,M,P,C]
        weighted = jnp.einsum(
            "bmkp,bmkc->bmpc", w.astype(jnp.float32), nb_f.astype(jnp.float32)
        )
        kernel_w = self.param(
            "weights",
            nn.initializers.xavier_uniform(),
            (self.num_kernel_points, fdim),
            jnp.float32,
        )
        out = jnp.sum(weighted * kernel_w[None, None], axis=2)  # [B,M,C]

        out = nn.relu(_bn(train, self.bn_momentum, self.bn_eps, "bn", model_dtype=self.dtype)(out))
        if fdim != self.out_fdim or self.output_conv:
            out = nn.Dense(self.out_fdim, use_bias=True, dtype=self.dtype,
                           name="output_conv")(out)
            out = nn.relu(_bn(train, self.bn_momentum, self.bn_eps, "out_bn", model_dtype=self.dtype)(out))
        return out


class IdentityAgg(nn.Module):
    """Center-feature passthrough (+ conv when dims differ)."""

    out_fdim: int
    bn_momentum: float = 0.99
    bn_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, p_query, p_support, nb_idx, features, radius, train=True):
        fdim = features.shape[-1]
        nb_f, _ = shadow_gather(features, nb_idx[:, :, :1], fill=0.0)
        center = nb_f[:, :, 0, :]
        if fdim != self.out_fdim:
            center = nn.Dense(self.out_fdim, dtype=self.dtype, name="output_conv")(
                center
            )
        return nn.relu(_bn(train, self.bn_momentum, self.bn_eps, "bn", model_dtype=self.dtype)(center))


AGGREGATORS = {
    "pospool": PosPoolAgg,
    "adaptive_weight": AdaptiveWeightAgg,
    "pointwisemlp": PointWiseMLPAgg,
    "pseudo_grid": PseudoGridAgg,
    "identity": IdentityAgg,
}
