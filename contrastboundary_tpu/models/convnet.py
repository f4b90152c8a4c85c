"""ConvNet (resnet-bottleneck) segmentation backbone with pluggable local
aggregation, + the nearest-upsample decoder.

Equivalent to tensorflow/models/backbone/resnet.py:307-444 (input 1×1 →
simple block → per-stage [strided_bottleneck ×1 + bottleneck ×depth], fdim
×2 and radius ×2 per stage) and models/heads/seg_head.py:31-102 (nearest
upsample + skip concat + 1×1, dims 8/4/2/1 × base_fdim). The published
ConvNet+CBL config is adaptive_weight aggregation, base_fdim 72,
bottleneck_ratio 2, depth 1, radii 0.1·2^l (config/s3dis/adapt.yaml,
config/s3dis.py:78-87).

Outputs the same ModelOutput contract as the point-transformer, so MultiHead
and the CBL losses plug in unchanged.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..core.gather import batch_gather, shadow_gather
from ..ops.pyramid import Pyramid
from .local_aggregation import AGGREGATORS
from .pointtransformer import ModelOutput, MultiHead

Dtype = Any


def build_input_features(points, colors, kind: str = "1-rgb-Z"):
    """Input feature assembly (reference `in_features`,
    tensorflow/config/s3dis.py:73-75): combinations of a ones-column, rgb,
    height (Z) and xyz."""
    parts = []
    for tok in kind.split("-"):
        if tok == "1":
            parts.append(jnp.ones_like(points[..., :1]))
        elif tok == "rgb":
            parts.append(colors)
        elif tok == "Z":
            parts.append(points[..., 2:3])
        elif tok == "xyz":
            parts.append(points)
        else:
            raise ValueError(f"unknown input feature token {tok!r}")
    return jnp.concatenate(parts, axis=-1)


class ConvNetSeg(nn.Module):
    num_classes: int = 13
    base_fdim: int = 72
    bottleneck_ratio: int = 2
    depth: int = 1
    base_radius: float = 0.1
    num_layers: int = 5
    aggregation: str = "adaptive_weight"
    agg_kwargs: Tuple[Tuple[str, Any], ...] = ()  # hashable kv for the operator
    density_parameter: float = 5.0
    bn_momentum: float = 0.99
    bn_eps: float = 1e-6
    use_multihead: bool = True
    multi_combine: str = "concat"
    multi_stages: Tuple[int, ...] = None  # type: ignore[assignment]
    multi_ftype: str = "latent"
    multi_branch_loss: str = ""
    multi_condition: str = ""
    multi_sep_head: bool = False
    contrast_project: str = ""
    contrast_ftype: str = "latent"
    # plain-head tower depth / latent dropout (reference mlp-head grammar
    # '<depth>-xen-dp<p>', tensorflow/config/head.py:56-82)
    mlp_depth: int = 1
    mlp_drop: float = None  # type: ignore[assignment]
    # 'batch' (exact nn.BatchNorm) | 'stale' (fold-friendly; blocks.py)
    bn_mode: str = "batch"
    in_features: str = "1-rgb-Z"  # assembled from points+colors (config in_features_dim=5)
    dtype: Dtype = jnp.float32

    def _conv1x1(self, x, d, name, train, act=True):
        from .blocks import make_bn

        x = nn.Dense(d, use_bias=False, dtype=self.dtype, name=f"{name}_fc")(x)
        x = make_bn(
            self.bn_mode, train, f"{name}_bn", momentum=self.bn_momentum,
            epsilon=self.bn_eps, model_dtype=self.dtype,
        )(x)
        return nn.relu(x) if act else x

    def _agg(self, name, out_fdim, radius):
        cls = AGGREGATORS[self.aggregation]
        kw = dict(self.agg_kwargs)
        kw.update(
            out_fdim=out_fdim, bn_momentum=self.bn_momentum,
            bn_eps=self.bn_eps, dtype=self.dtype, name=name,
        )
        if self.aggregation == "pseudo_grid":
            kw.setdefault("density_parameter", self.density_parameter)
            kw["radius"] = radius
        return cls(**kw)

    def _bottleneck(self, x, pyr, l, out_fdim, radius, name, train):
        """1×1 → aggregation → 1×1 + shortcut (resnet.py:92-194)."""
        d_mid = out_fdim // self.bottleneck_ratio
        y = self._conv1x1(x, d_mid, f"{name}_conv1", train)
        y = self._agg(f"{name}_agg", d_mid, radius)(
            pyr.points[l], pyr.points[l], pyr.self_idx[l], y, radius, train
        )
        y = self._conv1x1(y, out_fdim, f"{name}_conv3", train, act=False)
        if x.shape[-1] != out_fdim:
            sc = self._conv1x1(x, out_fdim, f"{name}_shortcut", train, act=False)
        else:
            sc = x
        return nn.relu(y + sc)

    def _strided_bottleneck(self, x, pyr, l, out_fdim, radius, name, train):
        """Aggregation over the pooling KNN + max-pool shortcut
        (resnet.py:197-304). l = source level; output lives at level l+1."""
        d_mid = out_fdim // self.bottleneck_ratio
        y = self._conv1x1(x, d_mid, f"{name}_conv1", train)
        y = self._agg(f"{name}_agg", d_mid, radius)(
            pyr.points[l + 1], pyr.points[l], pyr.down_idx[l + 1], y, radius, train
        )
        y = self._conv1x1(y, out_fdim, f"{name}_conv3", train, act=False)
        # shortcut: masked max-pool of input features over the pooling KNN
        nb, valid = shadow_gather(x, pyr.down_idx[l + 1], fill=0.0)
        neg = jnp.asarray(-65535.0, nb.dtype)
        sc = jnp.max(jnp.where(valid[..., None], nb, neg), axis=2)
        if sc.shape[-1] != out_fdim:
            sc = self._conv1x1(sc, out_fdim, f"{name}_shortcut", train, act=False)
        return nn.relu(y + sc)

    @nn.compact
    def __call__(self, features, pyramid: Pyramid, train: bool = True) -> ModelOutput:
        if pyramid.self_local and any(m is not None for m in pyramid.self_local):
            # ConvNet aggregation consumes GLOBAL shadow-index neighbors
            # (radius masks); the tile-local sorted layout is the
            # point-transformer fast path
            raise ValueError("ConvNet requires PyramidSpec(layout='natural')")
        fdim = self.base_fdim
        radius = self.base_radius
        x = build_input_features(
            pyramid.points[0], features, self.in_features
        ).astype(self.dtype)

        x = self._conv1x1(x, fdim, "input_conv", train)
        x = self._agg("simple_agg", fdim, radius)(
            pyramid.points[0], pyramid.points[0], pyramid.self_idx[0], x, radius,
            train,
        )
        down_feats = []
        for i in range(self.depth):
            x = self._bottleneck(
                x, pyramid, 0, 2 * fdim, radius, f"res1_btn{i}", train
            )
        down_feats.append(x)

        for stage in range(1, self.num_layers):
            out_fdim = 2 ** (stage + 1) * fdim
            x = self._strided_bottleneck(
                x, pyramid, stage - 1, out_fdim, radius * 2 ** (stage - 1),
                f"res{stage+1}_strided", train,
            )
            for i in range(self.depth):
                x = self._bottleneck(
                    x, pyramid, stage, out_fdim, radius * 2**stage,
                    f"res{stage+1}_btn{i}", train,
                )
            down_feats.append(x)

        # decoder: nearest upsample + skip concat + 1×1 (seg_head.py:31-102)
        up_feats: list = [None] * self.num_layers
        up_feats[-1] = down_feats[-1]
        for l in range(self.num_layers - 2, -1, -1):
            nearest = pyramid.up_idx[l + 1][..., 0]  # [B, N_l]
            up = batch_gather(x, nearest)
            x = jnp.concatenate([up, down_feats[l]], axis=-1)
            x = self._conv1x1(x, 2**l * fdim if l > 0 else fdim,
                              f"up_conv{l}", train)
            up_feats[l] = x

        if self.use_multihead:
            logits, latents, contrast_feats, stage_logits = MultiHead(
                self.num_classes, self.base_fdim, combine=self.multi_combine,
                stages=self.multi_stages, project=self.contrast_project,
                ftype=self.multi_ftype, contrast_ftype=self.contrast_ftype,
                branch_loss=self.multi_branch_loss,
                condition=self.multi_condition,
                sep_head=self.multi_sep_head,
                dtype=self.dtype, name="multihead",
            )(tuple(up_feats), pyramid, train)
        else:
            y = x
            for d in range(self.mlp_depth):
                y = self._conv1x1(y, fdim, f"seg_head{d if d else ''}", train)
            if self.mlp_drop:
                y = nn.Dropout(
                    self.mlp_drop, deterministic=not train, name="cls_drop"
                )(y)
            logits = nn.Dense(
                self.num_classes, use_bias=True, dtype=jnp.float32, name="cls"
            )(y)
            latents = tuple()
            contrast_feats = tuple()
            stage_logits = tuple()

        return ModelOutput(
            logits=logits.astype(jnp.float32),
            down_feats=tuple(down_feats),
            up_feats=tuple(up_feats),
            latents=latents,
            contrast_feats=contrast_feats,
            stage_logits=stage_logits,
        )
