"""Point-transformer segmentation backbone + MultiHead, TPU-first.

Equivalent to pytorch/model/pointtransformer_seg.py:27-150 (5-stage U-shaped
encoder/decoder, planes [32,64,128,256,512], blocks [2,3,4,6,3]) and the
MultiHead (pytorch/model/heads.py:13-61): per-up-stage latent towers,
k=1-nearest upsample of every stage's latent to level 0, concat, linear
classifier. The pyramid (sample/KNN/interp indices) is precomputed —
see ops/pyramid.py.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..core.gather import batch_gather
from ..ops.pyramid import Pyramid
from .blocks import (
    MLPTower,
    PointTransformerBlock,
    TransitionDown,
    TransitionUp,
)


@struct.dataclass
class ModelOutput:
    """logits: [B, N0, num_classes]; per-level decoder features and latents
    (the reference's stage_list['up'][i]['f_out'/'latent'])."""

    logits: jnp.ndarray
    down_feats: Tuple
    up_feats: Tuple
    latents: Tuple
    # features the contrast loss runs on: latents, optionally through the
    # per-stage projection MLPs (reference head_cfg.project)
    contrast_feats: Tuple = ()


class MultiHead(nn.Module):
    """Per-up-stage latent towers + k=1 upsample to level 0 + combine +
    classifier (pytorch/model/heads.py:13-61, config multi-Ua-concat-latent).

    combine 'concat' → linear classifier; 'concatmlp' → Dense+BN+ReLU+Dense
    (heads.py:38-41). `stages` selects which up stages contribute ('Ua' =
    all). `project` optionally adds per-stage projection MLPs whose outputs
    feed the contrast loss (the reference ContrastHead's `project` MLPbyOps,
    heads.py:88-92): '' off | 'linear' | 'mlp' | 'mlp2'.
    """

    num_classes: int
    base_fdim: int = 32
    combine: str = "concat"
    stages: Optional[Tuple[int, ...]] = None
    project: str = ""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, up_feats, pyramid: Pyramid, train: bool = True):
        stages = self.stages if self.stages is not None else tuple(
            range(len(up_feats))
        )
        latents: list = [None] * len(up_feats)
        contrast_feats: list = [None] * len(up_feats)
        collected = []
        d = self.base_fdim
        for i in stages:
            latent = MLPTower((d,), dtype=self.dtype, name=f"latent{i}")(
                up_feats[i], train
            )
            latents[i] = latent
            if self.project == "linear":
                proj = nn.Dense(d, dtype=self.dtype, name=f"project{i}")(latent)
            elif self.project == "mlp":
                proj = MLPTower((d,), dtype=self.dtype, name=f"project{i}")(
                    latent, train
                )
            elif self.project == "mlp2":
                proj = MLPTower((d, d), dtype=self.dtype, name=f"project{i}")(
                    latent, train
                )
            else:
                proj = latent
            contrast_feats[i] = proj
            if i == 0:
                collected.append(latent)
            else:
                collected.append(batch_gather(latent, pyramid.near0_idx[i]))
        x = jnp.concatenate(collected, axis=-1)
        if self.combine.endswith("mlp"):
            x = nn.Dense(d, dtype=self.dtype, name="cls_fc")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name="cls_bn",
            )(x)
            x = nn.relu(x)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="cls")(x)
        return logits, tuple(latents), tuple(contrast_feats)


class PointTransformerSeg(nn.Module):
    """U-shaped point transformer. Input features are raw per-point channels
    (rgb for S3DIS); xyz is concatenated when in_channels == 6
    (pytorch/model/pointtransformer_seg.py:90-100)."""

    num_classes: int = 13
    planes: Sequence[int] = (32, 64, 128, 256, 512)
    blocks: Sequence[int] = (2, 3, 4, 6, 3)
    share_planes: int = 8
    base_fdim: int = 32
    use_multihead: bool = True
    multi_combine: str = "concat"
    multi_stages: Optional[Tuple[int, ...]] = None
    contrast_project: str = ""
    # rematerialize transformer blocks in backward (the reference's
    # memory_saving_gradients monkey-patch, tensorflow/main.py:70-72)
    save_memory: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, pyramid: Pyramid, train: bool = True) -> ModelOutput:
        Block = (
            nn.remat(PointTransformerBlock, static_argnums=(4,))
            if self.save_memory
            else PointTransformerBlock
        )
        p0 = pyramid.points[0]
        x = jnp.concatenate([p0, features], axis=-1).astype(self.dtype)

        num_levels = len(self.planes)
        down_feats = []
        # ---- encoder ----
        for l in range(num_levels):
            p = pyramid.points[l]
            if l == 0:
                x = TransitionDown(
                    self.planes[0], stride=1, dtype=self.dtype, name="enc0_down"
                )(p, x, train=train)
            else:
                x = TransitionDown(
                    self.planes[l], stride=4, dtype=self.dtype, name=f"enc{l}_down"
                )(
                    pyramid.points[l - 1], x, p, pyramid.down_idx[l], train=train,
                    rel=pyramid.down_rel[l],
                )
            for b in range(1, self.blocks[l]):
                x = Block(
                    self.planes[l], self.share_planes, dtype=self.dtype,
                    name=f"enc{l}_blk{b}",
                )(p, x, pyramid.self_idx[l], train, pyramid.self_rel[l])
            down_feats.append(x)

        # ---- decoder ----
        up_feats: list = [None] * num_levels
        x = TransitionUp(
            self.planes[-1], is_head=True, dtype=self.dtype, name=f"dec{num_levels-1}_up"
        )(down_feats[-1], train=train)
        x = Block(
            self.planes[-1], self.share_planes, dtype=self.dtype,
            name=f"dec{num_levels-1}_blk",
        )(pyramid.points[-1], x, pyramid.self_idx[-1], train,
          pyramid.self_rel[-1])
        up_feats[-1] = x

        for l in range(num_levels - 2, -1, -1):
            x = TransitionUp(self.planes[l], dtype=self.dtype, name=f"dec{l}_up")(
                down_feats[l], x, pyramid.up_idx[l + 1], pyramid.up_w[l + 1], train=train
            )
            x = Block(
                self.planes[l], self.share_planes, dtype=self.dtype,
                name=f"dec{l}_blk",
            )(pyramid.points[l], x, pyramid.self_idx[l], train,
              pyramid.self_rel[l])
            up_feats[l] = x

        if self.use_multihead:
            logits, latents, contrast_feats = MultiHead(
                self.num_classes, self.base_fdim, combine=self.multi_combine,
                stages=self.multi_stages, project=self.contrast_project,
                dtype=self.dtype, name="multihead",
            )(tuple(up_feats), pyramid, train)
        else:
            y = MLPTower((self.planes[0],), dtype=self.dtype, name="cls_tower")(
                up_feats[0], train
            )
            logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="cls")(y)
            latents = tuple()
            contrast_feats = tuple()

        return ModelOutput(
            logits=logits.astype(jnp.float32),
            down_feats=tuple(down_feats),
            up_feats=tuple(up_feats),
            latents=latents,
            contrast_feats=contrast_feats,
        )
