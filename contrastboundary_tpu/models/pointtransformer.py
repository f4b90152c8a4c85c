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

import jax
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
    # per-stage branch logits [B, N_i, ncls] (None where not built) — the
    # reference mlp_head branch heads (head.py:247-287); supervised by the
    # multi head's branch loss ('loss'/'lossSub' tokens)
    stage_logits: Tuple = ()


def _nearest_stage_idx(pyramid: Pyramid, src: int, dst: int):
    """Nearest stage-`src` point for every stage-`dst` point (src > dst),
    chained through the per-level nearest-up indices — the TPU-first stand-in
    for the reference's on-the-fly cross-stage searches (get_sample_idx,
    tensorflow/models/heads/head.py:133-177 with kr=1)."""
    if dst == 0:
        return pyramid.near0_idx[src]
    idx = pyramid.up_idx[dst + 1][..., 0]  # [B, N_dst] → level dst+1
    for l in range(dst + 2, src + 1):
        idx = batch_gather(pyramid.up_idx[l][..., 0], idx)
    return idx


class MultiHead(nn.Module):
    """Per-up-stage branch heads + upsample-to-U0 + combine + classifier
    (pytorch/model/heads.py:13-61 `MultiHead`, config multi-Ua-concat-latent;
    TF multiscale_head, tensorflow/models/heads/head.py:338-459).

    combine 'concat' → linear classifier; 'concatmlp' → Dense+BN+ReLU+Dense
    (heads.py:38-41); 'sum' → elementwise sum (basic_operators.py:561-608).
    `ftype` picks what each stage exposes to the main combine: latent
    (flagship) | logits | probs | f_out (head.py:247-287 get_branch_head —
    when combining logits/probs the combined tensor IS the prediction, no
    extra classifier). `stages` selects contributing up stages ('Ua' = all).
    `project` adds per-stage projection MLPs feeding the contrast loss
    (heads.py:88-92); `contrast_ftype` picks the contrast feature source.
    `branch_loss` ('loss'/'lossSub') builds supervised per-stage logits
    (head.py:303-317); `condition` ('concat1', 'sumA', …) mixes the previous
    deeper stages' latents into each stage first (head.py:425-447).

    `sep_head`: separate decoder branches per head. In the reference,
    `config.sep_head` (auto-true when a multi head exists,
    tensorflow/config/s3dis.py:142) suppresses the decoder's default
    segmentation tower (seg_head.py:93-102) and the heads build per-stage
    towers lazily — SHARED through the stage_list cache
    (head.py:263-270 get_branch_head writes 'latent' into the stage dict
    both heads read). The default-tower suppression is this module's
    `use_multihead` path, and the shared towers are the default here too;
    `sep_head=True` opts the contrast branch into its OWN per-stage towers
    (no sharing with the main combine) — the full separate-branch split.
    """

    num_classes: int
    base_fdim: int = 32
    combine: str = "concat"
    stages: Optional[Tuple[int, ...]] = None
    project: str = ""
    ftype: str = "latent"
    contrast_ftype: str = "latent"
    branch_loss: str = ""
    condition: str = ""
    sep_head: bool = False
    bn_mode: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, up_feats, pyramid: Pyramid, train: bool = True):
        nl = len(up_feats)
        stages = self.stages if self.stages is not None else tuple(range(nl))
        d = self.base_fdim

        latents: list = [None] * nl
        for i in stages:
            latents[i] = MLPTower(
                (d,), bn_mode=self.bn_mode, dtype=self.dtype, name=f"latent{i}"
            )(up_feats[i], train)

        if self.condition:
            import re as _re

            m = _re.match(r"^(concat|sum|max)(\d+|A)$", self.condition)
            if not m:
                raise ValueError(f"bad condition spec {self.condition!r}")
            cond_ops = m.group(1)
            cond_i = nl if m.group(2) == "A" else int(m.group(2))
            order = sorted(stages, reverse=True)  # deepest first (U[n..0])
            for pos, i in enumerate(order):
                prev = order[max(0, pos - cond_i) : pos]
                if not prev:
                    continue
                feats = [
                    batch_gather(latents[j], _nearest_stage_idx(pyramid, j, i))
                    for j in prev
                ] + [latents[i]]
                if cond_ops == "concat":
                    mixed = jnp.concatenate(feats, axis=-1)
                    # keep the latent width stable for downstream heads
                    mixed = nn.Dense(d, dtype=self.dtype, name=f"cond{i}")(mixed)
                elif cond_ops == "sum":
                    mixed = sum(feats)
                else:  # max
                    mixed = feats[0]
                    for f in feats[1:]:
                        mixed = jnp.maximum(mixed, f)
                latents[i] = mixed

        contrast_uses_shared = not self.sep_head
        need_logits = bool(self.branch_loss) or self.ftype in (
            "logits", "probs"
        ) or (
            contrast_uses_shared and self.contrast_ftype in ("logits", "probs")
        )
        stage_logits: list = [None] * nl
        if need_logits:
            for i in stages:
                stage_logits[i] = nn.Dense(
                    self.num_classes, dtype=jnp.float32, name=f"branch_cls{i}"
                )(latents[i])

        def select(ftype, i):
            if ftype == "f_out":
                return up_feats[i]
            if ftype == "latent":
                return latents[i]
            if ftype == "logits":
                return stage_logits[i]
            if ftype == "probs":
                return jax.nn.softmax(stage_logits[i], axis=-1)
            raise ValueError(f"unknown ftype {ftype!r}")

        # sep_head: the contrast branch gets its own decoder towers instead
        # of sharing the main branch's latent/logits (see class docstring)
        sep_latents: list = [None] * nl
        sep_logits: list = [None] * nl
        if self.sep_head:
            for i in stages:
                sep_latents[i] = MLPTower(
                    (d,), bn_mode=self.bn_mode, dtype=self.dtype,
                    name=f"sep_latent{i}"
                )(up_feats[i], train)
                if self.contrast_ftype in ("logits", "probs"):
                    sep_logits[i] = nn.Dense(
                        self.num_classes, dtype=jnp.float32,
                        name=f"sep_cls{i}",
                    )(sep_latents[i])

        def select_contrast(i):
            if not self.sep_head:
                return select(self.contrast_ftype, i)
            if self.contrast_ftype == "f_out":
                return up_feats[i]
            if self.contrast_ftype == "latent":
                return sep_latents[i]
            if self.contrast_ftype == "logits":
                return sep_logits[i]
            if self.contrast_ftype == "probs":
                return jax.nn.softmax(sep_logits[i], axis=-1)
            raise ValueError(f"unknown ftype {self.contrast_ftype!r}")

        contrast_feats: list = [None] * nl
        for i in stages:
            feat = select_contrast(i)
            if self.project == "linear":
                feat = nn.Dense(d, dtype=self.dtype, name=f"project{i}")(feat)
            elif self.project == "mlp":
                feat = MLPTower(
                    (d,), bn_mode=self.bn_mode, dtype=self.dtype,
                    name=f"project{i}"
                )(feat, train)
            elif self.project == "mlp2":
                feat = MLPTower(
                    (d, d), bn_mode=self.bn_mode, dtype=self.dtype,
                    name=f"project{i}"
                )(feat, train)
            contrast_feats[i] = feat

        def up0(feat, i):
            """Stage-i features at every level-0 point. Sorted layout: the
            nearest-point pick runs as a k=1 cross-window one-hot matmul
            (round 4) instead of a full-resolution row gather."""
            if pyramid.near0_meta and pyramid.near0_meta[i] is not None:
                from ..ops.tile_gather import cross_window_gather

                t, width, window = pyramid.near0_meta[i]
                li = pyramid.near0_local[i][..., None]
                return cross_window_gather(
                    feat, li, feat.shape[1], t, width, window
                )[..., 0, :]
            return batch_gather(feat, pyramid.near0_idx[i])

        collected = [
            select(self.ftype, i)
            if i == 0
            else up0(select(self.ftype, i), i)
            for i in stages
        ]
        if self.combine == "sum":
            x = collected[0]
            for f in collected[1:]:
                x = x + f
        else:
            x = jnp.concatenate(collected, axis=-1)
        if self.ftype == "logits":
            # combined per-stage logits ARE the prediction (head.py:276-281:
            # get_branch_head returns the existing 'logits' entry untouched)
            logits = x if self.combine == "sum" else nn.Dense(
                self.num_classes, dtype=jnp.float32, name="cls"
            )(x)
        elif self.ftype == "probs":
            if self.combine == "sum":
                # summed per-stage distributions → renormalize, log as logits
                probs = x / jnp.maximum(jnp.sum(x, -1, keepdims=True), 1e-12)
                logits = jnp.log(jnp.maximum(probs, 1e-12))
            else:
                logits = nn.Dense(
                    self.num_classes, dtype=jnp.float32, name="cls"
                )(x)
        else:
            if self.combine.endswith("mlp"):
                from .blocks import make_bn

                x = nn.Dense(d, dtype=self.dtype, name="cls_fc")(x)
                x = make_bn(
                    self.bn_mode, train, "cls_bn", model_dtype=self.dtype
                )(x)
                x = nn.relu(x)
            logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="cls")(x)
        return logits, tuple(latents), tuple(contrast_feats), tuple(stage_logits)


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
    multi_ftype: str = "latent"
    multi_branch_loss: str = ""
    multi_condition: str = ""
    multi_sep_head: bool = False
    contrast_project: str = ""
    contrast_ftype: str = "latent"
    # plain-head (use_multihead=False) options from the reference mlp-head
    # grammar '<depth>-xen-dp<p>' (tensorflow/config/head.py:56-82):
    # latent-tower depth and dropout rate on the latent (applied at
    # models/heads/head.py:273-274; needs an rngs={'dropout': ...} at train)
    mlp_depth: int = 1
    mlp_drop: Optional[float] = None
    # BN semantics: 'batch' = exact nn.BatchNorm (reference parity);
    # 'stale' = StaleBatchNorm (normalize with running stats, fold-friendly —
    # see blocks.py and PERF.md round 4)
    bn_mode: str = "batch"
    # rematerialize transformer blocks in backward (the reference's
    # memory_saving_gradients monkey-patch, tensorflow/main.py:70-72)
    save_memory: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, pyramid: Pyramid, train: bool = True) -> ModelOutput:
        Block = (
            nn.remat(PointTransformerBlock, static_argnums=(4, 6))
            if self.save_memory
            else PointTransformerBlock
        )
        loc = lambda l: (
            pyramid.self_local[l] if pyramid.self_local else None
        )
        # round 4: window-relative cross-level twins (one-hot matmul gathers)
        dloc = lambda l: (
            (pyramid.down_local[l],) + pyramid.down_meta[l]
            if pyramid.down_meta and pyramid.down_meta[l] is not None
            else None
        )
        uloc = lambda l: (
            (pyramid.up_local[l],) + pyramid.up_meta[l]
            if pyramid.up_meta and pyramid.up_meta[l] is not None
            else None
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
                    self.planes[0], stride=1, bn_mode=self.bn_mode,
                    dtype=self.dtype, name="enc0_down"
                )(p, x, train=train)
            else:
                x = TransitionDown(
                    self.planes[l], stride=4, bn_mode=self.bn_mode,
                    dtype=self.dtype, name=f"enc{l}_down"
                )(
                    pyramid.points[l - 1], x, p, pyramid.down_idx[l], train=train,
                    rel=pyramid.down_rel[l], local=dloc(l),
                )
            for b in range(1, self.blocks[l]):
                x = Block(
                    self.planes[l], self.share_planes, bn_mode=self.bn_mode,
                    dtype=self.dtype, name=f"enc{l}_blk{b}",
                )(p, x, pyramid.self_idx[l], train, pyramid.self_rel[l],
                  loc(l))
            down_feats.append(x)

        # ---- decoder ----
        up_feats: list = [None] * num_levels
        x = TransitionUp(
            self.planes[-1], is_head=True, bn_mode=self.bn_mode,
            dtype=self.dtype, name=f"dec{num_levels-1}_up"
        )(down_feats[-1], train=train)
        x = Block(
            self.planes[-1], self.share_planes, bn_mode=self.bn_mode,
            dtype=self.dtype, name=f"dec{num_levels-1}_blk",
        )(pyramid.points[-1], x, pyramid.self_idx[-1], train,
          pyramid.self_rel[-1], loc(num_levels - 1))
        up_feats[-1] = x

        for l in range(num_levels - 2, -1, -1):
            x = TransitionUp(
                self.planes[l], bn_mode=self.bn_mode, dtype=self.dtype,
                name=f"dec{l}_up"
            )(
                down_feats[l], x, pyramid.up_idx[l + 1], pyramid.up_w[l + 1],
                train=train, local=uloc(l + 1),
            )
            x = Block(
                self.planes[l], self.share_planes, bn_mode=self.bn_mode,
                dtype=self.dtype, name=f"dec{l}_blk",
            )(pyramid.points[l], x, pyramid.self_idx[l], train,
              pyramid.self_rel[l], loc(l))
            up_feats[l] = x

        if self.use_multihead:
            logits, latents, contrast_feats, stage_logits = MultiHead(
                self.num_classes, self.base_fdim, combine=self.multi_combine,
                stages=self.multi_stages, project=self.contrast_project,
                ftype=self.multi_ftype, contrast_ftype=self.contrast_ftype,
                branch_loss=self.multi_branch_loss,
                condition=self.multi_condition,
                sep_head=self.multi_sep_head,
                bn_mode=self.bn_mode,
                dtype=self.dtype, name="multihead",
            )(tuple(up_feats), pyramid, train)
        else:
            y = MLPTower(
                (self.planes[0],) * self.mlp_depth, bn_mode=self.bn_mode,
                dtype=self.dtype, name="cls_tower",
            )(up_feats[0], train)
            if self.mlp_drop:
                y = nn.Dropout(
                    self.mlp_drop, deterministic=not train, name="cls_drop"
                )(y)
            logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="cls")(y)
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
