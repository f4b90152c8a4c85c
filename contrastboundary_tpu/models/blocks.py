"""Point-transformer building blocks, TPU-first.

Functionally equivalent to pytorch/model/blocks.py (PointTransformerLayer
:14-44, TransitionDown :47-77, TransitionUp :80-109, PointTransformerBlock
:112-133, MLP towers :157-248) with one structural redesign: neighbor indices
are **inputs** (precomputed once per batch by ops/pyramid.py) instead of each
layer re-running KNN/FPS. All tensors are batch-dense `[B, N, C]` — every
gather is a fused XLA gather, every MLP a batched matmul on the MXU.

BatchNorm statistics are over (B, N[, K]) per channel, matching torch
BatchNorm1d over stacked clouds; under a data-sharded `jit` the batch axis is
global, so this is sync-BN across devices for free (the PT stack's optional
SyncBatchNorm, tool/train.py:148-149).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.gather import batch_gather

Dtype = Any


class PointTransformerLayer(nn.Module):
    """Vector self-attention over k precomputed neighbors.

    w = linear_w(k_nb − q + δ);  out = Σ_k softmax_k(w) ⊙ (v_nb + δ)
    with δ = linear_p(p_nb − p) and `share_planes` channels sharing one
    attention weight (pytorch/model/blocks.py:31-44).
    """

    out_planes: int
    share_planes: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, p, x, nb_idx, train: bool = True, rel=None, local=None):
        c = self.out_planes
        s = self.share_planes
        dense = lambda d, name: nn.Dense(d, dtype=self.dtype, name=name)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )

        q = dense(c, "linear_q")(x)
        k = dense(c, "linear_k")(x)
        v = dense(c, "linear_v")(x)

        # single fused neighbor gather: TPU gathers are row-bound (~8.5ns /
        # row regardless of width ≤128 lanes), so one [2c]-wide gather costs
        # half of separate k and v gathers; the relative positions come
        # precomputed from the pyramid (shared by every block of the level).
        # With `local` = (tile, width) the indices are window-relative in
        # Morton-sorted space (PyramidSpec layout='sorted') and the gather +
        # its backward run as per-tile one-hot MXU matmuls instead
        # (ops/tile_gather.py) — no row gather, no backward scatter-add.
        kv = jnp.concatenate([k, v], axis=-1)
        if local is not None:
            from ..ops.tile_gather import tile_window_gather_auto

            kv_nb = tile_window_gather_auto(kv, nb_idx, local[0], local[1])
            shadow = local[0] * local[1]
        else:
            kv_nb = batch_gather(kv, nb_idx)
            shadow = None
        k_nb, v_nb = kv_nb[..., :c], kv_nb[..., c:]
        if rel is None:
            if local is not None:
                raise ValueError("tile-local attention needs precomputed rel")
            p_nb = batch_gather(p, nb_idx)
            rel = p_nb - p[:, :, None, :]
        p_r = rel.astype(self.dtype)

        # positional encoding: Dense(3) → BN → ReLU → Dense(c)
        pe = dense(3, "p_fc1")(p_r)
        pe = nn.relu(bn("p_bn")(pe))
        pe = dense(c, "p_fc2")(pe)

        # weight tower: BN → ReLU → Dense(c/s) → BN → ReLU → Dense(c/s)
        w = k_nb - q[:, :, None, :] + pe
        w = nn.relu(bn("w_bn1")(w))
        w = dense(c // s, "w_fc1")(w)
        w = nn.relu(bn("w_bn2")(w))
        w = dense(c // s, "w_fc2")(w)
        w = w.astype(jnp.float32)
        if shadow is not None:
            # tiny levels can pad missing neighbors with the shadow index;
            # slot 0 is always the query itself (ensure_self), so the
            # masked softmax never sees an all-invalid row
            w = jnp.where((nb_idx == shadow)[..., None], -jnp.inf, w)
        w = jax.nn.softmax(w, axis=2).astype(self.dtype)  # over K

        b, n, kk, _ = v_nb.shape
        vp = (v_nb + pe).reshape(b, n, kk, s, c // s)
        out = jnp.sum(vp * w[:, :, :, None, :], axis=2)
        return out.reshape(b, n, c)


class TransitionDown(nn.Module):
    """Strided downsampling: gather k neighbors of each sampled point from the
    previous level, concat relative xyz, Dense(no bias)+BN+ReLU, max-pool over
    k (pytorch/model/blocks.py:59-74). With stride 1 it is a plain
    Dense+BN+ReLU (blocks.py:75-76)."""

    out_planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, p_prev, x_prev, p_cur=None, down_idx=None, train: bool = True,
        rel=None,
    ):
        dense = nn.Dense(self.out_planes, use_bias=False, dtype=self.dtype)
        bn = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32,
        )
        if self.stride == 1:
            return nn.relu(bn(dense(x_prev)))

        x_nb = batch_gather(x_prev, down_idx)  # [B, M, K, c]
        if rel is None:
            p_nb = batch_gather(p_prev, down_idx)
            rel = p_nb - p_cur[:, :, None, :]
        rel = rel.astype(self.dtype)
        g = jnp.concatenate([rel, x_nb], axis=-1)
        g = nn.relu(bn(dense(g)))
        return jnp.max(g, axis=2)


class TransitionUp(nn.Module):
    """Decoder fusion: linear1(x_skip) + IDW-interp(linear2(x_deep)) using
    precomputed up indices/weights (pytorch/model/blocks.py:105-108). The
    bottleneck variant (`is_head`) concatenates a per-cloud global mean
    (blocks.py:90-104)."""

    out_planes: int
    is_head: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_skip, x_deep=None, up_idx=None, up_w=None, train: bool = True):
        def mlp(d, name, with_bn=True, act=True):
            def f(y):
                y = nn.Dense(d, dtype=self.dtype, name=f"{name}_fc")(y)
                if with_bn:
                    y = nn.BatchNorm(
                        use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        dtype=jnp.float32, name=f"{name}_bn",
                    )(y)
                return nn.relu(y) if act else y
            return f

        c = self.out_planes
        if self.is_head:
            # x_skip: [B, N, c]; global mean per cloud → linear2 (no BN) → tile
            g = jnp.mean(x_skip, axis=1, keepdims=True)
            g = mlp(c, "linear2", with_bn=False)(g)
            g = jnp.broadcast_to(g, x_skip.shape[:2] + (c,))
            y = jnp.concatenate([x_skip, g], axis=-1)
            return mlp(c, "linear1")(y)

        deep = mlp(c, "linear2")(x_deep)  # [B, M, c]
        deep_up = batch_gather(deep, up_idx)  # [B, N, k_up, c]
        deep_up = jnp.sum(deep_up * up_w[..., None].astype(deep_up.dtype), axis=2)
        return mlp(c, "linear1")(x_skip) + deep_up


class PointTransformerBlock(nn.Module):
    """Residual block: Dense+BN+ReLU → transformer+BN+ReLU → Dense+BN, then
    ReLU(x + identity) (pytorch/model/blocks.py:125-133)."""

    planes: int
    share_planes: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, p, x, nb_idx, train: bool = True, rel=None, local=None):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )
        identity = x
        y = nn.Dense(self.planes, use_bias=False, dtype=self.dtype, name="linear1")(x)
        y = nn.relu(bn("bn1")(y))
        y = PointTransformerLayer(
            self.planes, self.share_planes, dtype=self.dtype, name="transformer2"
        )(p, y, nb_idx, train, rel=rel, local=local)
        y = nn.relu(bn("bn2")(y))
        y = nn.Dense(self.planes, use_bias=False, dtype=self.dtype, name="linear3")(y)
        y = bn("bn3")(y)
        return nn.relu(y + identity)


class MLPTower(nn.Module):
    """Dense(+BN+ReLU) tower: the reference's MLP / MLPbyOps f_out→latent /
    logits inference towers (pytorch/model/blocks.py:157-248). `dims` lists
    hidden+output widths; the last layer is a bare linear iff `final_linear`.
    """

    dims: Sequence[int]
    final_linear: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, d in enumerate(self.dims):
            last = i == len(self.dims) - 1
            x = nn.Dense(d, dtype=self.dtype, name=f"fc{i}")(x)
            if not (last and self.final_linear):
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=jnp.float32, name=f"bn{i}",
                )(x)
                x = nn.relu(x)
        return x
