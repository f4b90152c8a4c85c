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


class StaleBatchNorm(nn.Module):
    """BatchNorm that NORMALIZES with the running statistics (one momentum
    step stale) while still UPDATING them from the current batch statistics.

    Rationale (PERF.md round 4): with batch-stat BN the normalization
    coefficients depend on a reduction over the live [B, N, K, C] tensor, so
    nothing upstream can be folded; with stale stats the scale/shift is a
    per-channel affine KNOWN BEFORE THE STEP — XLA folds it into the
    adjacent matmuls and a fused attention kernel needs no stats pass (the
    batch stats for the update fall out of the main pass for free). Batch
    stats are computed under stop_gradient (the backward never differentiates
    through the reduction), and under a data-sharded jit the reduction spans
    the global batch (sync-BN), same as nn.BatchNorm.

    Training-dynamics deviation from the reference's standard BN
    (normalize-by-batch-stats): the fast presets may opt in via
    ModelConfig.bn_mode='stale'; `*_paper` semantics keep nn.BatchNorm.
    At eval (use_running_average=True) the two are identical.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        mean, var = ra_mean.value, ra_var.value  # pre-update (stale) stats
        if not self.use_running_average and not self.is_initializing():
            axes = tuple(range(x.ndim - 1))
            xf = jax.lax.stop_gradient(x.astype(jnp.float32))
            b_mean = jnp.mean(xf, axes)
            b_var = jnp.maximum(jnp.mean(xf * xf, axes) - b_mean * b_mean, 0.0)
            m = self.momentum
            ra_mean.value = m * mean + (1.0 - m) * b_mean
            ra_var.value = m * var + (1.0 - m) * b_var
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = x.astype(jnp.float32) * inv + (bias - mean * inv)
        return y.astype(self.dtype)


def _bn_dtype(model_dtype) -> Dtype:
    """BN compute/output dtype. Default f32 — the reference's (and torch
    AMP's) convention: BN math and the normalized activations stay full
    precision even in a mixed-precision net. `BN_COMPUTE=model` runs BN in
    the block dtype instead (bf16 in the fast presets): flax computes the
    batch statistics in f32 regardless (normalization._compute_stats
    promotes), so only the normalized ACTIVATIONS round to bf16 — the same
    rounding every nn.Dense in the block already applies on its input — but
    it halves the HBM bytes of every [B,N,K,C] tower tensor and its
    cotangent. Opt-in experiment knob; measured in scripts/ab_bn_dtype.py."""
    import os

    if model_dtype is not None and os.environ.get("BN_COMPUTE") == "model":
        return model_dtype
    return jnp.float32


def make_bn(mode: str, train: bool, name: Optional[str] = None,
            momentum: float = 0.9, epsilon: float = 1e-5,
            model_dtype: Optional[Dtype] = None):
    """BN factory shared by every block: mode 'batch' = exact nn.BatchNorm
    (reference semantics), 'stale' = StaleBatchNorm (fold-friendly).
    `model_dtype` is the enclosing block's compute dtype — only consumed
    under the opt-in `BN_COMPUTE=model` (see _bn_dtype)."""
    dtype = _bn_dtype(model_dtype)
    if mode == "stale":
        # pin the auto-name to nn.BatchNorm's so the param tree is identical
        # across bn_mode values (checkpoints stay interchangeable)
        return StaleBatchNorm(
            use_running_average=not train, momentum=momentum, epsilon=epsilon,
            dtype=dtype, name=name if name else "BatchNorm_0",
        )
    return nn.BatchNorm(
        use_running_average=not train, momentum=momentum, epsilon=epsilon,
        dtype=dtype, name=name,
    )


class _DenseParams(nn.Module):
    """Declares exactly nn.Dense's parameter tree ({kernel, bias}) without
    applying it — the fused attention kernel (ops/pallas/pt_attn.py) consumes
    the raw arrays, and the tree stays checkpoint-compatible with the XLA
    path's nn.Dense of the same name."""

    features: int
    in_features: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )

    def __call__(self):
        return self.kernel, self.bias


class _BNFold(nn.Module):
    """Declares exactly StaleBatchNorm's variable tree and exposes (a) the
    folded per-channel affine (scale', shift') from the PRE-update running
    stats and (b) an update from externally computed batch statistics (the
    fused kernel emits them). Checkpoint-compatible with StaleBatchNorm /
    nn.BatchNorm of the same name."""

    feat: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.feat,), jnp.float32
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.feat,), jnp.float32
        )
        self.mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.feat,), jnp.float32)
        )
        self.var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.feat,), jnp.float32)
        )

    def fold(self):
        s = self.scale * jax.lax.rsqrt(self.var.value + self.epsilon)
        return s, self.bias - self.mean.value * s

    def update(self, b_mean, b_var):
        if self.is_initializing():
            return
        m = self.momentum
        b_mean = jax.lax.stop_gradient(b_mean)
        b_var = jax.lax.stop_gradient(b_var)
        self.mean.value = m * self.mean.value + (1.0 - m) * b_mean
        self.var.value = m * self.var.value + (1.0 - m) * b_var


class PointTransformerLayer(nn.Module):
    """Vector self-attention over k precomputed neighbors.

    w = linear_w(k_nb − q + δ);  out = Σ_k softmax_k(w) ⊙ (v_nb + δ)
    with δ = linear_p(p_nb − p) and `share_planes` channels sharing one
    attention weight (pytorch/model/blocks.py:31-44).
    """

    out_planes: int
    share_planes: int = 8
    bn_mode: str = "batch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, p, x, nb_idx, train: bool = True, rel=None, local=None):
        c = self.out_planes
        s = self.share_planes
        dense = lambda d, name: nn.Dense(d, dtype=self.dtype, name=name)
        bn = lambda name: make_bn(
            self.bn_mode, train, name, model_dtype=self.dtype
        )

        q = dense(c, "linear_q")(x)
        k = dense(c, "linear_k")(x)
        v = dense(c, "linear_v")(x)

        # fused attention kernel (ops/pallas/pt_attn.py): the whole inner
        # loop per tile in VMEM. Needs tile-local indices + precomputed rel
        # (sorted layout) and fold-friendly BN (bn_mode='stale'); probe-
        # compiled once per shape with XLA fallback (PT_ATTN=auto|on|off).
        use_kernel = False
        if self.bn_mode == "stale" and local is not None and rel is not None:
            from ..ops.pallas.pt_attn import pt_attn_ok

            use_kernel = pt_attn_ok(
                local[0], local[1], nb_idx.shape[-1], c, s, self.dtype,
                n=x.shape[1],
            )
        if use_kernel:
            import os

            from ..ops.pallas.pt_attn import pt_attn

            interp = os.environ.get("PT_ATTN") == "interpret"
            tile_l, width_l = local
            window_l = (width_l - 1) // 2  # matches tile_gather.window_starts
            w1, b1 = _DenseParams(3, 3, name="p_fc1")()
            p_bn = _BNFold(3, name="p_bn")
            sp, hp = p_bn.fold()
            w2, b2 = _DenseParams(c, 3, name="p_fc2")()
            bn1 = _BNFold(c, name="w_bn1")
            g1, h1 = bn1.fold()
            w3, b3 = _DenseParams(c // s, c, name="w_fc1")()
            bn2 = _BNFold(c // s, name="w_bn2")
            g2, h2 = bn2.fold()
            w4, b4 = _DenseParams(c // s, c // s, name="w_fc2")()
            kv = jnp.concatenate([k, v], axis=-1)
            relf = rel.astype(jnp.float32)
            out, (s1m, s1q), (s2m, s2q) = pt_attn(
                q, kv, relf, nb_idx, tile_l, width_l, window_l, s, interp,
                w1 * sp[None, :], (b1 * sp + hp)[None, :],
                w2, b2[None, :], g1[None, :], h1[None, :],
                w3, b3[None, :], g2[None, :], h2[None, :],
                w4, b4[None, :],
            )
            if train:
                # running-stat updates: bn1/bn2 stats fall out of the kernel;
                # p_bn's input is an affine of rel, so its batch stats are
                # exact algebra over rel's first two moments (no extra pass)
                bn1.update(s1m, jnp.maximum(s1q - s1m * s1m, 0.0))
                bn2.update(s2m, jnp.maximum(s2q - s2m * s2m, 0.0))
                rf = jax.lax.stop_gradient(relf).reshape(-1, 3)
                mean_rel = jnp.mean(rf, axis=0)
                m2 = rf.T @ rf / rf.shape[0]
                pe1_mean = mean_rel @ w1 + b1
                pe1_sq = (
                    jnp.einsum("ij,ik,kj->j", w1, m2, w1)
                    + 2.0 * b1 * (mean_rel @ w1)
                    + b1 * b1
                )
                p_bn.update(
                    pe1_mean, jnp.maximum(pe1_sq - pe1_mean * pe1_mean, 0.0)
                )
            return out

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
    bn_mode: str = "batch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, p_prev, x_prev, p_cur=None, down_idx=None, train: bool = True,
        rel=None, local=None,
    ):
        dense = nn.Dense(self.out_planes, use_bias=False, dtype=self.dtype)
        bn = make_bn(self.bn_mode, train, model_dtype=self.dtype)  # auto-named, keeps old param trees
        if self.stride == 1:
            return nn.relu(bn(dense(x_prev)))

        if local is not None:
            # sorted layout (round 4): ONE fused [p_prev | x_prev] cross-
            # window one-hot matmul gather (ops/tile_gather.py) replaces the
            # row gather + its backward scatter-add, and shares the one-hot
            # between the rel and feature gathers (`rel` is ignored — the
            # pyramid's copy DCEs away when unused)
            from ..ops.tile_gather import cross_window_gather

            li, tile, width, window = local
            fused = jnp.concatenate(
                [p_prev.astype(x_prev.dtype), x_prev], axis=-1
            )
            nb = cross_window_gather(
                fused, li, p_prev.shape[1], tile, width, window
            )
            rel = nb[..., :3] - p_cur[:, :, None, :].astype(nb.dtype)
            rel = jnp.where((li < tile * width)[..., None], rel, 0.0)
            x_nb = nb[..., 3:]
        else:
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
    bn_mode: str = "batch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_skip, x_deep=None, up_idx=None, up_w=None,
                 train: bool = True, local=None):
        def mlp(d, name, with_bn=True, act=True):
            def f(y):
                y = nn.Dense(d, dtype=self.dtype, name=f"{name}_fc")(y)
                if with_bn:
                    y = make_bn(
                        self.bn_mode, train, f"{name}_bn",
                        model_dtype=self.dtype,
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
        if local is not None:
            # sorted layout (round 4): cross-window one-hot matmul IDW
            # gather — shadow rows are zeros, and their up_w is already 0
            from ..ops.tile_gather import cross_window_gather

            li, tile, width, window = local
            deep_up = cross_window_gather(
                deep, li, deep.shape[1], tile, width, window
            )
        else:
            deep_up = batch_gather(deep, up_idx)  # [B, N, k_up, c]
        deep_up = jnp.sum(deep_up * up_w[..., None].astype(deep_up.dtype), axis=2)
        return mlp(c, "linear1")(x_skip) + deep_up


class PointTransformerBlock(nn.Module):
    """Residual block: Dense+BN+ReLU → transformer+BN+ReLU → Dense+BN, then
    ReLU(x + identity) (pytorch/model/blocks.py:125-133)."""

    planes: int
    share_planes: int = 8
    bn_mode: str = "batch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, p, x, nb_idx, train: bool = True, rel=None, local=None):
        bn = lambda name: make_bn(
            self.bn_mode, train, name, model_dtype=self.dtype
        )
        identity = x
        y = nn.Dense(self.planes, use_bias=False, dtype=self.dtype, name="linear1")(x)
        y = nn.relu(bn("bn1")(y))
        y = PointTransformerLayer(
            self.planes, self.share_planes, bn_mode=self.bn_mode,
            dtype=self.dtype, name="transformer2"
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
    bn_mode: str = "batch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, d in enumerate(self.dims):
            last = i == len(self.dims) - 1
            x = nn.Dense(d, dtype=self.dtype, name=f"fc{i}")(x)
            if not (last and self.final_linear):
                x = make_bn(self.bn_mode, train, f"bn{i}", model_dtype=self.dtype)(x)
                x = nn.relu(x)
        return x
