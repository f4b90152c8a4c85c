"""Global pooling and feature normalize/combine helpers.

Reference parity: tensorflow/models/basic_operators.py —
global avg/max pooling over per-cloud segments (:292-347), `normalize`
l2/l1/softmax (:518-559), `combine` concat/sum/mul/max (:561-608). In the
batch-dense layout the ragged `out_batches` segments become plain axis-1
reductions with an optional validity mask.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .masking import EPS, INF, masked_mean


def global_avg_pool(x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """[B, N, C] → [B, C] mean over valid points."""
    if mask is None:
        return jnp.mean(x, axis=1)
    return masked_mean(x, mask[..., None], axis=1)


def global_max_pool(x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """[B, N, C] → [B, C] max over valid points."""
    if mask is None:
        return jnp.max(x, axis=1)
    neg = jnp.asarray(-INF, x.dtype)
    return jnp.max(jnp.where(mask[..., None], x, neg), axis=1)


def normalize(x: jax.Array, kind: str = "l2", axis: int = -1) -> jax.Array:
    """l2 | l1 | softmax | norm (zero-mean unit-var)."""
    if kind == "l2":
        return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), EPS)
    if kind == "l1":
        return x / jnp.maximum(jnp.sum(jnp.abs(x), axis=axis, keepdims=True), EPS)
    if kind == "softmax":
        return jax.nn.softmax(x, axis=axis)
    if kind == "norm":
        mu = jnp.mean(x, axis=axis, keepdims=True)
        sd = jnp.std(x, axis=axis, keepdims=True)
        return (x - mu) / jnp.maximum(sd, EPS)
    raise ValueError(f"unknown normalize kind {kind!r}")


def combine(xs: Sequence[jax.Array], kind: str = "concat", axis: int = -1):
    """concat | sum | mul | max | mean over a list of same-shaped features."""
    if kind == "concat":
        return jnp.concatenate(list(xs), axis=axis)
    if kind == "sum":
        return sum(xs[1:], xs[0])
    if kind == "mul":
        out = xs[0]
        for x in xs[1:]:
            out = out * x
        return out
    if kind == "max":
        return jnp.max(jnp.stack(list(xs)), axis=0)
    if kind == "mean":
        return jnp.mean(jnp.stack(list(xs)), axis=0)
    raise ValueError(f"unknown combine kind {kind!r}")
