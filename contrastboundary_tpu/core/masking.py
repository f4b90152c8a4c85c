"""Masked reductions and the boundary mask.

Reference parity:
  masked softmax — tensorflow/models/basic_operators.py:15-81
  boundary mask  — tensorflow/models/basic_operators.py:624-650 and
                   pytorch/model/basic_operators.py:69-97 `get_boundary_mask`
Constants `_inf = 1e9`, `_eps = 1e-12` match
tensorflow/models/basic_operators.py:350-351.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .gather import shadow_gather_labels

INF = 1e9
EPS = 1e-12


def masked_softmax(logits: jax.Array, mask: jax.Array, axis: int = -1) -> jax.Array:
    """Softmax over ``axis`` with invalid entries (mask == False) zeroed.

    Rows with no valid entry produce all zeros (not NaN).
    """
    mask = mask.astype(bool)
    neg = jnp.asarray(-INF, dtype=logits.dtype)
    z = jnp.where(mask, logits, neg)
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=axis, keepdims=True))
    e = jnp.exp(z) * mask.astype(logits.dtype)
    s = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(s, EPS)


def masked_mean(x: jax.Array, mask: jax.Array, axis=None, keepdims: bool = False):
    """Mean of ``x`` over entries where ``mask`` is true; 0 when mask is empty."""
    m = mask.astype(x.dtype)
    num = jnp.sum(x * m, axis=axis, keepdims=keepdims)
    den = jnp.sum(m, axis=axis, keepdims=keepdims)
    return num / jnp.maximum(den, 1.0)


def masked_max(x: jax.Array, mask: jax.Array, axis=None, keepdims: bool = False):
    """Max of ``x`` over valid entries; -INF-floored to 0-safe minimum."""
    neg = jnp.asarray(-INF, dtype=x.dtype)
    return jnp.max(jnp.where(mask, x, neg), axis=axis, keepdims=keepdims)


def boundary_mask(
    labels: jax.Array,
    neighbor_idx: jax.Array,
    valid_mask: jax.Array | None = None,
    get_plain: bool = False,
    get_cnt: bool = False,
):
    """Boundary mask: a point is *boundary* iff any valid neighbor has a
    different (valid) label. Matches the reference's `get_boundary_mask`
    (pytorch/model/basic_operators.py:69-97).

    Args:
      labels:       [B, N] int labels; < 0 means invalid.
      neighbor_idx: [B, N, K] indices in [0, N] (N = shadow/invalid).
      valid_mask:   optional [B, N] bool mask of valid centers.
      get_plain:    also return the *plain* (interior) mask: all valid
                    neighbors share the center's label.
      get_cnt:      return the count of differing neighbors instead of a bool.

    Returns:
      bound [B, N] (bool or int), optionally (bound, plain).
    """
    nb_label, idx_valid = shadow_gather_labels(labels, neighbor_idx, fill=-1)
    valid_neighbor = (nb_label >= 0) & idx_valid
    center = labels[..., None]
    neq = (center != nb_label) & valid_neighbor

    if get_cnt:
        bound = jnp.sum(neq.astype(jnp.int32), axis=-1)
        if valid_mask is not None:
            bound = bound * valid_mask.astype(bound.dtype)
    else:
        bound = jnp.any(neq, axis=-1)
        if valid_mask is not None:
            bound = bound & valid_mask

    if get_plain:
        eq = (center == nb_label) | ~valid_neighbor
        plain = jnp.all(eq, axis=-1)
        if valid_mask is not None:
            plain = plain & valid_mask
        return bound, plain
    return bound
