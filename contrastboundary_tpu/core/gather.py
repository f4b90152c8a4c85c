"""Batched gather primitives with shadow-row semantics.

The reference handles ragged neighborhoods by appending a zero "shadow" row to
every feature tensor and padding invalid neighbor slots with index == N
(tensorflow/models/basic_operators.py:381-410 `tf_gather`;
tensorflow/ops/tf_custom_ops/tf_neighbors/tf_batch_neighbors.cpp shadow index).
Here the same semantics are expressed as masked dense gathers over fixed-shape
`[B, N, ...]` arrays — XLA lowers them to single fused gathers, no
concatenation of shadow rows needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Per-batch fancy gather.

    Args:
      x:   [B, N, ...] values.
      idx: [B, ...] integer indices into axis 1 of ``x`` (all < N).

    Returns:
      [B, *idx.shape[1:], *x.shape[2:]] gathered values.
    """
    return jax.vmap(lambda xb, ib: xb[ib])(x, idx)


def shadow_gather(x: jax.Array, idx: jax.Array, fill: float = 0.0):
    """Gather with shadow semantics: ``idx == N`` marks an invalid slot.

    Args:
      x:    [B, N, ...] values.
      idx:  [B, ...] indices in ``[0, N]``; ``N`` means invalid.
      fill: value substituted for invalid slots.

    Returns:
      (gathered, valid) where ``gathered`` has shape
      [B, *idx.shape[1:], *x.shape[2:]] and ``valid`` is a bool mask with the
      shape of ``idx``.
    """
    n = x.shape[1]
    valid = idx < n
    safe = jnp.where(valid, idx, 0)
    out = batch_gather(x, safe)
    extra = out.ndim - valid.ndim
    mask = valid.reshape(valid.shape + (1,) * extra)
    out = jnp.where(mask, out, jnp.asarray(fill, dtype=out.dtype))
    return out, valid


def shadow_gather_labels(labels: jax.Array, idx: jax.Array, fill: int = -1):
    """Gather integer labels with shadow semantics; invalid slots become
    ``fill`` (default -1, the reference's invalid-label convention).

    Args:
      labels: [B, N] integer labels.
      idx:    [B, ...] indices in ``[0, N]``.

    Returns:
      (gathered_labels, valid) with gathered_labels shaped like ``idx``.
    """
    n = labels.shape[1]
    valid = idx < n
    safe = jnp.where(valid, idx, 0)
    out = batch_gather(labels, safe)
    out = jnp.where(valid, out, jnp.asarray(fill, dtype=out.dtype))
    return out, valid
