"""Segmentation cross-entropy with ignore-label masking.

Equivalent to `nn.CrossEntropyLoss(ignore_index=...)` used by the reference
(pytorch/model/pointtransformer_seg.py:20) and the TF `mlp_head.calc_loss`
(tensorflow/models/heads/head.py:197-244): mean over valid points.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    ignore_label: int = -1,
    weight: jax.Array | None = None,
) -> jax.Array:
    """Mean CE over points whose label != ignore_label.

    logits [..., num_classes] float, labels [...] int.
    `weight` optionally adds a per-point weight (e.g. duplicate-padding
    deweighting).
    """
    num_classes = logits.shape[-1]
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    w = valid.astype(jnp.float32)
    if weight is not None:
        w = w * weight
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
