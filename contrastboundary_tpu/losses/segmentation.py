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
    # one-hot contraction instead of take_along_axis: a [B·N]-row gather is
    # row-rate-bound (~0.8 ms/step at the flagship shape, round-4 profile)
    # and its backward is a scatter; the one-hot multiply-reduce is VPU
    # elementwise with a broadcast backward
    oh = jax.nn.one_hot(safe, num_classes, dtype=logp.dtype)
    nll = -jnp.sum(oh * logp, axis=-1)
    w = valid.astype(jnp.float32)
    if weight is not None:
        w = w * weight
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def sigmoid_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    ignore_label: int = -1,
) -> jax.Array:
    """Binary sigmoid cross-entropy — the reference mlp-head 'sigmoid' loss
    (tensorflow/models/heads/head.py:216-221: flattened logits vs int labels
    cast to float). Requires single-channel logits (binary task); mean over
    points whose label != ignore_label."""
    if logits.shape[-1] != 1:
        raise ValueError(
            "the 'sigmoid' mlp-head loss is element-wise binary CE; logits "
            f"must have 1 channel (got {logits.shape[-1]}) — the reference's "
            "flattened shapes only align for binary heads"
        )
    valid = labels != ignore_label
    y = jnp.where(valid, labels, 0).astype(jnp.float32)
    x = logits[..., 0].astype(jnp.float32)
    # numerically stable BCE-with-logits: max(x,0) − x·y + log1p(e^{−|x|})
    bce = jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    w = valid.astype(jnp.float32)
    return jnp.sum(bce * w) / jnp.maximum(jnp.sum(w), 1.0)


def inverse_frequency_weights(counts, power: float = 0.5):
    """Per-class loss weights from train-split label counts: w_c ∝
    1/freq_c^power (power 0.5 = inverse-sqrt, the standard imbalance
    recipe), normalized to mean 1 over PRESENT classes so the re-weighted
    loss keeps the unweighted loss's scale; absent classes get weight 1.

    Backs the mlp-head 'class' token. The reference's own dispatch
    (tensorflow/models/heads/head.py:326 → get_class_weight) is an
    undefined symbol there — these are the semantics we give it.
    Returns a plain tuple (hashable → usable in TrainStepConfig)."""
    import numpy as np

    counts = np.asarray(counts, np.float64)
    present = counts > 0
    if not present.any():
        return tuple(np.ones_like(counts))
    freq = counts / counts[present].sum()
    w = np.ones_like(counts)
    w[present] = 1.0 / np.power(freq[present], power)
    w[present] /= w[present].mean()
    return tuple(float(x) for x in w)


def soft_cross_entropy(logits: jax.Array, soft_labels: jax.Array) -> jax.Array:
    """Cross-entropy against a soft label distribution — the reference's
    downsampled-stage supervision (tensorflow/models/heads/head.py:303-317:
    `mlp_head.pred` with stage-(n,i) sub-scene soft labels). Rows whose soft
    label sums to 0 (all source neighbors ignore-labeled) are masked out.

    logits [..., num_classes], soft_labels [..., num_classes] (rows sum to
    ≤1; an all-zero row marks an ignored point)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    mass = jnp.sum(soft_labels, axis=-1)
    valid = mass > 0
    # renormalize partial rows (some neighbors ignored) to a distribution
    soft = soft_labels / jnp.maximum(mass, 1e-12)[..., None]
    nll = -jnp.sum(soft * logp, axis=-1)
    w = valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
