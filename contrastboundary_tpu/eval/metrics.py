"""Confusion-matrix metrics: mIoU / OA / mACC with validation-proportion
rebalancing.

Reference parity: tensorflow/utils/metrics.py (`AverageMeter` :6-24,
`metrics_from_confusions` with proportion rebalancing :119-160) and
pytorch/util/common_util.py:25-52 `intersectionAndUnion`.

`confusion_matrix` is jittable (device-side histogram); the metric reduction
runs in numpy on host.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(
    pred: jax.Array, label: jax.Array, num_classes: int, ignore_label: int = -1
) -> jax.Array:
    """[C, C] confusion with rows = true label, cols = prediction.
    Jittable; invalid labels excluded."""
    valid = label != ignore_label
    l = jnp.where(valid, label, 0)
    p = jnp.clip(pred, 0, num_classes - 1)
    # one-hot matmul instead of a scatter-add histogram: the [B·N]-element
    # scatter costs ~0.6 ms/step at the flagship shape (round-4 profile)
    # while the [C, B·N] × [B·N, C] contraction is ~22 MFLOP on the MXU
    w = valid.reshape(-1).astype(jnp.float32)
    cls = jnp.arange(num_classes, dtype=l.dtype)
    oh_l = (l.reshape(-1)[:, None] == cls[None, :]).astype(jnp.float32)
    oh_p = (p.reshape(-1)[:, None] == cls[None, :]).astype(jnp.float32)
    return jnp.einsum(
        "nc,nd->cd", oh_l * w[:, None], oh_p,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def metrics_from_confusion(
    conf: np.ndarray, proportions: Optional[np.ndarray] = None
) -> dict:
    """mIoU / OA / mACC (+ per-class IoU) from a confusion matrix.

    `proportions`: true per-class point counts of the full clouds; when given,
    each row of the (subsampled) confusion is rescaled so class balance
    matches the full data — the reference's val-proportion rebalancing
    (tensorflow/utils/metrics.py:119-160).
    """
    conf = np.asarray(conf, np.float64)
    if proportions is not None:
        row = conf.sum(axis=1, keepdims=True)
        scale = np.asarray(proportions, np.float64)[:, None] / np.maximum(row, 1e-6)
        conf = conf * scale

    tp = np.diag(conf)
    fn = conf.sum(1) - tp
    fp = conf.sum(0) - tp
    denom = np.maximum(tp + fp + fn, 1e-6)
    iou = tp / denom
    present = conf.sum(1) > 0
    acc_per_class = tp / np.maximum(conf.sum(1), 1e-6)

    return {
        "mIoU": float(iou[present].mean()) if present.any() else 0.0,
        "OA": float(tp.sum() / np.maximum(conf.sum(), 1e-6)),
        "mACC": float(acc_per_class[present].mean()) if present.any() else 0.0,
        "IoUs": iou,
        "confusion": conf,
    }


class Metrics(dict):
    """Metric dict with ordered comparison: compare by `order` keys in
    sequence (reference utils/metrics.py:26-117 — used to pick the best
    snapshot by mIoU then OA)."""

    ORDER = ("mIoU", "OA", "mACC")

    def __init__(self, *args, order=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.order = tuple(order) if order else Metrics.ORDER

    def _key(self):
        return tuple(float(self.get(k, float("-inf"))) for k in self.order)

    def __lt__(self, other):
        return self._key() < other._key()

    def __gt__(self, other):
        return self._key() > other._key()

    def __ge__(self, other):
        return not self < other

    def __le__(self, other):
        return not self > other

    def scalar_str(self) -> str:
        return " ".join(
            f"{k}={float(v):.4f}" for k, v in self.items()
            if isinstance(v, (int, float))
        )


class AverageMeter:
    """Running average (reference utils/metrics.py:6-24)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
