"""Host-side sample preparation: voxelize → crop → fixed-size pad.

Same pipeline as pytorch/util/data_util.py:45-90 `data_prepare` and
util/voxelize.py:38-56, with one TPU-motivated addition: every crop is padded
(by resampling its own points with replacement) to a **static** `n_points`,
so the device sees one shape for the whole run. Padding by repetition keeps
every row a real point — KNN, BN and losses need no validity masks; the eval
accumulator simply lets duplicates vote more than once.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def voxelize(
    coord: np.ndarray,
    voxel_size: float,
    rng: Optional[np.random.Generator] = None,
    mode: str = "train",
):
    """Voxel-grid dedup of a whole cloud.

    mode 'train': returns indices picking one random point per occupied voxel
    (pytorch/util/voxelize.py mode 0).
    mode 'val': returns (sorted_indices, counts_per_voxel) — every point kept,
    grouped by voxel (mode 1), for the enumerate-duplicates eval protocol.
    """
    v = np.floor((coord - coord.min(0)) / voxel_size).astype(np.int64)
    dims = v.max(0) + 1
    key = (v[:, 0] * dims[1] + v[:, 1]) * dims[2] + v[:, 2]
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]
    _, starts, counts = np.unique(key_sorted, return_index=True, return_counts=True)
    if mode == "train":
        if rng is None:
            rng = np.random.default_rng()
        pick = starts + rng.integers(0, counts)
        return order[pick]
    return order, counts


def prepare_crop(
    coord: np.ndarray,
    feat: np.ndarray,
    label: np.ndarray,
    rng: np.random.Generator,
    voxel_size: float = 0.04,
    voxel_max: Optional[int] = 80000,
    transform=None,
    split: str = "train",
    shuffle: bool = True,
    crop_mode: str = "count",
    in_radius: float = 2.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One training/eval sample from a full room.

    train: augment → voxelize (random point per voxel) → crop → shuffle →
    zero-min coords, colors/255 (pytorch/util/data_util.py:45-90).

    crop_mode 'count' keeps the `voxel_max` nearest points around the center
    (the PT stack); 'radius' keeps points inside an `in_radius` sphere capped
    at voxel_max (the TF stack's in_radius=2.0 spheres,
    tensorflow/config/s3dis.py:57).
    """
    coord = np.asarray(coord, np.float64)
    feat = np.asarray(feat, np.float32)
    label = np.asarray(label)
    if transform is not None:
        coord, feat, label = transform(rng, coord, feat, label)

    if voxel_size:
        coord = coord - coord.min(0)
        idx = voxelize(coord, voxel_size, rng, mode="train")
        coord, feat, label = coord[idx], feat[idx], label[idx]

    n = len(coord)
    if voxel_max and (n > voxel_max or crop_mode == "radius"):
        center_i = int(rng.integers(n)) if "train" in split else n // 2
        d2 = np.sum((coord - coord[center_i]) ** 2, axis=1)
        if crop_mode == "radius":
            inside = np.flatnonzero(d2 <= in_radius**2)
            if len(inside) > voxel_max:
                inside = inside[np.argsort(d2[inside])[:voxel_max]]
            crop = inside if len(inside) else np.array([center_i])
        else:
            crop = np.argsort(d2)[:voxel_max]
        coord, feat, label = coord[crop], feat[crop], label[crop]

    if shuffle:
        perm = rng.permutation(len(coord))
        coord, feat, label = coord[perm], feat[perm], label[perm]

    coord = coord - coord.min(0)
    return (
        coord.astype(np.float32),
        feat.astype(np.float32) / 255.0,
        label.astype(np.int32),
    )


def pad_to_fixed_size(
    coord: np.ndarray,
    feat: np.ndarray,
    label: np.ndarray,
    n_points: int,
    rng: np.random.Generator,
):
    """Pad (by resampling with replacement) or crop (random subset) to exactly
    `n_points`. Returns (coord, feat, label, src_idx) where src_idx maps each
    output row to its source row — eval accumulates by src_idx."""
    n = len(coord)
    if n == n_points:
        idx = np.arange(n)
    elif n > n_points:
        idx = rng.choice(n, n_points, replace=False)
    else:
        extra = rng.integers(0, n, n_points - n)
        idx = np.concatenate([np.arange(n), extra])
    return coord[idx], feat[idx], label[idx], idx.astype(np.int32)
