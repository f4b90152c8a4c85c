"""Static-cap calibration — the TPU answer to the reference's pipeline
calibration.

The reference measures its (dynamically ragged) pipeline before training:
`calibrate_batches` picks the batch size whose average stacked-point count
hits a target (tensorflow/datasets/base.py:158-197), and
`calibrate_neighbors` histograms per-point radius-neighbor counts over
sample batches and keeps the percentile that leaves <`keep_ratio` of
neighbors untouched, yielding `neighborhood_limits`
(tensorflow/datasets/base.py:199-294).

Under XLA everything is static, so calibration cannot run inside the
pipeline — but the same MEASUREMENT still decides the static caps. This
module runs the reference's histogram logic as a one-time host pass (numpy +
cKDTree over sample crops) and returns the values to put in the config:
per-level `neighborhood_limits` (= `PyramidSpec.k_self`/`k_down` caps for
the ConvNet radius family) and the crop/batch sizes.
"""
from __future__ import annotations

from typing import Iterable, Optional, Sequence, Tuple

import numpy as np


def _subsample_np(points: np.ndarray, cell: float) -> np.ndarray:
    """Host voxel-grid subsample (barycenters), matching the pyramid's grid
    levels (reference grid pyramid, datasets/base.py:767-842)."""
    from ..native import grid_subsample

    sub, _, _ = grid_subsample(points.astype(np.float32), None, None, cell)
    return sub


def calibrate_neighborhood_limits(
    clouds: Iterable[np.ndarray],
    radii: Sequence[float],
    voxel_sizes: Sequence[float],
    keep_ratio: float = 0.8,
    max_clouds: int = 10,
    hist_max: int = 256,
) -> Tuple[int, ...]:
    """Per-level neighbor caps from measured radius-neighbor histograms.

    For each pyramid level l: subsample sample clouds to the level's grid
    (`voxel_sizes[l]`; level 0 uses the raw crop), count neighbors within
    `radii[l]`, and return the smallest cap whose cumulative histogram covers
    `keep_ratio` of all neighbor slots — the reference's untouched-ratio
    criterion (datasets/base.py:199-294: `percentiles = cumsum(hist);
    limits = argmax(percentiles > keep_ratio * total)`).

    Returns a tuple usable as `ModelConfig.neighborhood_limits`.
    """
    from scipy.spatial import cKDTree

    clouds = [np.asarray(c, np.float32) for _, c in zip(range(max_clouds), clouds)]
    if not clouds:
        raise ValueError("need at least one sample cloud")
    limits = []
    for l, r in enumerate(radii):
        hist = np.zeros(hist_max + 1, np.int64)
        for pts in clouds:
            sub = pts if l == 0 or voxel_sizes[l] <= 0 else _subsample_np(
                pts, voxel_sizes[l]
            )
            if len(sub) < 2:
                continue
            tree = cKDTree(sub)
            counts = tree.query_ball_point(sub, r, return_length=True)
            np.add.at(hist, np.minimum(counts, hist_max), 1)
        total = hist.sum()
        if total == 0:
            limits.append(hist_max)
            continue
        # smallest neighbor count whose cumulative histogram reaches the
        # keep ratio — sum(cumsum < ratio*total), exactly the reference's
        # criterion (datasets/base.py:199-294)
        cum = np.cumsum(hist)
        limits.append(int(np.sum(cum < keep_ratio * total)))
    return tuple(limits)


def calibrate_crop_points(
    clouds: Iterable[np.ndarray],
    in_radius: float,
    voxel_size: float,
    percentile: float = 0.9,
    samples_per_cloud: int = 8,
    max_clouds: int = 10,
    seed: int = 0,
) -> int:
    """Static crop size for the radius-crop mode: sample sphere crops of
    `in_radius` from grid-subsampled clouds and return the `percentile`
    point count rounded up to a power of two — the fixed `n_points` that
    replaces the reference's average-batch-size calibration
    (datasets/base.py:158-197) under static shapes.
    """
    from scipy.spatial import cKDTree

    rng = np.random.RandomState(seed)
    counts = []
    for _, pts in zip(range(max_clouds), clouds):
        sub = _subsample_np(np.asarray(pts, np.float32), voxel_size)
        if len(sub) < 2:
            continue
        tree = cKDTree(sub)
        centers = sub[rng.randint(0, len(sub), samples_per_cloud)]
        counts.extend(
            tree.query_ball_point(c, in_radius, return_length=True)
            for c in centers
        )
    if not counts:
        raise ValueError("need at least one non-trivial sample cloud")
    target = float(np.percentile(counts, percentile * 100))
    return int(2 ** np.ceil(np.log2(max(target, 1.0))))
