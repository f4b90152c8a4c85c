"""Voting inference: potential-driven crop coverage + smoothed probability
accumulation + KDTree reprojection to the full cloud.

Reference parity:
  potential-based spatially-regular sampling — tensorflow/datasets/base.py:352-448
  (Tukey-weighted potentials guarantee every point is eventually covered);
  vote loop until min potential > num_votes, probs[inds] = s·old + (1−s)·new
  with smoothing s = 0.95 (val) / 0.98 (test) — tensorflow/utils/tester.py:151-217,
  :579-644; full-cloud reprojection via nearest subsampled point —
  tensorflow/datasets/tf_s3dis_dataset.py:292-331.

Design split: potentials/accumulators are host-side numpy (inherently
sequential, tiny), while every forward runs as fixed-shape batches on device
— crops are padded by repetition so the device program is the training
eval_step unchanged.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np
from scipy.spatial import cKDTree


class CloudVoteState:
    """Per-room accumulator over the (voxel-subsampled) eval cloud."""

    def __init__(self, coord, feat, label, num_classes: int):
        self.coord = coord
        self.feat = feat
        self.label = label
        self.num_classes = num_classes
        n = len(coord)
        self.probs = np.zeros((n, num_classes), np.float32)
        self.counts = np.zeros((n,), np.int64)
        self.potentials = np.random.RandomState(42).rand(n).astype(np.float64) * 1e-3
        self.tree = cKDTree(coord)

    def min_potential(self) -> float:
        return float(self.potentials.min())

    def reset_potentials(self):
        """New vote round: fresh coverage potentials, accumulated probs kept
        (the reference's running vote across validation rounds,
        tensorflow/utils/tester.py:101-148)."""
        self.potentials = (
            np.random.RandomState(42).rand(len(self.coord)).astype(np.float64)
            * 1e-3
        )

    def next_crop(self, n_points: int):
        """Pick the min-potential point as center, crop its n_points nearest,
        bump potentials with Tukey weights (1 − d²/r²)²."""
        center_i = int(np.argmin(self.potentials))
        n = len(self.coord)
        k = min(n_points, n)
        d, idx = self.tree.query(self.coord[center_i], k=k)
        d, idx = np.atleast_1d(d), np.atleast_1d(idx)
        r2 = max(float(d.max()) ** 2, 1e-9)
        self.potentials[idx] += np.square(1 - np.square(d) / r2)
        return idx

    def accumulate(self, src_idx, probs, smooth: float):
        """probs [n_points, C] predicted for crop rows mapping to src_idx.
        Duplicate (padded) rows vote multiple times — last write wins within
        one crop, matching the reference's per-crop single update."""
        uniq, first = np.unique(src_idx, return_index=True)
        p = probs[first]
        self.probs[uniq] = smooth * self.probs[uniq] + (1 - smooth) * p
        self.counts[uniq] += 1

    def predictions(self):
        return self.probs.argmax(-1)


class VotingEvaluator:
    """Drives eval over all rooms of a dataset split until every point has
    been voted on ≥ num_votes times (via potentials)."""

    def __init__(
        self,
        dataset,
        predict_fn: Callable[[Dict[str, np.ndarray]], np.ndarray],
        num_classes: int,
        n_points: int,
        batch_size: int = 4,
        voxel_size: float = 0.04,
        num_votes: float = 1.0,
        smooth: float = 0.95,
        seed: int = 0,
    ):
        """predict_fn: batch dict {points, features} [B,N,...] → probs [B,N,C]."""
        self.dataset = dataset
        self.predict_fn = predict_fn
        self.num_classes = num_classes
        self.n_points = n_points
        self.batch_size = batch_size
        self.voxel_size = voxel_size
        self.num_votes = num_votes
        self.smooth = smooth
        self.seed = seed

        from ..data.pipeline import voxelize

        self.clouds: List[CloudVoteState] = []
        self.full_labels: List[np.ndarray] = []
        self.proj: List[np.ndarray] = []
        for r in range(dataset.num_rooms):
            coord, feat, label = dataset.room(r)
            coord = coord - coord.min(0)
            rng = np.random.default_rng((seed, r))
            if voxel_size:
                sub = voxelize(coord, voxel_size, rng, mode="train")
            else:
                sub = np.arange(len(coord))
            cs = CloudVoteState(
                coord[sub].astype(np.float32),
                (feat[sub] / 255.0).astype(np.float32),
                label[sub].astype(np.int32),
                num_classes,
            )
            self.clouds.append(cs)
            self.full_labels.append(label.astype(np.int32))
            # full-cloud reprojection: nearest subsampled point per full point
            _, proj = cs.tree.query(coord, k=1)
            self.proj.append(proj.astype(np.int64))

    def _make_batch(self, crops):
        pts = np.stack([c.coord[i] for c, i in crops])
        fts = np.stack([c.feat[i] for c, i in crops])
        mins = pts.min(axis=1, keepdims=True)
        return {"points": pts - mins, "features": fts}

    def reset_potentials(self):
        for c in self.clouds:
            c.reset_potentials()

    def run(self, max_steps: int = 10_000, progress: Optional[Callable] = None):
        """Vote until min potential > num_votes everywhere. Returns metrics
        dict (sub-cloud and reprojected full-cloud)."""
        rng = np.random.default_rng(self.seed)
        step = 0
        while step < max_steps:
            pending = [c for c in self.clouds if c.min_potential() < self.num_votes]
            if not pending:
                break
            crops = []
            for _ in range(self.batch_size):
                c = pending[int(rng.integers(len(pending)))]
                idx = c.next_crop(self.n_points)
                if len(idx) < self.n_points:
                    extra = rng.integers(0, len(idx), self.n_points - len(idx))
                    idx = np.concatenate([idx, idx[extra]])
                crops.append((c, idx))
            probs = np.asarray(self.predict_fn(self._make_batch(crops)))
            for (c, idx), p in zip(crops, probs):
                c.accumulate(idx, p, self.smooth)
            step += 1
            if progress and step % 20 == 0:
                progress(step, min(c.min_potential() for c in self.clouds))
        return self.metrics()

    def metrics(self):
        from .metrics import metrics_from_confusion

        c = self.num_classes
        conf_sub = np.zeros((c, c), np.float64)
        conf_full = np.zeros((c, c), np.float64)
        for cs, full_label, proj in zip(self.clouds, self.full_labels, self.proj):
            pred = cs.predictions()
            vs = cs.label >= 0  # ignore-labeled points excluded (label -1)
            np.add.at(conf_sub, (cs.label[vs], pred[vs]), 1)
            vf = full_label >= 0
            np.add.at(conf_full, (full_label[vf], pred[proj][vf]), 1)
        out = {
            "sub": metrics_from_confusion(conf_sub),
            "full": metrics_from_confusion(conf_full),
        }
        return out
