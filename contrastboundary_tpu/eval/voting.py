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
        # optional per-stage feature accumulators (same smoothing as probs) —
        # the reference's eval feature extraction (tester.py:51-96)
        self.features: Dict[str, np.ndarray] = {}
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

    def next_crop(self, n_points: int, crop_mode: str = "count",
                  in_radius: float = 2.0, rng=None):
        """Pick the min-potential point as center, crop around it, bump
        potentials with Tukey weights (1 − d²/r²)².

        crop_mode 'count': the n_points nearest (PT-stack nearest-N crop);
        'radius': every point inside an `in_radius` sphere, capped at
        n_points by uniform choice keeping the center — the TF stack's val
        generator (tensorflow/datasets/base.py:352-448, cap at :401-403).
        Potentials bump over the WHOLE sphere either way."""
        center_i = int(np.argmin(self.potentials))
        n = len(self.coord)
        if crop_mode == "radius":
            idx = np.asarray(
                self.tree.query_ball_point(self.coord[center_i], in_radius),
                dtype=np.int64,
            )
            if idx.size == 0:
                idx = np.array([center_i], np.int64)
            d2 = np.square(self.coord[idx] - self.coord[center_i]).sum(-1)
            r2 = in_radius * in_radius
            self.potentials[idx] += np.square(1 - d2 / r2)
            if len(idx) > n_points:
                rng = rng or np.random.default_rng(center_i)
                keep = rng.choice(len(idx), n_points - 1, replace=False)
                idx = np.concatenate(
                    [np.array([center_i], np.int64), idx[keep]]
                )[:n_points]
            return idx
        k = min(n_points, n)
        d, idx = self.tree.query(self.coord[center_i], k=k)
        d, idx = np.atleast_1d(d), np.atleast_1d(idx)
        r2 = max(float(d.max()) ** 2, 1e-9)
        self.potentials[idx] += np.square(1 - np.square(d) / r2)
        return idx

    def accumulate(self, src_idx, probs, smooth: float, feats=None):
        """probs [n_points, C] predicted for crop rows mapping to src_idx.
        Duplicate (padded) rows vote multiple times — last write wins within
        one crop, matching the reference's per-crop single update.
        feats: optional {name: [n_points, d]} per-stage features, smoothed
        like probs."""
        uniq, first = np.unique(src_idx, return_index=True)
        p = probs[first]
        self.probs[uniq] = smooth * self.probs[uniq] + (1 - smooth) * p
        self.counts[uniq] += 1
        if feats:
            n = len(self.coord)
            for k, v in feats.items():
                acc = self.features.setdefault(
                    k, np.zeros((n, v.shape[-1]), np.float32)
                )
                acc[uniq] = smooth * acc[uniq] + (1 - smooth) * v[first]

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
        crop_mode: str = "count",
        in_radius: float = 2.0,
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
        self.crop_mode = crop_mode
        self.in_radius = in_radius

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
                idx = c.next_crop(
                    self.n_points, crop_mode=self.crop_mode,
                    in_radius=self.in_radius, rng=rng,
                )
                if len(idx) < self.n_points:
                    extra = rng.integers(0, len(idx), self.n_points - len(idx))
                    idx = np.concatenate([idx, idx[extra]])
                crops.append((c, idx))
            out = self.predict_fn(self._make_batch(crops))
            # predict_fn returns probs [B,N,C], or (probs, {name: [B,N,d]})
            # when per-stage features are extracted for the boundary stats
            feats_b = None
            if isinstance(out, tuple):
                out, feats_b = out
                feats_b = {k: np.asarray(v) for k, v in feats_b.items()}
            probs = np.asarray(out)
            for j, ((c, idx), p) in enumerate(zip(crops, probs)):
                fj = (
                    {k: v[j] for k, v in feats_b.items()} if feats_b else None
                )
                c.accumulate(idx, p, self.smooth, feats=fj)
            step += 1
            if progress and step % 20 == 0:
                progress(step, min(c.min_potential() for c in self.clouds))
        return self.metrics()

    def metrics(self):
        from .metrics import metrics_from_confusion

        c = self.num_classes
        conf_sub = np.zeros((c, c), np.float64)
        conf_full = np.zeros((c, c), np.float64)
        props = np.zeros(c, np.float64)
        for cs, full_label, proj in zip(self.clouds, self.full_labels, self.proj):
            pred = cs.predictions()
            vs = cs.label >= 0  # ignore-labeled points excluded (label -1)
            np.add.at(conf_sub, (cs.label[vs], pred[vs]), 1)
            vf = full_label >= 0
            np.add.at(conf_full, (full_label[vf], pred[proj][vf]), 1)
            props += np.bincount(full_label[vf], minlength=c)
        out = {
            # sub-cloud metrics are proportion-rebalanced to the FULL clouds'
            # class counts — the reference's val_proportions rescaling
            # (tensorflow/utils/tester.py:205, utils/metrics.py:119-160)
            "sub": metrics_from_confusion(conf_sub, proportions=props),
            "full": metrics_from_confusion(conf_full),
        }
        return out
