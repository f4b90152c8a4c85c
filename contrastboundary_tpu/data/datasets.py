"""Additional datasets: ScanNet, Semantic3D, NPM3D.

Structural equivalents of the reference's dataset classes
(tensorflow/datasets/tf_scannet_dataset.py, tf_semantic3d_dataset.py,
tf_npm3d_dataset.py): per-dataset class lists, ignored labels, label↔index
remapping with ignored classes dropped (datasets/base.py:43-63), and the
Semantic3D ascii submission writer (tf_semantic3d_dataset.py test split).
All consume the same cached `<name>.npy` xyzrgbl room format as S3DIS; raw
converters live alongside (ScanNet mesh rasterization needs the gated
download, so ingest accepts pre-sampled point clouds).
"""
from __future__ import annotations

import os
import zipfile
from typing import Dict, List, Optional, Sequence

import numpy as np

SCANNET_NAMES = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
]
# raw ScanNet label ids for the 20-class benchmark (scannetv2-labels tsv)
SCANNET_RAW_IDS = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39]

SEMANTIC3D_NAMES = [
    "man-made terrain", "natural terrain", "high vegetation",
    "low vegetation", "buildings", "hard scape", "scanning artefacts", "cars",
]

NPM3D_NAMES = [
    "ground", "building", "pole", "bollard", "trash can", "barrier",
    "pedestrian", "car", "natural",
]


class LabelMap:
    """label↔idx maps dropping ignored labels (reference datasets/base.py:43-63):
    training indices are contiguous over valid classes; ignored raw labels map
    to `ignore_index`."""

    def __init__(self, raw_labels: Sequence[int], ignored: Sequence[int] = (),
                 ignore_index: int = -1):
        self.valid = [l for l in raw_labels if l not in set(ignored)]
        self.ignore_index = ignore_index
        size = max(list(raw_labels) + list(ignored)) + 2
        self.to_idx = np.full(size, ignore_index, np.int32)
        for i, l in enumerate(self.valid):
            self.to_idx[l] = i
        self.to_label = np.asarray(self.valid, np.int32)

    @property
    def num_classes(self):
        return len(self.valid)

    def __call__(self, raw: np.ndarray) -> np.ndarray:
        return self.to_idx[np.clip(raw.astype(np.int64), 0, len(self.to_idx) - 1)]

    def inverse(self, idx: np.ndarray) -> np.ndarray:
        return self.to_label[idx]


class _NpyRoomDataset:
    """Shared loader: a directory of `<room>.npy` xyzrgb(l) arrays."""

    label_map: Optional[LabelMap] = None

    def __init__(self, data_root: str, names: List[str], loop: int = 1):
        if not names:
            raise FileNotFoundError(f"no rooms found in {data_root}")
        self.data_root = data_root
        self.names = names
        self.loop = loop
        self._cache: Dict[str, np.ndarray] = {}

    def __len__(self):
        return len(self.names) * self.loop

    @property
    def num_rooms(self):
        return len(self.names)

    def room(self, i: int):
        name = self.names[i % len(self.names)]
        if name not in self._cache:
            self._cache[name] = np.load(os.path.join(self.data_root, name + ".npy"))
        d = self._cache[name]
        coord = d[:, 0:3].copy()
        feat = d[:, 3:6].copy() if d.shape[1] >= 6 else np.zeros_like(coord)
        if d.shape[1] >= 7:
            raw = d[:, 6].astype(np.int64)
            label = self.label_map(raw) if self.label_map else raw.astype(np.int64)
        else:
            label = np.full(len(d), -1, np.int64)
        return coord, feat, label


class ScanNetDataset(_NpyRoomDataset):
    """ScanNet v2 scenes as xyzrgb+raw-label npy files; 20-class remap with
    everything else ignored (the reference rasterizes meshes + remaps via the
    labels tsv — here ingest expects pre-sampled points)."""

    def __init__(self, data_root: str, split: str = "train", loop: int = 1,
                 val_list: Optional[Sequence[str]] = None):
        self.label_map = LabelMap(
            raw_labels=list(range(41)),
            ignored=[l for l in range(41) if l not in SCANNET_RAW_IDS],
        )
        all_names = sorted(
            f[:-4] for f in os.listdir(data_root) if f.endswith(".npy")
        )
        if val_list is not None:
            val = set(val_list)
            names = [n for n in all_names if (n in val) == (split != "train")]
        else:
            names = all_names
        super().__init__(data_root, names, loop)


def _split_dir_names(data_root: str, split: str):
    """Resolve (dir, names) for a split. The ingest (data/ingest.py) writes
    `<root>/train` and `<root>/test`; a flat directory of npy files is
    accepted for backwards compatibility. `*_proj.npy` reprojection files are
    not rooms."""
    sub = os.path.join(data_root, "test" if split == "test" else "train")
    d = sub if os.path.isdir(sub) else data_root
    names = sorted(
        f[:-4]
        for f in os.listdir(d)
        if f.endswith(".npy") and not f.endswith("_proj.npy")
    )
    return d, names


class Semantic3DDataset(_NpyRoomDataset):
    """Semantic3D outdoor scans (8 classes, raw label 0 = unlabeled →
    ignored). Raw ascii ingest: data/ingest.py::prepare_semantic3d
    (reference tf_semantic3d_dataset.py:86-333)."""

    def __init__(self, data_root: str, split: str = "train", loop: int = 1):
        self.label_map = LabelMap(raw_labels=list(range(9)), ignored=[0])
        self.split = split
        d, names = _split_dir_names(data_root, split)
        super().__init__(d, names, loop)

    def projection(self, name: str) -> np.ndarray:
        """Raw-point → subsampled-point index (test submissions)."""
        return np.load(os.path.join(self.data_root, name + "_proj.npy"))

    @staticmethod
    def write_submission(
        out_dir: str, predictions: Dict[str, np.ndarray], zip_name: str = "submission.zip"
    ) -> str:
        """Ascii `.labels` files (raw ids, one per line) + zip — the
        reference's test-split submission format
        (tf_semantic3d_dataset.py test vote + zip)."""
        os.makedirs(out_dir, exist_ok=True)
        files = []
        label_map = LabelMap(raw_labels=list(range(9)), ignored=[0])
        for name, pred_idx in predictions.items():
            raw = label_map.inverse(pred_idx)
            path = os.path.join(out_dir, f"{name}.labels")
            np.savetxt(path, raw, fmt="%d")
            files.append(path)
        zpath = os.path.join(out_dir, zip_name)
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
            for f in files:
                z.write(f, os.path.basename(f))
        return zpath


class NPM3DDataset(_NpyRoomDataset):
    """Paris-Lille-3D (NPM3D): 9 coarse classes, raw 0 = unclassified →
    ignored. Raw ply ingest: data/ingest.py::prepare_npm3d
    (reference tf_npm3d_dataset.py:150-333)."""

    def __init__(self, data_root: str, split: str = "train", loop: int = 1):
        self.label_map = LabelMap(raw_labels=list(range(10)), ignored=[0])
        self.split = split
        d, names = _split_dir_names(data_root, split)
        super().__init__(d, names, loop)

    def projection(self, name: str) -> np.ndarray:
        return np.load(os.path.join(self.data_root, name + "_proj.npy"))

    @staticmethod
    def write_submission(out_dir: str, predictions: Dict[str, np.ndarray]) -> list:
        """Paris-Lille-3D benchmark format: one ascii `<name>.txt` per scan,
        one raw class id per line."""
        os.makedirs(out_dir, exist_ok=True)
        label_map = LabelMap(raw_labels=list(range(10)), ignored=[0])
        files = []
        for name, pred_idx in predictions.items():
            raw = label_map.inverse(pred_idx)
            path = os.path.join(out_dir, f"{name}.txt")
            np.savetxt(path, raw, fmt="%d")
            files.append(path)
        return files
