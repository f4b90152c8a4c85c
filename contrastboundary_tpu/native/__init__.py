"""ctypes binding for the native host-preprocessing library (csrc/).

The reference ships three C++ builds for its host-side ops (SURVEY.md §2.1
N1-N5); the one that genuinely belongs on the host here is the one-time
dataset-preprocessing grid subsample. `grid_subsample` / `voxel_pick` use the
C++ implementation when `csrc/libcbl_native.so` is built (make -C csrc) and
transparently fall back to the numpy implementation otherwise — results are
identical (both emit voxels in ascending hash order / sorted indices).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")


def _load(build_if_missing: bool = True):
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.abspath(os.path.join(_CSRC, "libcbl_native.so"))
    if not os.path.exists(so) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_CSRC)],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    lib.cbl_grid_subsample.restype = ctypes.c_int64
    lib.cbl_grid_subsample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.cbl_voxel_pick.restype = ctypes.c_int64
    lib.cbl_voxel_pick.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def grid_subsample(
    points: np.ndarray,
    features: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
    cell: float = 0.04,
    num_classes: int = 13,
):
    """Voxel barycenter + feature mean + label majority (N1 semantics).
    Returns (points [M,3], features [M,F] | None, labels [M] | None)."""
    points = np.ascontiguousarray(points, np.float32)
    n = len(points)
    lib = _load()
    if lib is None:
        return _grid_subsample_np(points, features, labels, cell, num_classes)

    fdim = 0 if features is None else features.shape[1]
    feats = (
        np.ascontiguousarray(features, np.float32)
        if features is not None
        else np.zeros((0,), np.float32)
    )
    labs = (
        np.ascontiguousarray(labels, np.int32)
        if labels is not None
        else None
    )
    cap = n
    out_p = np.empty((cap, 3), np.float32)
    out_f = np.empty((cap, max(fdim, 1)), np.float32)
    out_l = np.empty((cap,), np.int32)
    m = lib.cbl_grid_subsample(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) if labs is not None else None,
        n, fdim, num_classes if labs is not None else 0,
        ctypes.c_float(cell),
        out_p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cap,
    )
    if m < 0:
        raise RuntimeError("grid_subsample overflow")
    return (
        out_p[:m].copy(),
        out_f[:m, :fdim].copy() if features is not None else None,
        out_l[:m].copy() if labels is not None else None,
    )


def voxel_pick(points: np.ndarray, cell: float, salt: int = 0) -> np.ndarray:
    """One pseudo-random member index per occupied voxel, sorted (train-mode
    voxelize). Falls back to the numpy pipeline implementation."""
    points = np.ascontiguousarray(points, np.float32)
    lib = _load()
    if lib is None:
        from ..data.pipeline import voxelize

        rng = np.random.default_rng(salt)
        return np.sort(voxelize(points.astype(np.float64), cell, rng, "train"))
    out = np.empty((len(points),), np.int64)
    m = lib.cbl_voxel_pick(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(points), ctypes.c_float(cell), ctypes.c_uint64(salt),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(out),
    )
    if m < 0:
        raise RuntimeError("voxel_pick overflow")
    return out[:m].copy()


def _grid_subsample_np(points, features, labels, cell, num_classes):
    """Numpy fallback, same hash-order output as the C++ path."""
    v = np.floor((points - points.min(0)) / cell).astype(np.int64)
    grid = 1 << 21
    key = (v[:, 0] * grid + v[:, 1]) * grid + v[:, 2]
    uniq, inv = np.unique(key, return_inverse=True)
    m = len(uniq)
    cnt = np.bincount(inv, minlength=m).astype(np.float64)
    out_p = np.stack(
        [np.bincount(inv, weights=points[:, d], minlength=m) for d in range(3)],
        -1,
    ) / cnt[:, None]
    out_f = None
    if features is not None:
        out_f = np.stack(
            [
                np.bincount(inv, weights=features[:, d].astype(np.float64), minlength=m)
                for d in range(features.shape[1])
            ],
            -1,
        ) / cnt[:, None]
        out_f = out_f.astype(np.float32)
    out_l = None
    if labels is not None:
        votes = np.zeros((m, num_classes))
        valid = labels >= 0
        np.add.at(votes, (inv[valid], labels[valid]), 1.0)
        out_l = np.where(votes.sum(-1) > 0, votes.argmax(-1), -1).astype(np.int32)
    return out_p.astype(np.float32), out_f, out_l
