import numpy as np
import pytest

from contrastboundary_tpu.native import (
    grid_subsample,
    native_available,
    voxel_pick,
    _grid_subsample_np,
)


def test_native_builds():
    assert native_available(), "csrc/libcbl_native.so failed to build"


def test_grid_subsample_matches_numpy(rng):
    pts = (rng.rand(2000, 3) * 3).astype(np.float32)
    feats = rng.rand(2000, 5).astype(np.float32)
    labels = rng.randint(0, 13, 2000).astype(np.int32)
    p1, f1, l1 = grid_subsample(pts, feats, labels, cell=0.25)
    p2, f2, l2 = _grid_subsample_np(pts, feats, labels, 0.25, 13)
    assert len(p1) == len(p2)
    np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(f1, f2, rtol=1e-4, atol=1e-5)
    # ties in majority vote may break differently; near-total agreement
    assert (l1 == l2).mean() > 0.97


def test_grid_subsample_barycenter_simple():
    pts = np.array(
        [[0.1, 0.1, 0.1], [0.3, 0.3, 0.3], [2.0, 2.0, 2.0]], np.float32
    )
    labels = np.array([1, 1, 2], np.int32)
    p, _, l = grid_subsample(pts, None, labels, cell=1.0, num_classes=3)
    assert len(p) == 2
    np.testing.assert_allclose(p[0], [0.2, 0.2, 0.2], atol=1e-6)
    assert l[0] == 1 and l[1] == 2


def test_grid_subsample_ignored_labels():
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2]], np.float32)
    labels = np.array([-1, -1], np.int32)
    _, _, l = grid_subsample(pts, None, labels, cell=1.0, num_classes=3)
    assert l[0] == -1  # no valid votes


def test_voxel_pick(rng):
    pts = (rng.rand(500, 3) * 2).astype(np.float32)
    idx = voxel_pick(pts, cell=0.5, salt=7)
    v = np.floor((pts[idx] - pts.min(0)) / 0.5).astype(int)
    assert len({tuple(x) for x in v}) == len(idx)  # one per voxel
    v_all = np.floor((pts - pts.min(0)) / 0.5).astype(int)
    assert len({tuple(x) for x in v_all}) == len(idx)  # all voxels covered
    # deterministic in salt
    np.testing.assert_array_equal(idx, voxel_pick(pts, 0.5, salt=7))
    # different salt → (almost surely) different picks
    assert not np.array_equal(idx, voxel_pick(pts, 0.5, salt=8))
