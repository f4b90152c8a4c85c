import os

import numpy as np
import pytest

from contrastboundary_tpu.data.datasets import (
    LabelMap,
    NPM3DDataset,
    ScanNetDataset,
    Semantic3DDataset,
    SCANNET_RAW_IDS,
)
from contrastboundary_tpu.eval.metrics import Metrics
from contrastboundary_tpu.utils.storage import dict_list, list_dict
from contrastboundary_tpu.train.debug import nan_report


def make_rooms(dirpath, n_rooms=3, raw_max=40, rng=None):
    rng = rng or np.random.RandomState(0)
    os.makedirs(dirpath, exist_ok=True)
    for i in range(n_rooms):
        d = np.concatenate(
            [
                rng.rand(100, 3),
                rng.randint(0, 255, (100, 3)),
                rng.randint(0, raw_max + 1, (100, 1)),
            ],
            axis=1,
        ).astype(np.float32)
        np.save(os.path.join(dirpath, f"scene{i:04d}.npy"), d)


def test_label_map():
    lm = LabelMap(raw_labels=list(range(5)), ignored=[0, 3])
    assert lm.num_classes == 3
    mapped = lm(np.array([0, 1, 2, 3, 4]))
    np.testing.assert_array_equal(mapped, [-1, 0, 1, -1, 2])
    np.testing.assert_array_equal(lm.inverse(np.array([0, 1, 2])), [1, 2, 4])


def test_scannet_dataset(tmp_path, rng):
    make_rooms(str(tmp_path), rng=rng)
    ds = ScanNetDataset(str(tmp_path))
    assert ds.num_rooms == 3
    coord, feat, label = ds.room(0)
    assert coord.shape == (100, 3) and label.shape == (100,)
    # only the 20 benchmark classes are valid; the rest are -1
    assert set(np.unique(label)) <= set(range(20)) | {-1}
    # raw ids outside SCANNET_RAW_IDS are ignored
    raw = np.load(str(tmp_path / "scene0000.npy"))[:, 6].astype(int)
    assert ((label == -1) == ~np.isin(raw, SCANNET_RAW_IDS)).all()


def test_scannet_val_split(tmp_path, rng):
    make_rooms(str(tmp_path), rng=rng)
    tr = ScanNetDataset(str(tmp_path), split="train", val_list=["scene0001"])
    va = ScanNetDataset(str(tmp_path), split="val", val_list=["scene0001"])
    assert tr.num_rooms == 2 and va.num_rooms == 1


def test_semantic3d_submission(tmp_path, rng):
    make_rooms(str(tmp_path), raw_max=8, rng=rng)
    ds = Semantic3DDataset(str(tmp_path))
    _, _, label = ds.room(0)
    assert set(np.unique(label)) <= set(range(8)) | {-1}
    zpath = Semantic3DDataset.write_submission(
        str(tmp_path / "sub"), {"scene0000": np.array([0, 1, 7])}
    )
    assert os.path.exists(zpath)
    written = np.loadtxt(str(tmp_path / "sub" / "scene0000.labels"))
    np.testing.assert_array_equal(written, [1, 2, 8])  # back to raw ids


def test_npm3d(tmp_path, rng):
    make_rooms(str(tmp_path), raw_max=9, rng=rng)
    ds = NPM3DDataset(str(tmp_path))
    _, _, label = ds.room(2)
    assert set(np.unique(label)) <= set(range(9)) | {-1}


def test_metrics_ordered_compare():
    a = Metrics({"mIoU": 0.5, "OA": 0.9})
    b = Metrics({"mIoU": 0.6, "OA": 0.1})
    c = Metrics({"mIoU": 0.5, "OA": 0.95})
    assert b > a and a < b
    assert c > a  # tie on mIoU → OA decides
    assert "mIoU=0.5" in a.scalar_str()


def test_storage_helpers():
    lst = [{"a": 1, "b": 2}, {"a": 3, "b": 4}]
    d = dict_list(lst)
    assert d == {"a": [1, 3], "b": [2, 4]}
    assert list_dict(d) == lst
    assert dict_list([]) == {} and list_dict({}) == []


def test_nan_report():
    import jax.numpy as jnp

    tree = {"ok": jnp.ones(4), "bad": jnp.asarray([1.0, np.nan, np.inf, 2.0])}
    r = nan_report(tree)
    assert list(r.keys()) == ["bad"]
    assert r["bad"] == pytest.approx(0.5)
