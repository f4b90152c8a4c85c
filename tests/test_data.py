import numpy as np
import pytest

from contrastboundary_tpu.data import (
    voxelize,
    prepare_crop,
    pad_to_fixed_size,
    default_train_transform,
    SyntheticSceneDataset,
    make_batch_iterator,
)
from contrastboundary_tpu.data.transforms import (
    random_rotate,
    random_flip,
    hue_saturation_translation,
    _rgb_to_hsv,
    _hsv_to_rgb,
)


def test_voxelize_train_one_per_voxel(rng):
    coord = rng.rand(500, 3) * 2
    g = np.random.default_rng(0)
    idx = voxelize(coord, 0.5, g, mode="train")
    v = np.floor((coord[idx] - coord.min(0)) / 0.5).astype(int)
    keys = {tuple(x) for x in v}
    assert len(keys) == len(idx)  # one point per voxel
    # every occupied voxel represented
    v_all = np.floor((coord - coord.min(0)) / 0.5).astype(int)
    assert len({tuple(x) for x in v_all}) == len(idx)


def test_voxelize_val_returns_all(rng):
    coord = rng.rand(200, 3)
    order, counts = voxelize(coord, 0.25, mode="val")
    assert len(order) == 200
    assert counts.sum() == 200


def test_prepare_crop_shapes(rng):
    coord = rng.rand(5000, 3) * 5
    feat = rng.rand(5000, 3) * 255
    label = rng.randint(0, 13, 5000)
    g = np.random.default_rng(0)
    c, f, l = prepare_crop(coord, feat, label, g, voxel_size=0.04, voxel_max=1000)
    assert len(c) <= 1000
    assert c.min() >= 0  # zero-min coords
    assert f.max() <= 1.0  # colors scaled to 0..1
    assert c.dtype == np.float32 and l.dtype == np.int32


def test_pad_to_fixed_size(rng):
    g = np.random.default_rng(0)
    c = rng.rand(100, 3).astype(np.float32)
    f = rng.rand(100, 3).astype(np.float32)
    l = rng.randint(0, 5, 100).astype(np.int32)
    c2, f2, l2, src = pad_to_fixed_size(c, f, l, 256, g)
    assert c2.shape == (256, 3) and src.shape == (256,)
    np.testing.assert_allclose(c2, c[src])
    np.testing.assert_array_equal(l2, l[src])
    assert set(src[:100]) == set(range(100))  # originals all kept

    c3, _, _, src3 = pad_to_fixed_size(c, f, l, 50, g)
    assert c3.shape == (50, 3) and len(np.unique(src3)) == 50


def test_transforms_do_not_mutate(rng):
    coord = rng.rand(100, 3)
    feat = rng.rand(100, 3) * 255
    label = rng.randint(0, 13, 100)
    c0, f0 = coord.copy(), feat.copy()
    g = np.random.default_rng(0)
    default_train_transform()(g, coord, feat, label)
    np.testing.assert_array_equal(coord, c0)
    np.testing.assert_array_equal(feat, f0)


def test_rotate_preserves_distances(rng):
    coord = rng.rand(50, 3)
    g = np.random.default_rng(0)
    c2, _, _ = random_rotate()(g, coord, None, None)
    d0 = np.linalg.norm(coord[0] - coord[1])
    np.testing.assert_allclose(np.linalg.norm(c2[0] - c2[1]), d0, rtol=1e-9)
    # z-only rotation keeps z
    np.testing.assert_allclose(c2[:, 2], coord[:, 2], atol=1e-12)


def test_hsv_roundtrip(rng):
    rgb = rng.rand(200, 3) * 255
    back = _hsv_to_rgb(_rgb_to_hsv(rgb))
    np.testing.assert_allclose(back, rgb, atol=1e-6)


def test_synthetic_dataset_deterministic():
    ds = SyntheticSceneDataset(num_rooms=2, points_per_room=5000)
    c1, f1, l1 = ds.room(0)
    ds2 = SyntheticSceneDataset(num_rooms=2, points_per_room=5000)
    c2, f2, l2 = ds2.room(0)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(l1, l2)
    assert set(np.unique(l1)) >= {0, 1, 2}
    assert c1.shape == (5000, 3)


def test_batch_iterator_shapes_and_sharding():
    ds = SyntheticSceneDataset(num_rooms=4, points_per_room=8000)
    batches = list(
        make_batch_iterator(ds, batch_size=2, n_points=1024, voxel_size=0.1)
    )
    assert len(batches) == 2
    b = batches[0]
    assert b["points"].shape == (2, 1024, 3)
    assert b["features"].shape == (2, 1024, 3)
    assert b["labels"].shape == (2, 1024)
    assert b["points"].dtype == np.float32

    # two shards partition the sample order
    s0 = list(make_batch_iterator(ds, 1, 256, shard_index=0, num_shards=2, voxel_size=0.1))
    s1 = list(make_batch_iterator(ds, 1, 256, shard_index=1, num_shards=2, voxel_size=0.1))
    assert len(s0) == 2 and len(s1) == 2
    r0 = {int(b["room_idx"][0]) for b in s0}
    r1 = {int(b["room_idx"][0]) for b in s1}
    assert r0 | r1 == {0, 1, 2, 3}

    # deterministic across re-instantiation
    again = list(make_batch_iterator(ds, 2, 1024, voxel_size=0.1))
    np.testing.assert_array_equal(batches[0]["points"], again[0]["points"])


def test_prefetch_preserves_order_and_items():
    from contrastboundary_tpu.data.prefetch import prefetch

    items = list(prefetch(lambda: iter(range(20)), depth=2))
    assert items == list(range(20))

    # producer exceptions propagate to the consumer (no silent hang)
    def bad():
        yield 1
        raise RuntimeError("boom")

    got = []
    with pytest.raises(RuntimeError, match="boom"):
        for x in prefetch(lambda: bad(), depth=1):
            got.append(x)
    assert got == [1]


def test_prepare_crop_radius_mode(rng):
    coord = rng.rand(8000, 3) * 10
    feat = rng.rand(8000, 3) * 255
    label = rng.randint(0, 13, 8000)
    g = np.random.default_rng(0)
    c, f, l = prepare_crop(
        coord, feat, label, g, voxel_size=0.04, voxel_max=4000,
        crop_mode="radius", in_radius=2.0,
    )
    # all surviving points within a 2m sphere of some center → extent ≤ 4m
    assert (c.max(0) - c.min(0)).max() <= 4.0 + 1e-5
    assert len(c) <= 4000


def test_potential_sampler_covers_every_point():
    """Spatially-regular TRAIN sampling (reference datasets/base.py:352-448):
    the Tukey-bumped potentials guarantee every voxelized room point is
    covered within a bounded number of crops."""
    from contrastboundary_tpu.data.pipeline import PotentialSampler

    ds = SyntheticSceneDataset(num_rooms=3, points_per_room=6000)
    ps = PotentialSampler(ds, voxel_size=0.1, in_radius=2.0, seed=0)
    covered = [np.zeros(len(r["coord"]), bool) for r in ps.rooms]
    rng = np.random.default_rng(0)
    total = sum(len(r["coord"]) for r in ps.rooms)
    # bound: rooms are ~9x8 m, crops are r=2 spheres — well under 200 crops
    for step in range(200):
        ci, idx = ps.next(rng)
        covered[ci][idx] = True
        if all(c.all() for c in covered):
            break
    assert all(c.all() for c in covered), (
        f"uncovered after 200 crops: "
        f"{[int((~c).sum()) for c in covered]} of {total}"
    )
    # potentials are monotone non-decreasing and every room got sampled
    assert ps.min_potential() > 0
    assert {ci for ci in range(3)} == {
        i for i, c in enumerate(covered) if c.any()
    }


def test_potential_batch_iterator_shapes_and_state():
    from contrastboundary_tpu.data.pipeline import PotentialSampler

    ds = SyntheticSceneDataset(num_rooms=2, points_per_room=6000)
    ps = PotentialSampler(ds, voxel_size=0.1, in_radius=2.0, cap=800, seed=0)
    before = ps.min_potential()
    batches = list(
        make_batch_iterator(
            ds, batch_size=2, n_points=512, voxel_size=0.1,
            sampler="potential", potential_state=ps,
        )
    )
    assert len(batches) == 1  # len(ds)=2 rooms x loop 1 // batch 2
    b = batches[0]
    assert b["points"].shape == (2, 512, 3)
    assert b["labels"].shape == (2, 512)
    assert b["features"].max() <= 1.0 + 1e-6  # /255 applied
    # the persistent state advanced (coverage accumulates across epochs)
    assert ps.min_potential() > before
    # crops respect the cap before padding: src_idx rows < cap
    assert b["src_idx"].max() < 800
