import numpy as np
import jax.numpy as jnp

from contrastboundary_tpu.ops import PyramidSpec, build_pyramid


def small_spec(**kw):
    base = dict(
        strides=(1, 4, 4),
        k_self=(8, 8, 8),
        k_down=(8, 8, 8),
        k_up=3,
        k_contrast=(8, 8, 8),
        with_subscene=True,
        sampler="fps",
    )
    base.update(kw)
    return PyramidSpec(**base)


def test_shapes(rng):
    spec = small_spec()
    p = rng.rand(2, 64, 3).astype(np.float32)
    pyr = build_pyramid(jnp.asarray(p), spec)
    assert [x.shape[1] for x in pyr.points] == [64, 16, 4]
    assert pyr.self_idx[0].shape == (2, 64, 8)
    assert pyr.down_idx[0] is None
    assert pyr.down_idx[1].shape == (2, 16, 8)
    assert pyr.up_idx[1].shape == (2, 64, 3)
    assert pyr.up_w[2].shape == (2, 16, 3)
    assert pyr.near0_idx[2].shape == (2, 64)
    assert pyr.contrast_idx[0].shape == (2, 64, 7)
    assert pyr.subscene_idx[1].shape == (2, 16, 4)
    assert pyr.subscene_idx[2].shape == (2, 4, 16)


def test_sampled_points_subset(rng):
    spec = small_spec()
    p = rng.rand(1, 64, 3).astype(np.float32)
    pyr = build_pyramid(jnp.asarray(p), spec)
    l1 = np.asarray(pyr.points[1])[0]
    for pt in l1:
        assert np.min(np.abs(p[0] - pt).sum(-1)) < 1e-6


def test_up_weights_normalized(rng):
    spec = small_spec()
    p = rng.rand(1, 64, 3).astype(np.float32)
    pyr = build_pyramid(jnp.asarray(p), spec)
    w = np.asarray(pyr.up_w[1])
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)


def test_contrast_excludes_self(rng):
    spec = small_spec()
    p = rng.rand(1, 64, 3).astype(np.float32)
    pyr = build_pyramid(jnp.asarray(p), spec)
    for l, c in enumerate(pyr.contrast_idx):
        n = pyr.points[l].shape[1]
        assert (np.asarray(c)[0] != np.arange(n)[:, None]).all()


def test_bucket_fps_sampler(rng):
    spec = small_spec(sampler="bucket_fps", num_buckets=4)
    p = rng.rand(2, 64, 3).astype(np.float32)
    pyr = build_pyramid(jnp.asarray(p), spec)
    idx = np.asarray(pyr.sample_idx[1])
    for b in range(2):
        assert len(np.unique(idx[b])) == 16
