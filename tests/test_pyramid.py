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


def test_random_sampler_pyramid(rng):
    """RandLA-style uniform random decimation: valid unique indices, static
    under jit, full pyramid builds and trains."""
    import jax
    import jax.numpy as jnp
    from contrastboundary_tpu.ops import PyramidSpec, build_pyramid

    spec = PyramidSpec(
        strides=(1, 4, 4), k_self=(8, 8, 8), k_down=(8, 8, 8),
        sampler="random",
    )
    pts = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    pyr = build_pyramid(pts, spec)
    for l in (1, 2):
        idx = np.asarray(pyr.sample_idx[l])
        n_prev = pyr.points[l - 1].shape[1]
        assert idx.shape[1] == n_prev // 4
        for b in range(2):
            assert len(np.unique(idx[b])) == idx.shape[1]  # no replacement
            assert idx[b].min() >= 0 and idx[b].max() < n_prev
    # the randla preset parses and builds
    from contrastboundary_tpu.config import load_config

    cfg = load_config("s3dis_randla_cbl")
    assert cfg.model.sampler == "random"
    assert dict(cfg.model.agg_kwargs)["weight_softmax"] == "mask"
    spec2 = cfg.pyramid_spec()
    assert spec2.sampler == "random"


def test_paper_presets_protocol():
    from contrastboundary_tpu.config import load_config

    for name in ("s3dis_pt_cbl_paper", "s3dis_conv_cbl_paper"):
        cfg = load_config(name)
        assert cfg.eval.num_votes == 20.0
        assert cfg.eval.smooth == 0.95


def test_merged_self_contrast_bit_exact(rng):
    """The merged self+contrast window search (one top-max(ks,kc) list
    including self) must reproduce the separate ensure_self / exclude_self
    searches bit-exactly, including with duplicate (padded) points."""
    import contrastboundary_tpu.ops.pyramid as pyr_mod
    from contrastboundary_tpu.ops.knn import tile_self_knn

    b, n = 2, 1024
    pts = rng.rand(b, n, 3).astype(np.float32)
    # padded-crop duplicates: repeat some rows (zero-distance ties)
    pts[0, 700:720] = pts[0, 100:120]
    spec = PyramidSpec(
        strides=(1, 4), k_self=(8, 8), k_down=(8, 8),
        k_contrast=(12, 10), with_subscene=True,
        layout="sorted", sampler="strided",
        self_tile=128, contrast_tile=128,
    )
    pyr = build_pyramid(jnp.asarray(pts), spec)

    for l in range(2):
        tile, width = pyr.self_local[l]
        assert pyr.contrast_local[l] == (tile, width)
        p_l = np.asarray(pyr.points[l])
        # separate searches, old semantics
        _, s_ref, w1 = tile_self_knn(
            jnp.asarray(p_l), spec.k_self[l], tile=tile,
            window=spec.self_window, exclude_self=False, ensure_self=True,
            recall=spec.knn_recall, assume_sorted=True,
        )
        _, c_ref, w2 = tile_self_knn(
            jnp.asarray(p_l), spec.k_contrast[l] - 1, tile=tile,
            window=spec.contrast_window, exclude_self=True,
            recall=spec.knn_recall, assume_sorted=True,
        )
        assert w1 == width and w2 == width
        np.testing.assert_array_equal(
            np.asarray(pyr.self_idx[l]), np.asarray(s_ref),
            err_msg=f"self_idx level {l}",
        )
        np.testing.assert_array_equal(
            np.asarray(pyr.contrast_idx[l]), np.asarray(c_ref),
            err_msg=f"contrast_idx level {l}",
        )
