import numpy as np
import jax.numpy as jnp
import pytest

from contrastboundary_tpu.ops import (
    knn,
    fps,
    bucket_fps,
    interpolate,
    nearest_interpolate,
    voxel_grid_subsample,
)
from contrastboundary_tpu.ops.sampling import serialized_sample, morton_code

from reference_impl import knn_np, fps_np, interpolate_np, voxel_subsample_np


class TestKNN:
    def test_matches_numpy(self, rng):
        q = rng.randn(2, 37, 3).astype(np.float32)
        s = rng.randn(2, 53, 3).astype(np.float32)
        idx, d2 = knn(jnp.asarray(q), jnp.asarray(s), 5, chunk=16)
        idx, d2 = np.asarray(idx), np.asarray(d2)
        for b in range(2):
            ridx, rd2 = knn_np(q[b], s[b], 5)
            # indices can differ on exact ties; distances must match
            np.testing.assert_allclose(d2[b], rd2, rtol=1e-4, atol=1e-5)
            same = (idx[b] == ridx).mean()
            assert same > 0.95

    def test_self_query_first_is_self(self, rng):
        p = rng.randn(1, 64, 3).astype(np.float32)
        idx, d2 = knn(jnp.asarray(p), jnp.asarray(p), 4)
        assert (np.asarray(idx)[0, :, 0] == np.arange(64)).all()
        assert np.allclose(np.asarray(d2)[0, :, 0], 0.0, atol=1e-5)

    def test_exclude_self(self, rng):
        p = rng.randn(1, 40, 3).astype(np.float32)
        idx, d2 = knn(jnp.asarray(p), jnp.asarray(p), 3, exclude_self=True)
        idx = np.asarray(idx)
        assert (idx[0] != np.arange(40)[:, None]).all()
        for i in range(40):
            ridx, _ = knn_np(p[0], p[0], 3, exclude_self=True)
            np.testing.assert_array_equal(np.sort(idx[0][i]), np.sort(ridx[i]))

    def test_radius_shadow(self, rng):
        q = rng.randn(1, 16, 3).astype(np.float32)
        s = rng.randn(1, 32, 3).astype(np.float32)
        idx, d2 = knn(jnp.asarray(q), jnp.asarray(s), 8, radius=0.5)
        idx, d2 = np.asarray(idx), np.asarray(d2)
        assert (idx[0][d2[0] > 0.25] == 32).all()
        assert (idx[0][d2[0] <= 0.25] < 32).all()

    def test_support_mask(self, rng):
        q = rng.randn(1, 8, 3).astype(np.float32)
        s = rng.randn(1, 16, 3).astype(np.float32)
        mask = np.zeros((1, 16), bool)
        mask[:, :4] = True  # only first 4 supports valid
        idx, _ = knn(jnp.asarray(q), jnp.asarray(s), 3, support_mask=jnp.asarray(mask))
        assert (np.asarray(idx) < 4).all()


class TestFPS:
    def test_exact_matches_numpy(self, rng):
        p = rng.randn(2, 50, 3).astype(np.float32)
        idx = np.asarray(fps(jnp.asarray(p), 10))
        for b in range(2):
            np.testing.assert_array_equal(idx[b], fps_np(p[b], 10))

    def test_bucket_fps_coverage(self, rng):
        # bucketed FPS must cover space ~ as well as exact FPS: compare the
        # max distance from any point to its nearest sample.
        p = rng.rand(1, 1024, 3).astype(np.float32)
        m = 256
        for sampler in [fps, lambda x, k: bucket_fps(x, k, 16)]:
            idx = np.asarray(sampler(jnp.asarray(p), m))[0]
            assert len(np.unique(idx)) == m
            d = ((p[0][:, None] - p[0][idx][None]) ** 2).sum(-1).min(-1)
            assert np.sqrt(d.max()) < 0.35  # exact fps gives ~0.1, random ~0.2

    def test_serialized_unique(self, rng):
        p = rng.rand(2, 256, 3).astype(np.float32)
        idx = np.asarray(serialized_sample(jnp.asarray(p), 64))
        for b in range(2):
            assert len(np.unique(idx[b])) == 64


class TestMorton:
    def test_locality(self, rng):
        # adjacent codes should be spatially close on average
        p = rng.rand(1, 512, 3).astype(np.float32)
        code = np.asarray(morton_code(jnp.asarray(p)))
        order = np.argsort(code[0])
        ps = p[0][order]
        adj = np.linalg.norm(ps[1:] - ps[:-1], axis=-1).mean()
        rand_d = np.linalg.norm(
            p[0][rng.permutation(512)][1:] - p[0][rng.permutation(512)][:-1], axis=-1
        ).mean()
        assert adj < rand_d * 0.5


class TestInterpolate:
    def test_matches_numpy(self, rng):
        p_src = rng.randn(2, 40, 3).astype(np.float32)
        p_dst = rng.randn(2, 25, 3).astype(np.float32)
        x = rng.randn(2, 40, 7).astype(np.float32)
        out = np.asarray(interpolate(jnp.asarray(p_src), jnp.asarray(p_dst), jnp.asarray(x)))
        for b in range(2):
            np.testing.assert_allclose(
                out[b], interpolate_np(p_src[b], p_dst[b], x[b]), rtol=1e-4, atol=1e-5
            )

    def test_nearest(self, rng):
        p_src = rng.randn(1, 30, 3).astype(np.float32)
        p_dst = rng.randn(1, 10, 3).astype(np.float32)
        x = rng.randn(1, 30, 4).astype(np.float32)
        out = np.asarray(nearest_interpolate(jnp.asarray(p_src), jnp.asarray(p_dst), jnp.asarray(x)))
        idx, _ = knn_np(p_dst[0], p_src[0], 1)
        np.testing.assert_allclose(out[0], x[0][idx[:, 0]], rtol=1e-6)


class TestVoxel:
    def test_matches_numpy(self, rng):
        p = (rng.rand(1, 200, 3) * 2).astype(np.float32)
        f = rng.randn(1, 200, 5).astype(np.float32)
        l = rng.randint(0, 13, (1, 200)).astype(np.int32)
        out_p, out_f, out_l, mask = voxel_grid_subsample(
            jnp.asarray(p), jnp.asarray(f), jnp.asarray(l),
            voxel_size=0.4, max_voxels=256, num_classes=13,
        )
        out_p, out_f, out_l, mask = map(np.asarray, (out_p, out_f, out_l, mask))
        rp, rf, rl = voxel_subsample_np(p[0], f[0], l[0], 0.4, 13)
        m = mask[0]
        assert m.sum() == len(rp)
        np.testing.assert_allclose(out_p[0][m], rp, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(out_f[0][m], rf, rtol=1e-4, atol=1e-4)
        # labels can differ on vote ties; require >95% agreement
        assert (out_l[0][m] == rl).mean() > 0.95

    def test_overflow_cap(self, rng):
        p = (rng.rand(1, 100, 3) * 100).astype(np.float32)  # ~every point own voxel
        out_p, _, _, mask = voxel_grid_subsample(
            jnp.asarray(p), voxel_size=0.1, max_voxels=32
        )
        assert np.asarray(mask).sum() <= 32


class TestWindowedKNN:
    def test_recall_and_exactness_at_full_window(self, rng):
        from contrastboundary_tpu.ops.knn import windowed_knn

        p = jnp.asarray(rng.rand(1, 1024, 3).astype(np.float32))
        ei, ed = knn(p, p, 8)
        # window covering the whole cloud → exact distances
        wi, wd = windowed_knn(p, p, 8, tile=128, window=8, recall=None)
        np.testing.assert_allclose(np.asarray(wd), np.asarray(ed), rtol=1e-4, atol=1e-5)
        # small window: high recall
        wi4, _ = windowed_knn(p, p, 8, tile=128, window=2, recall=None)
        rec = np.mean([
            len(set(np.asarray(ei)[0, i]) & set(np.asarray(wi4)[0, i])) / 8
            for i in range(0, 1024, 13)
        ])
        assert rec > 0.9

    def test_self_and_exclude(self, rng):
        from contrastboundary_tpu.ops.knn import windowed_knn

        p = jnp.asarray(rng.rand(1, 512, 3).astype(np.float32))
        wi, wd = windowed_knn(p, p, 6, tile=128, window=1, ensure_self=True, recall=None)
        assert (np.asarray(wi)[0, :, 0] == np.arange(512)).all()
        wi2, _ = windowed_knn(p, p, 6, tile=128, window=1, exclude_self=True, recall=None)
        assert (np.asarray(wi2)[0] != np.arange(512)[:, None]).all()

    def test_pyramid_windowed(self, rng):
        from contrastboundary_tpu.ops import PyramidSpec, build_pyramid

        spec = PyramidSpec(
            strides=(1, 4), k_self=(8, 8), k_down=(8, 8),
            sampler="serialized", knn_window=2, knn_tile=128,
        )
        p = jnp.asarray(rng.rand(1, 1024, 3).astype(np.float32))
        pyr = build_pyramid(p, spec)
        assert pyr.self_idx[0].shape == (1, 1024, 8)
        # level-1 (256 pts) falls back to dense path (not divisible by 128? it is) —
        # either way results must be valid indices
        assert int(np.asarray(pyr.self_idx[1]).max()) <= 256
        assert (np.asarray(pyr.self_idx[0])[0, :, 0] == np.arange(1024)).all()
