import numpy as np
import jax.numpy as jnp

from contrastboundary_tpu.core import (
    batch_gather,
    shadow_gather,
    shadow_gather_labels,
    masked_softmax,
    masked_mean,
    boundary_mask,
)


def test_batch_gather(rng):
    x = rng.randn(2, 10, 4).astype(np.float32)
    idx = rng.randint(0, 10, (2, 5, 3))
    out = np.asarray(batch_gather(jnp.asarray(x), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(out[b], x[b][idx[b]])


def test_shadow_gather_fills_invalid(rng):
    x = rng.randn(2, 10, 4).astype(np.float32)
    idx = rng.randint(0, 11, (2, 6, 3))  # 10 == shadow
    out, valid = shadow_gather(jnp.asarray(x), jnp.asarray(idx))
    out, valid = np.asarray(out), np.asarray(valid)
    assert (valid == (idx < 10)).all()
    for b in range(2):
        for i in range(6):
            for j in range(3):
                if idx[b, i, j] < 10:
                    np.testing.assert_allclose(out[b, i, j], x[b, idx[b, i, j]])
                else:
                    assert (out[b, i, j] == 0).all()


def test_shadow_gather_labels(rng):
    labels = rng.randint(0, 13, (2, 10))
    idx = rng.randint(0, 11, (2, 7))
    out, _ = shadow_gather_labels(jnp.asarray(labels), jnp.asarray(idx))
    out = np.asarray(out)
    for b in range(2):
        ref = np.where(idx[b] < 10, labels[b][np.minimum(idx[b], 9)], -1)
        np.testing.assert_array_equal(out[b], ref)


def test_masked_softmax(rng):
    x = rng.randn(4, 8).astype(np.float32)
    mask = rng.rand(4, 8) > 0.3
    mask[0] = False  # fully invalid row → zeros, not NaN
    out = np.asarray(masked_softmax(jnp.asarray(x), jnp.asarray(mask)))
    assert np.isfinite(out).all()
    assert np.allclose(out[0], 0.0)
    for i in range(1, 4):
        if mask[i].any():
            e = np.exp(x[i][mask[i]] - x[i][mask[i]].max())
            np.testing.assert_allclose(out[i][mask[i]], e / e.sum(), rtol=1e-5)
            assert np.allclose(out[i][~mask[i]], 0.0)


def test_masked_mean(rng):
    x = rng.randn(3, 5).astype(np.float32)
    mask = np.array([[1, 1, 0, 0, 0], [0, 0, 0, 0, 0], [1, 1, 1, 1, 1]], bool)
    out = np.asarray(masked_mean(jnp.asarray(x), jnp.asarray(mask), axis=-1))
    np.testing.assert_allclose(out[0], x[0, :2].mean(), rtol=1e-6)
    assert out[1] == 0.0
    np.testing.assert_allclose(out[2], x[2].mean(), rtol=1e-6)


def test_boundary_mask_simple():
    # 1D chain of points labeled [0,0,0,1,1]; neighbors = self+left+right.
    labels = jnp.asarray([[0, 0, 0, 1, 1]])
    n = 5
    nb = []
    for i in range(n):
        nb.append([i, max(i - 1, 0), min(i + 1, n - 1)])
    nb = jnp.asarray([nb])
    bound, plain = boundary_mask(labels, nb, get_plain=True)
    np.testing.assert_array_equal(np.asarray(bound)[0], [0, 0, 1, 1, 0])
    np.testing.assert_array_equal(np.asarray(plain)[0], [1, 1, 0, 0, 1])


def test_boundary_mask_shadow_and_invalid_labels():
    labels = jnp.asarray([[0, -1, 1]])
    # point 0: neighbors = invalid-label point and shadow → not boundary
    nb = jnp.asarray([[[1, 3, 3], [0, 2, 3], [0, 3, 3]]])
    bound, plain = boundary_mask(labels, nb, get_plain=True)
    b = np.asarray(bound)[0]
    p = np.asarray(plain)[0]
    assert b[0] == 0 and p[0] == 1  # all neighbors invalid → plain
    assert b[2] == 1  # label 1 vs neighbor label 0 → boundary


def test_global_pooling(rng):
    from contrastboundary_tpu.core.pooling import global_avg_pool, global_max_pool

    x = jnp.asarray(rng.randn(2, 6, 3).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], bool)
    avg = np.asarray(global_avg_pool(x, mask))
    np.testing.assert_allclose(avg[0], np.asarray(x)[0, :3].mean(0), rtol=1e-5)
    np.testing.assert_allclose(avg[1], np.asarray(x)[1].mean(0), rtol=1e-5)
    mx = np.asarray(global_max_pool(x, mask))
    np.testing.assert_allclose(mx[0], np.asarray(x)[0, :3].max(0), rtol=1e-5)


def test_normalize_combine(rng):
    from contrastboundary_tpu.core.pooling import combine, normalize

    x = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    l2 = np.asarray(normalize(x, "l2"))
    np.testing.assert_allclose(np.linalg.norm(l2, axis=-1), 1.0, rtol=1e-5)
    sm = np.asarray(normalize(x, "softmax"))
    np.testing.assert_allclose(sm.sum(-1), 1.0, rtol=1e-5)
    a, b = jnp.ones((2, 3)), 2 * jnp.ones((2, 3))
    assert np.asarray(combine([a, b], "sum")).max() == 3
    assert np.asarray(combine([a, b], "mul")).max() == 2
    assert combine([a, b], "concat").shape == (2, 6)
    assert np.asarray(combine([a, b], "max")).min() == 2
