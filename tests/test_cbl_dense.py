"""Dense-window CBL kernel (ops/pallas/cbl_dense.py) vs the XLA tile path.

The kernel's distances come from the clamped matmul expansion, so parity
is tolerance-based (CLAUDE.md's documented ulp-level trade), exercised on
the dispatch boundary: CBL_DENSE=interpret routes cbl_stage_loss through
the kernel in interpret mode, CBL_DENSE=off keeps the XLA path.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastboundary_tpu.losses.contrast import ContrastConfig, cbl_stage_loss


def _case(b=2, g=5, tile=8, width=3, k=6, c=16, ncls=5, seed=0,
          duplicates=False):
    rng = np.random.RandomState(seed)
    m = g * tile
    w = width * tile
    feats = rng.randn(b, m, c).astype(np.float32)
    if duplicates:
        # padding repeats real points → identical feature rows; the matmul
        # expansion of their distance cancels to ~0 and must clamp, not NaN
        feats[:, 1::7] = feats[:, 0::7][:, : feats[:, 1::7].shape[1]]
    labels = rng.randint(0, ncls, (b, m))
    onehot = np.eye(ncls, dtype=np.float32)[labels]
    onehot[rng.rand(b, m) < 0.15] = 0.0  # ignored rows: all-zero
    # distinct window-relative indices per row (like real KNN output), a
    # few shadowed rows (all-invalid), a few shadow slots
    li = np.stack(
        [rng.permutation(w)[:k] for _ in range(b * m)], 0
    ).reshape(b, m, k).astype(np.int32)
    shadow_rows = rng.rand(b, m) < 0.05
    li[shadow_rows] = w
    li[rng.rand(b, m, k) < 0.05] = w
    return (
        jnp.asarray(feats), jnp.asarray(onehot), jnp.asarray(li), tile, width
    )


def _loss_fn(feats, onehot, li, tile, width, cfg):
    return cbl_stage_loss(feats, li, onehot, cfg, local=(tile, width))


@pytest.mark.parametrize("temperature", [1.0, 0.5])
@pytest.mark.parametrize("dist", ["l2", "norml2"])
def test_dense_matches_xla_path(monkeypatch, temperature, dist):
    feats, onehot, li, tile, width = _case()
    cfg = ContrastConfig(temperature=temperature, dist=dist)

    monkeypatch.setenv("CBL_DENSE", "off")
    ref = _loss_fn(feats, onehot, li, tile, width, cfg)
    gref = jax.grad(_loss_fn)(feats, onehot, li, tile, width, cfg)

    monkeypatch.setenv("CBL_DENSE", "interpret")
    got = _loss_fn(feats, onehot, li, tile, width, cfg)
    ggot = jax.grad(_loss_fn)(feats, onehot, li, tile, width, cfg)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4)
    # atol rides the grad scale: the expansion's f32 cancellation noise is
    # relative to |grad|max, not absolute (observed ~3e-5·scale)
    scale = np.maximum(np.abs(np.asarray(gref)).max(), 1e-8)
    np.testing.assert_allclose(
        np.asarray(ggot), np.asarray(gref), rtol=5e-3, atol=1e-4 * scale
    )


def test_dense_duplicate_rows_no_nan(monkeypatch):
    feats, onehot, li, tile, width = _case(duplicates=True, seed=3)
    cfg = ContrastConfig()

    monkeypatch.setenv("CBL_DENSE", "interpret")
    got = _loss_fn(feats, onehot, li, tile, width, cfg)
    ggot = jax.grad(_loss_fn)(feats, onehot, li, tile, width, cfg)
    assert np.isfinite(np.asarray(got))
    assert np.isfinite(np.asarray(ggot)).all()

    monkeypatch.setenv("CBL_DENSE", "off")
    ref = _loss_fn(feats, onehot, li, tile, width, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4)


def test_dense_all_shadow_rows(monkeypatch):
    """Rows whose neighbors are all shadows must be masked, not NaN."""
    feats, onehot, li, tile, width = _case(seed=5)
    li = li.at[:, :3].set(width * tile)
    cfg = ContrastConfig()
    monkeypatch.setenv("CBL_DENSE", "interpret")
    got = _loss_fn(feats, onehot, li, tile, width, cfg)
    monkeypatch.setenv("CBL_DENSE", "off")
    ref = _loss_fn(feats, onehot, li, tile, width, cfg)
    assert np.isfinite(np.asarray(got))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4)


def test_dense_not_dispatched_off_flagship_options(monkeypatch):
    """Non-flagship options (kl posmask) must never enter the dense kernel."""
    feats, onehot, li, tile, width = _case(seed=7)
    cfg = ContrastConfig(pos="kl")
    monkeypatch.setenv("CBL_DENSE", "interpret")
    got = _loss_fn(feats, onehot, li, tile, width, cfg)
    monkeypatch.setenv("CBL_DENSE", "off")
    ref = _loss_fn(feats, onehot, li, tile, width, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0,
                               atol=0)


def test_split_gather_bit_identical(monkeypatch):
    """CBL_SPLIT_GATHER must be a pure layout change: same loss, same grads
    (the gathers are exact selections either way)."""
    feats, onehot, li, tile, width = _case(seed=9)
    cfg = ContrastConfig(pos="kl")  # off the kernel path: exercises gathers
    monkeypatch.setenv("CBL_DENSE", "off")
    monkeypatch.setenv("CBL_SPLIT_GATHER", "0")
    ref = _loss_fn(feats, onehot, li, tile, width, cfg)
    gref = jax.grad(_loss_fn)(feats, onehot, li, tile, width, cfg)
    monkeypatch.setenv("CBL_SPLIT_GATHER", "1")
    got = _loss_fn(feats, onehot, li, tile, width, cfg)
    ggot = jax.grad(_loss_fn)(feats, onehot, li, tile, width, cfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(ggot), np.asarray(gref))


def test_dense_grid_split_bit_identical(monkeypatch):
    """CBL_DENSE_SPLIT (round 5, VERDICT item 4) is a pure grid
    re-partition: loss and grads bit-match the unsplit kernel."""
    feats, onehot, li, tile, width = _case(g=6, seed=11)
    cfg = ContrastConfig()
    monkeypatch.setenv("CBL_DENSE", "interpret")
    monkeypatch.setenv("CBL_DENSE_SPLIT", "1")
    ref = _loss_fn(feats, onehot, li, tile, width, cfg)
    gref = jax.grad(_loss_fn)(feats, onehot, li, tile, width, cfg)
    monkeypatch.setenv("CBL_DENSE_SPLIT", "2")
    got = _loss_fn(feats, onehot, li, tile, width, cfg)
    ggot = jax.grad(_loss_fn)(feats, onehot, li, tile, width, cfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(ggot), np.asarray(gref))
