"""Fused Pallas CBL kernel v2 (ops/pallas/cbl_tile2.py, running-accumulator
form) vs the XLA tile path — values and analytic gradients, interpret mode.
Tiny shapes: interpret emulation is slow."""
import jax
import jax.numpy as jnp
import numpy as np

from contrastboundary_tpu.losses.contrast import ContrastConfig, cbl_stage_loss
from contrastboundary_tpu.ops.pallas.cbl_tile2 import cbl_tile_softnn2

B, M, K, NCLS, C = 1, 256, 4, 3, 8
TILE, WINDOW = 64, 1
G = M // TILE
WIDTH = min(2 * WINDOW + 1, G)
W = WIDTH * TILE


def _data(seed=0, soft=False):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(B, M, C).astype(np.float32))
    if soft:
        # soft sub-scene label distributions (incl. all-zero invalid rows)
        ls = rng.rand(B, M, NCLS).astype(np.float32)
        ls /= ls.sum(-1, keepdims=True)
        ls[rng.rand(B, M) < 0.1] = 0.0
        label_soft = jnp.asarray(ls)
    else:
        lab = rng.randint(-1, NCLS, (B, M))
        onehot = np.zeros((B, M, NCLS), np.float32)
        for b in range(B):
            for i in range(M):
                if lab[b, i] >= 0:
                    onehot[b, i, lab[b, i]] = 1
        label_soft = jnp.asarray(onehot)
    li = jnp.asarray(rng.randint(0, W + 1, (B, M, K)).astype(np.int32))
    return feats, label_soft, li


def _pal_loss(feats, label_soft, li, temperature=1.0, weight=0.1):
    ls, ms = cbl_tile_softnn2(
        feats, label_soft, li, temperature, TILE, WIDTH, WINDOW, True
    )
    return jnp.sum(ls) / jnp.maximum(jnp.sum(ms), 1.0) * weight


def test_v2_matches_xla_value_and_grad():
    feats, label_soft, li = _data()
    cfg = ContrastConfig()

    def ref_loss(f):
        return cbl_stage_loss(f, li, label_soft, cfg, local=(TILE, WIDTH))

    r = float(ref_loss(feats))
    p = float(_pal_loss(feats, label_soft, li))
    np.testing.assert_allclose(r, p, rtol=1e-5)
    gr = jax.grad(ref_loss)(feats)
    gp = jax.grad(lambda f: _pal_loss(f, label_soft, li))(feats)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gp), atol=1e-6)


def test_v2_soft_labels_and_temperature():
    feats, label_soft, li = _data(3, soft=True)
    cfg = ContrastConfig(temperature=0.5)

    def ref_loss(f):
        return cbl_stage_loss(f, li, label_soft, cfg, local=(TILE, WIDTH))

    r = float(ref_loss(feats))
    p = float(_pal_loss(feats, label_soft, li, temperature=0.5))
    np.testing.assert_allclose(r, p, rtol=1e-5)
    gr = jax.grad(ref_loss)(feats)
    gp = jax.grad(lambda f: _pal_loss(f, label_soft, li, 0.5))(feats)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gp), atol=1e-6)


def test_v2_bf16_close_to_f32():
    feats, label_soft, li = _data(4)
    p32 = float(_pal_loss(feats, label_soft, li))
    pb = float(_pal_loss(feats.astype(jnp.bfloat16), label_soft, li))
    np.testing.assert_allclose(pb, p32, rtol=3e-2)
    g = jax.grad(
        lambda f: _pal_loss(f, label_soft, li)
    )(feats.astype(jnp.bfloat16))
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, np.float32)).all()


def test_v2_all_shadow_no_nan():
    feats, label_soft, _ = _data(5)
    li = jnp.full((B, M, K), W, jnp.int32)  # every neighbor invalid
    val = float(_pal_loss(feats, label_soft, li))
    assert np.isfinite(val)
    assert val == 0.0  # no masked points -> 0/max(0,1)
    g = jax.grad(lambda f: _pal_loss(f, label_soft, li))(feats)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_v2_multi_chunk_accumulation(rng):
    """K > K_CHUNK exercises the chunked-grid revisited-output accumulator
    (online softmax across chunks must match the one-shot XLA value)."""
    k = 12  # > K_CHUNK=8 -> 2 chunks (second padded with shadow)
    feats = jnp.asarray(rng.randn(B, M, C).astype(np.float32))
    lab = rng.randint(0, NCLS, (B, M))
    label_soft = jnp.asarray(np.eye(NCLS, dtype=np.float32)[lab])
    li = jnp.asarray(rng.randint(0, W + 1, (B, M, k)).astype(np.int32))
    cfg = ContrastConfig()

    def ref_loss(f):
        return cbl_stage_loss(f, li, label_soft, cfg, local=(TILE, WIDTH))

    def pal_loss(f):
        ls, ms = cbl_tile_softnn2(
            f, label_soft, li, 1.0, TILE, WIDTH, WINDOW, True
        )
        return jnp.sum(ls) / jnp.maximum(jnp.sum(ms), 1.0) * cfg.weight

    np.testing.assert_allclose(
        float(ref_loss(feats)), float(pal_loss(feats)), rtol=1e-5
    )
    gr = jax.grad(ref_loss)(feats)
    gp = jax.grad(pal_loss)(feats)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gp), atol=1e-6)
