"""Fused Pallas CBL kernel (ops/pallas/cbl_tile.py) vs the XLA tile path —
values and analytic gradients, interpret mode (CPU). Shapes stay tiny:
Pallas interpret emulation is slow."""
import jax
import jax.numpy as jnp
import numpy as np

from contrastboundary_tpu.losses.contrast import ContrastConfig, cbl_stage_loss
from contrastboundary_tpu.ops.pallas.cbl_tile import cbl_tile_softnn

B, M, K, NCLS, C = 1, 256, 4, 3, 8
TILE, WINDOW = 64, 1
G = M // TILE
WIDTH = min(2 * WINDOW + 1, G)
W = WIDTH * TILE


def _data(seed=0):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(B, M, C).astype(np.float32))
    lab = rng.randint(-1, NCLS, (B, M))
    onehot = np.zeros((B, M, NCLS), np.float32)
    for b in range(B):
        for i in range(M):
            if lab[b, i] >= 0:
                onehot[b, i, lab[b, i]] = 1
    # window-relative indices including shadow (= W) slots
    li = jnp.asarray(rng.randint(0, W + 1, (B, M, K)).astype(np.int32))
    return feats, jnp.asarray(onehot), li


def test_pallas_cbl_matches_xla_value_and_grad():
    feats, label_soft, li = _data()
    cfg = ContrastConfig()

    def ref_loss(f):
        return cbl_stage_loss(f, li, label_soft, cfg, local=(TILE, WIDTH))

    def pal_loss(f):
        fused = jnp.concatenate([label_soft, f], -1)
        ls, ms = cbl_tile_softnn(
            fused, li, NCLS, 1.0, TILE, WIDTH, WINDOW, True
        )
        return jnp.sum(ls) / jnp.maximum(jnp.sum(ms), 1.0) * cfg.weight

    r, p = float(ref_loss(feats)), float(pal_loss(feats))
    np.testing.assert_allclose(r, p, rtol=1e-5)
    gr = jax.grad(ref_loss)(feats)
    gp = jax.grad(pal_loss)(feats)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gp), atol=1e-7)


def test_pallas_dispatch_in_stage_loss():
    """cbl_stage_loss(impl='auto'/'pallas') routes the flagship option point
    through the v2 kernel when the probe says the toolchain accepts it, and
    matches the XLA path; non-flagship options fall back."""
    import contrastboundary_tpu.losses.contrast as cl
    import contrastboundary_tpu.ops.pallas.cbl_tile2 as ct2

    feats, label_soft, li = _data(1)
    xla = cbl_stage_loss(
        feats, li, label_soft, ContrastConfig(impl="xla"), local=(TILE, WIDTH)
    )
    orig_ok = cl._cbl_pallas_ok
    orig_kern = ct2.cbl_tile_softnn2

    def spy(f, ls, lidx, *a, **kw):
        spy.called = True
        return orig_kern(f, ls, lidx, *a[:4], True)  # force interpret on CPU

    spy.called = False
    cl._cbl_pallas_ok = lambda *a, **kw: True  # pretend the probe passed
    ct2.cbl_tile_softnn2 = spy
    try:
        pal = cbl_stage_loss(
            feats, li, label_soft, ContrastConfig(impl="auto"),
            local=(TILE, WIDTH),
        )
        assert spy.called
        # kl posmask is outside the kernel's scope → must NOT call it
        spy.called = False
        _ = cbl_stage_loss(
            feats, li, label_soft, ContrastConfig(impl="auto", pos="kl"),
            local=(TILE, WIDTH),
        )
        assert not spy.called
    finally:
        cl._cbl_pallas_ok = orig_ok
        ct2.cbl_tile_softnn2 = orig_kern
    np.testing.assert_allclose(float(xla), float(pal), rtol=1e-5)


def test_pallas_probe_failure_falls_back_on_auto():
    """impl='auto' with a failing probe must fall back to the XLA path."""
    import contrastboundary_tpu.losses.contrast as cl

    feats, label_soft, li = _data(2)
    orig = cl._cbl_pallas_ok
    cl._cbl_pallas_ok = lambda *a, **kw: False
    try:
        out = cbl_stage_loss(
            feats, li, label_soft, ContrastConfig(impl="auto"),
            local=(TILE, WIDTH),
        )
    finally:
        cl._cbl_pallas_ok = orig
    ref = cbl_stage_loss(
        feats, li, label_soft, ContrastConfig(impl="xla"), local=(TILE, WIDTH)
    )
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-6)
