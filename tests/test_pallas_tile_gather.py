"""Pallas tile-window gather (ops/pallas/tile_gather_pl.py) — interpret-mode
parity vs the XLA one-hot path (ops/tile_gather.py), forward and backward."""
import numpy as np
import jax
import jax.numpy as jnp

from contrastboundary_tpu.ops.tile_gather import (
    tile_window_gather,
    tile_window_gather_auto,
)
from contrastboundary_tpu.ops.pallas.tile_gather_pl import tile_window_gather_pl


def _case(rng, b=2, g=4, tile=32, width=3, k=5, cl=16, dtype=np.float32):
    m = g * tile
    x = rng.randn(b, m, cl).astype(dtype)
    w = width * tile
    # indices in [0, W]; W = shadow
    li = rng.randint(0, w + 1, (b, m, k)).astype(np.int32)
    return jnp.asarray(x), jnp.asarray(li)


def test_forward_matches_xla_f32(rng):
    x, li = _case(rng)
    ref = tile_window_gather(x, li, 32, 3)
    out = tile_window_gather_pl(x, li, 32, 3, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_forward_matches_xla_bf16(rng):
    x, li = _case(rng)
    xb = x.astype(jnp.bfloat16)
    ref = tile_window_gather(xb, li, 32, 3)
    out = tile_window_gather_pl(xb, li, 32, 3, True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=1e-2
    )


def test_backward_matches_xla(rng):
    x, li = _case(rng, b=1, g=3, tile=16, width=3, k=4, cl=8)

    def loss_fn(impl):
        def f(xx):
            out = impl(xx, li, 16, 3) if impl is tile_window_gather else impl(
                xx, li, 16, 3, True
            )
            return jnp.sum(jnp.sin(out.astype(jnp.float32)) * 0.1)
        return f

    g_ref = jax.grad(loss_fn(tile_window_gather))(x)
    g_pl = jax.grad(loss_fn(tile_window_gather_pl))(x)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_ref), atol=1e-5
    )


def test_shadow_rows_zero_and_no_grad(rng):
    x, li = _case(rng, b=1, g=2, tile=16, width=2, k=3, cl=8)
    w = 2 * 16
    li = jnp.full_like(li, w)  # all shadow
    out = tile_window_gather_pl(x, li, 16, 2, True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    g = jax.grad(
        lambda xx: jnp.sum(tile_window_gather_pl(xx, li, 16, 2, True))
    )(x)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_hybrid_matches_xla_fwd_and_bwd(rng):
    from contrastboundary_tpu.ops.tile_gather import tile_window_gather_hybrid

    x, li = _case(rng, b=1, g=3, tile=16, width=3, k=4, cl=8)
    ref = tile_window_gather(x, li, 16, 3)
    out = tile_window_gather_hybrid(x, li, 16, 3, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss(impl, interp):
        def f(xx):
            o = impl(xx, li, 16, 3, True) if interp else impl(xx, li, 16, 3)
            return jnp.sum(jnp.sin(o.astype(jnp.float32)) * 0.1)
        return f

    g_ref = jax.grad(loss(tile_window_gather, False))(x)
    g_h = jax.grad(loss(tile_window_gather_hybrid, True))(x)
    np.testing.assert_allclose(np.asarray(g_h), np.asarray(g_ref), atol=1e-5)


def test_auto_dispatch_falls_back_on_cpu(rng):
    # on the CPU test backend the auto path must silently use XLA
    x, li = _case(rng, b=1, g=2, tile=16, width=3, k=3, cl=8)
    out = tile_window_gather_auto(x, li, 16, 3)
    ref = tile_window_gather(x, li, 16, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
