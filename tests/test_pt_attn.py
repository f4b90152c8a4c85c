"""Fused point-transformer attention kernel (ops/pallas/pt_attn.py):
interpret-mode parity of forward / stats / analytic VJP against a pure-JAX
re-derivation, plus module-level parity against the XLA PointTransformerLayer
path under bn_mode='stale'."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from contrastboundary_tpu.ops.pallas.pt_attn import (
    pt_attn,
    pt_attn_reference,
)

@pytest.fixture(params=["batched", "perk"], autouse=True)
def attn_impl(request, monkeypatch):
    """Run every test under both kernel bodies (PERF.md round 4: the
    K-batched variant folds the K loop into the row dimension)."""
    monkeypatch.setenv("PT_ATTN_IMPL", request.param)
    return request.param


TILE, WIDTH, WINDOW, K, C, S = 8, 3, 1, 4, 16, 4
G = 4
M = G * TILE
W = TILE * WIDTH


def _params(rng, c=C, cs=C // S):
    def a(shape, off=0.0):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.3 + off)

    return (
        a((3, 3)), a((1, 3)), a((3, c)), a((1, c)),
        a((1, c), 1.0), a((1, c)),
        a((c, cs)), a((1, cs)), a((1, cs), 1.0), a((1, cs)),
        a((cs, cs)), a((1, cs)),
    )


def _inputs(rng, with_shadow=False, dtype=jnp.float32):
    q = jnp.asarray(rng.randn(2, M, C).astype(np.float32), dtype)
    kv = jnp.asarray(rng.randn(2, M, 2 * C).astype(np.float32), dtype)
    rel = jnp.asarray(rng.randn(2, M, K, 3).astype(np.float32))
    li = rng.randint(0, W, (2, M, K)).astype(np.int32)
    # slot 0 = self (ensure_self invariant) so a row never goes all-shadow
    starts = np.clip(np.arange(G) - WINDOW, 0, G - WIDTH)
    self_pos = np.arange(M) - np.repeat(starts * TILE, TILE)
    li[:, :, 0] = self_pos[None]
    if with_shadow:
        li[:, ::3, -1] = W  # sprinkle shadow indices
    return q, kv, rel, jnp.asarray(li)


def test_fwd_matches_reference(rng):
    q, kv, rel, li = _inputs(rng, with_shadow=True)
    params = _params(rng)
    out, s1, s2 = pt_attn(
        q, kv, rel, li, TILE, WIDTH, WINDOW, S, True, *params
    )
    ref_out, ref_s1, ref_s2 = pt_attn_reference(
        q, kv, rel, li, params, TILE, WIDTH, S
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), rtol=2e-5, atol=2e-5
    )
    for got, want in [(s1[0], ref_s1[0]), (s1[1], ref_s1[1]),
                      (s2[0], ref_s2[0]), (s2[1], ref_s2[1])]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


def test_vjp_matches_reference(rng):
    q, kv, rel, li = _inputs(rng, with_shadow=True)
    params = _params(rng)
    gref = jnp.asarray(rng.randn(2, M, C).astype(np.float32))

    def loss_kernel(q_, kv_, *ps):
        out, _, _ = pt_attn(q_, kv_, rel, li, TILE, WIDTH, WINDOW, S, True,
                            *ps)
        return jnp.sum(out * gref)

    def loss_ref(q_, kv_, *ps):
        out, _, _ = pt_attn_reference(q_, kv_, rel, li, ps, TILE, WIDTH, S)
        return jnp.sum(out * gref)

    argnums = tuple(range(2 + len(params)))
    gk = jax.grad(loss_kernel, argnums)(q, kv, *params)
    gr = jax.grad(loss_ref, argnums)(q, kv, *params)
    names = ["q", "kv"] + [f"p{i}" for i in range(len(params))]
    for n, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4,
            err_msg=f"grad mismatch for {n}",
        )


def test_module_kernel_path_matches_xla(rng, monkeypatch):
    """PointTransformerLayer with PT_ATTN=interpret must reproduce the XLA
    stale-BN path: same outputs, same batch_stats updates, same param tree."""
    from contrastboundary_tpu.models.blocks import PointTransformerLayer

    monkeypatch.setenv("PT_ATTN", "interpret")
    p = jnp.asarray(rng.rand(2, M, 3).astype(np.float32))
    x = jnp.asarray(rng.randn(2, M, C).astype(np.float32))
    rel = jnp.asarray(rng.randn(2, M, K, 3).astype(np.float32) * 0.1)
    _, _, _, li = _inputs(rng, with_shadow=True)
    layer = PointTransformerLayer(C, S, bn_mode="stale")

    v_kernel = layer.init(
        jax.random.PRNGKey(0), p, x, li, True, rel, (TILE, WIDTH)
    )
    out_k, mut_k = layer.apply(
        v_kernel, p, x, li, True, rel, (TILE, WIDTH),
        mutable=["batch_stats"],
    )

    monkeypatch.setenv("PT_ATTN", "off")
    v_xla = layer.init(
        jax.random.PRNGKey(0), p, x, li, True, rel, (TILE, WIDTH)
    )
    ks = lambda t: set(jax.tree_util.tree_leaves_with_path(t) and [
        jax.tree_util.keystr(kp) for kp, _ in
        jax.tree_util.tree_leaves_with_path(t)
    ])
    assert ks(v_kernel) == ks(v_xla)  # checkpoint-compatible trees
    out_x, mut_x = layer.apply(
        {"params": v_kernel["params"],
         "batch_stats": v_kernel["batch_stats"]},
        p, x, li, True, rel, (TILE, WIDTH), mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_x), rtol=2e-4, atol=2e-4
    )
    flat_k = {
        jax.tree_util.keystr(kp): v
        for kp, v in jax.tree_util.tree_leaves_with_path(mut_k)
    }
    flat_x = {
        jax.tree_util.keystr(kp): v
        for kp, v in jax.tree_util.tree_leaves_with_path(mut_x)
    }
    assert flat_k.keys() == flat_x.keys()
    for key in flat_k:
        np.testing.assert_allclose(
            np.asarray(flat_k[key]), np.asarray(flat_x[key]),
            rtol=2e-4, atol=2e-4, err_msg=f"batch_stats mismatch at {key}",
        )


def test_module_kernel_grads_match_xla(rng, monkeypatch):
    from contrastboundary_tpu.models.blocks import PointTransformerLayer

    p = jnp.asarray(rng.rand(2, M, 3).astype(np.float32))
    x = jnp.asarray(rng.randn(2, M, C).astype(np.float32))
    rel = jnp.asarray(rng.randn(2, M, K, 3).astype(np.float32) * 0.1)
    _, _, _, li = _inputs(rng)
    layer = PointTransformerLayer(C, S, bn_mode="stale")
    monkeypatch.setenv("PT_ATTN", "interpret")
    variables = layer.init(
        jax.random.PRNGKey(0), p, x, li, True, rel, (TILE, WIDTH)
    )

    def loss(params, env):
        monkeypatch.setenv("PT_ATTN", env)
        out, _ = layer.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            p, x, li, True, rel, (TILE, WIDTH), mutable=["batch_stats"],
        )
        return jnp.sum(out * out)

    gk = jax.grad(lambda pr: loss(pr, "interpret"))(variables["params"])
    gx = jax.grad(lambda pr: loss(pr, "off"))(variables["params"])
    for kp, a in jax.tree_util.tree_leaves_with_path(gk):
        b = flatget(gx, kp)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(kp)}",
        )


def flatget(tree, kp):
    for k, v in jax.tree_util.tree_leaves_with_path(tree):
        if k == kp:
            return v
    raise KeyError(kp)


def test_subtile_matches_reference(rng, monkeypatch):
    """PT_ATTN_SUBTILE < tile (the round-5 VMEM bound for wide C): the grid
    iterates sub-tiles while window blocks stay index-tile sized; outputs
    and VJP must be identical to the full-tile kernel."""
    monkeypatch.setenv("PT_ATTN_SUBTILE", "8")
    tile2, g2 = 16, 3
    m2 = tile2 * g2
    w2 = tile2 * WIDTH
    q = jnp.asarray(rng.randn(2, m2, C).astype(np.float32))
    kv = jnp.asarray(rng.randn(2, m2, 2 * C).astype(np.float32))
    rel = jnp.asarray(rng.randn(2, m2, K, 3).astype(np.float32))
    li = rng.randint(0, w2, (2, m2, K)).astype(np.int32)
    starts = np.clip(np.arange(g2) - WINDOW, 0, g2 - WIDTH)
    li[:, :, 0] = (np.arange(m2) - np.repeat(starts * tile2, tile2))[None]
    li[:, ::5, -1] = w2
    li = jnp.asarray(li)
    params = _params(rng)

    out, s1, s2 = pt_attn(q, kv, rel, li, tile2, WIDTH, WINDOW, S, True,
                          *params)
    ref_out, ref_s1, ref_s2 = pt_attn_reference(
        q, kv, rel, li, params, tile2, WIDTH, S
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1[0]), np.asarray(ref_s1[0]),
                               rtol=2e-5, atol=2e-5)

    def loss_k(q_, kv_, *ps):
        o, _, _ = pt_attn(q_, kv_, rel, li, tile2, WIDTH, WINDOW, S, True,
                          *ps)
        return jnp.sum(o * o)

    def loss_r(q_, kv_, *ps):
        o, _, _ = pt_attn_reference(q_, kv_, rel, li, ps, tile2, WIDTH, S)
        return jnp.sum(o * o)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 8))(q, kv, *params)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 8))(q, kv, *params)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_grid_split_matches_reference(rng, monkeypatch):
    """PT_ATTN_SPLIT (round 5, VERDICT item 4) is a pure grid re-partition:
    fwd out/stats and the analytic VJP must bit-match the unsplit kernel's
    reference parity (same tolerances as test_fwd/vjp_matches_reference)."""
    q, kv, rel, li = _inputs(rng, with_shadow=True)
    params = _params(rng)

    def run():
        out, s1, s2 = pt_attn(
            q, kv, rel, li, TILE, WIDTH, WINDOW, S, True, *params
        )
        g = jax.grad(
            lambda qq, kvv: jnp.sum(
                pt_attn(qq, kvv, rel, li, TILE, WIDTH, WINDOW, S, True,
                        *params)[0] ** 2
            ),
            argnums=(0, 1),
        )(q, kv)
        return out, s1, s2, g

    monkeypatch.setenv("PT_ATTN_SPLIT", "1")
    ref = run()
    monkeypatch.setenv("PT_ATTN_SPLIT", "2")
    got = run()
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
