import numpy as np
import jax
import jax.numpy as jnp
import pytest

from contrastboundary_tpu.ops import PyramidSpec, build_pyramid
from contrastboundary_tpu.models.convnet import ConvNetSeg, build_input_features
from contrastboundary_tpu.models.local_aggregation import (
    AGGREGATORS,
    generate_kernel_points,
)


def conv_spec(radii=True):
    r = tuple(0.3 * 2**i for i in range(3))
    return PyramidSpec(
        strides=(1, 4, 4),
        k_self=(12, 12, 12),
        k_down=(12, 12, 12),
        k_contrast=(8, 8, 8),
        with_subscene=True,
        sampler="voxel",
        voxel_sizes=(0.05, 0.1, 0.2),
        radii=r if radii else None,
        down_radii=r if radii else None,
    )


def make_inputs(rng, b=2, n=256):
    pts = rng.rand(b, n, 3).astype(np.float32)
    colors = rng.rand(b, n, 3).astype(np.float32)
    pyr = build_pyramid(jnp.asarray(pts), conv_spec())
    return jnp.asarray(colors), pyr


def tiny_convnet(**kw):
    base = dict(
        num_classes=5, base_fdim=18, depth=1, base_radius=0.3, num_layers=3,
        aggregation="adaptive_weight",
    )
    base.update(kw)
    return ConvNetSeg(**base)


def test_input_features():
    p = jnp.ones((1, 4, 3)) * 2.0
    c = jnp.ones((1, 4, 3)) * 0.5
    f = build_input_features(p, c, "1-rgb-Z")
    assert f.shape == (1, 4, 5)
    np.testing.assert_allclose(f[0, 0], [1, 0.5, 0.5, 0.5, 2.0])
    assert build_input_features(p, c, "1-rgb-xyz-Z").shape == (1, 4, 8)


def test_pyramid_radius_shadows(rng):
    pts = rng.rand(1, 256, 3).astype(np.float32)
    pyr = build_pyramid(jnp.asarray(pts), conv_spec())
    # some far-apart points must have shadow-padded neighborhoods
    idx0 = np.asarray(pyr.self_idx[0])
    assert (idx0 == 256).any()
    assert (idx0[..., 0] < 256).all()  # self always within radius


def test_convnet_forward_and_grads(rng):
    colors, pyr = make_inputs(rng)
    model = tiny_convnet()
    variables = model.init(jax.random.PRNGKey(0), colors, pyr, train=False)
    out = model.apply(variables, colors, pyr, train=False)
    assert out.logits.shape == (2, 256, 5)
    assert np.isfinite(np.asarray(out.logits)).all()
    assert [f.shape[-1] for f in out.down_feats] == [36, 72, 144]
    assert [f.shape[-1] for f in out.up_feats] == [18, 36, 144]

    def loss_fn(p):
        o, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            colors, pyr, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(o.logits**2)

    g = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(n) for n in norms)


@pytest.mark.parametrize(
    "agg,kw",
    [
        ("pospool", {"position_embedding": "sin_cos", "reduction": "mean"}),
        ("pospool", {"position_embedding": "xyz", "reduction": "sum"}),
        ("pospool", {"position_embedding": "three_order", "reduction": "max"}),
        ("adaptive_weight", {"local_input_feature": "dp", "reduction": "mean"}),
        ("adaptive_weight", {"local_input_feature": "dp_fi_df",
                             "weight_softmax": "mask", "reduction": "sum"}),
        ("pointwisemlp", {"local_input_feature": "dp_fj", "reduction": "max"}),
        ("pseudo_grid", {}),
        ("identity", {}),
    ],
)
def test_aggregators_finite(rng, agg, kw):
    b, n, k, c = 1, 64, 8, 18
    p = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
    f = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n + 1, (b, n, k)))  # includes shadows
    idx = idx.at[:, :, 0].set(jnp.arange(n))  # first = self
    cls = AGGREGATORS[agg]
    kwargs = dict(out_fdim=24, **kw)
    if agg == "pseudo_grid":
        kwargs["radius"] = 0.5
    mod = cls(**kwargs)
    variables = mod.init(jax.random.PRNGKey(0), p, p, idx, f, 0.5, True)
    out = mod.apply(variables, p, p, idx, f, 0.5, True,
                    mutable=["batch_stats"])[0]
    assert out.shape == (b, n, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_shadow_invariance_adaptive_mean(rng):
    """Mean-reduction aggregation must be invariant to adding shadow cols."""
    b, n, k, c = 1, 32, 6, 12
    p = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
    f = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (b, n, k)))
    idx = idx.at[:, :, 0].set(jnp.arange(n))
    idx_sh = jnp.concatenate([idx, jnp.full((b, n, 3), n, jnp.int32)], -1)
    mod = AGGREGATORS["adaptive_weight"](
        out_fdim=12, local_input_feature="dp", reduction="mean"
    )
    variables = mod.init(jax.random.PRNGKey(0), p, p, idx, f, 0.5, False)
    o1 = mod.apply(variables, p, p, idx, f, 0.5, False)
    o2 = mod.apply(variables, p, p, idx_sh, f, 0.5, False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-4, atol=1e-5)


def test_kernel_points():
    kp = generate_kernel_points(1.0, 15)
    assert kp.shape == (15, 3)
    np.testing.assert_allclose(kp[0], 0.0)  # center pinned
    r = np.linalg.norm(kp[1:], axis=1)
    assert (r > 0.2).all() and (r <= 1.01).all()
    d = np.linalg.norm(kp[:, None] - kp[None], axis=-1) + np.eye(15)
    assert d.min() > 0.2  # well separated


def test_kernel_points_deterministic():
    np.testing.assert_array_equal(
        generate_kernel_points(1.0, 15), generate_kernel_points(1.0, 15)
    )


def test_randla_style_forward_and_grads(rng):
    """RandLA arm (BASELINE configs[1]): random decimation + attentive
    pooling (AdaptiveWeight masked softmax) trains end to end."""
    import dataclasses

    spec = dataclasses.replace(conv_spec(radii=False), sampler="random")
    pts = rng.rand(2, 256, 3).astype(np.float32)
    colors = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
    pyr = build_pyramid(jnp.asarray(pts), spec)
    model = tiny_convnet(agg_kwargs=(("weight_softmax", "mask"),))
    variables = model.init(jax.random.PRNGKey(0), colors, pyr, train=True)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            colors, pyr, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(out.logits**2)

    l, g = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(l))
    norms = [float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms)) and sum(n > 0 for n in norms) > 0
