import numpy as np
import jax
import jax.numpy as jnp

from contrastboundary_tpu.ops import PyramidSpec, build_pyramid
from contrastboundary_tpu.models import PointTransformerSeg


SPEC = PyramidSpec(
    strides=(1, 4, 4),
    k_self=(8, 8, 8),
    k_down=(8, 8, 8),
    k_contrast=(8, 8, 8),
    with_subscene=True,
    sampler="fps",
)


def tiny_model():
    return PointTransformerSeg(
        num_classes=5, planes=(8, 16, 32), blocks=(2, 2, 2), share_planes=4,
        base_fdim=8,
    )


def make_inputs(rng, b=2, n=64):
    pts = rng.rand(b, n, 3).astype(np.float32)
    feats = rng.rand(b, n, 3).astype(np.float32)
    labels = rng.randint(0, 5, (b, n)).astype(np.int32)
    pyr = build_pyramid(jnp.asarray(pts), SPEC)
    return jnp.asarray(feats), jnp.asarray(labels), pyr


def test_forward_shapes_and_finite(rng):
    feats, labels, pyr = make_inputs(rng)
    model = tiny_model()
    variables = model.init(jax.random.PRNGKey(0), feats, pyr, train=False)
    out = model.apply(variables, feats, pyr, train=False)
    assert out.logits.shape == (2, 64, 5)
    assert np.isfinite(np.asarray(out.logits)).all()
    assert [f.shape[1] for f in out.up_feats] == [64, 16, 4]
    assert [f.shape[-1] for f in out.up_feats] == [8, 16, 32]
    assert [l.shape[-1] for l in out.latents] == [8, 8, 8]


def test_train_mode_updates_batch_stats(rng):
    feats, labels, pyr = make_inputs(rng)
    model = tiny_model()
    variables = model.init(jax.random.PRNGKey(0), feats, pyr, train=True)
    out, mutated = model.apply(
        variables, feats, pyr, train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated
    # running stats must have moved off init
    leaf = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert np.abs(np.asarray(leaf)).sum() > 0


def test_gradients_flow(rng):
    feats, labels, pyr = make_inputs(rng)
    model = tiny_model()
    variables = model.init(jax.random.PRNGKey(0), feats, pyr, train=True)
    params = variables["params"]

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            feats, pyr, train=True, mutable=["batch_stats"],
        )
        onehot = jax.nn.one_hot(labels, 5)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(out.logits) * onehot, -1))

    g = jax.grad(loss_fn)(params)
    norms = [float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms))
    assert sum(n > 0 for n in norms) > len(norms) * 0.9  # nearly all params used


def test_multihead_project_and_concatmlp(rng):
    feats, labels, pyr = make_inputs(rng)
    model = PointTransformerSeg(
        num_classes=5, planes=(8, 16, 32), blocks=(2, 2, 2), share_planes=4,
        base_fdim=8, multi_combine="concatmlp", contrast_project="mlp2",
    )
    variables = model.init(jax.random.PRNGKey(0), feats, pyr, train=False)
    out = model.apply(variables, feats, pyr, train=False)
    assert out.logits.shape == (2, 64, 5)
    assert all(f is not None for f in out.contrast_feats)
    assert all(f.shape[-1] == 8 for f in out.contrast_feats)
    # projected features differ from the raw latents
    assert not np.allclose(
        np.asarray(out.contrast_feats[0]), np.asarray(out.latents[0])
    )


def test_multihead_stage_subset(rng):
    feats, labels, pyr = make_inputs(rng)
    model = PointTransformerSeg(
        num_classes=5, planes=(8, 16, 32), blocks=(2, 2, 2), share_planes=4,
        base_fdim=8, multi_stages=(0, 2),
    )
    variables = model.init(jax.random.PRNGKey(0), feats, pyr, train=False)
    out = model.apply(variables, feats, pyr, train=False)
    assert out.logits.shape == (2, 64, 5)
    assert out.latents[0] is not None and out.latents[2] is not None
    assert out.latents[1] is None

    # CBL over 'Ua' silently skips the missing stage
    from contrastboundary_tpu.losses import ContrastConfig, cbl_loss

    total, per = cbl_loss(out.latents, pyr, labels, 5, ContrastConfig())
    assert set(per) == {"cbl_stage0", "cbl_stage2"}
    assert np.isfinite(float(total))


def test_stale_batchnorm_semantics(rng):
    """StaleBatchNorm (PERF.md round 4): normalizes with the PRE-update
    running stats, updates them from batch stats, matches nn.BatchNorm at
    eval, and keeps stats out of the gradient."""
    import pytest
    from flax import linen as nn

    from contrastboundary_tpu.models.blocks import StaleBatchNorm

    x = jnp.asarray(rng.randn(4, 16, 8).astype(np.float32) * 3 + 1)
    sbn = StaleBatchNorm(use_running_average=False)
    variables = sbn.init(jax.random.PRNGKey(0), x)
    assert np.allclose(np.asarray(variables["batch_stats"]["mean"]), 0)

    y, mut = sbn.apply(x=x, variables=variables, mutable=["batch_stats"])
    # normalize used the stale (init) stats: mean 0, var 1 → y == x
    assert np.allclose(np.asarray(y), np.asarray(x), atol=1e-5)
    # but the running stats moved toward the batch stats
    bm = np.asarray(x).reshape(-1, 8).mean(0)
    bv = np.asarray(x).reshape(-1, 8).var(0)
    assert np.allclose(np.asarray(mut["batch_stats"]["mean"]), 0.1 * bm, rtol=1e-4)
    assert np.allclose(
        np.asarray(mut["batch_stats"]["var"]), 0.9 + 0.1 * bv, rtol=1e-4
    )
    # second application normalizes with the UPDATED stats
    y2, _ = sbn.apply(
        x=x, variables={**variables, **mut}, mutable=["batch_stats"]
    )
    m1, v1 = 0.1 * bm, 0.9 + 0.1 * bv
    want = (np.asarray(x) - m1) / np.sqrt(v1 + 1e-5)
    assert np.allclose(np.asarray(y2), want, atol=1e-4)

    # eval: identical to nn.BatchNorm with the same running stats/params
    ebn = StaleBatchNorm(use_running_average=True)
    fbn = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    fvars = fbn.init(jax.random.PRNGKey(0), x)
    shared = {
        "params": fvars["params"],
        "batch_stats": {"mean": m1.astype(np.float32), "var": v1.astype(np.float32)},
    }
    ye = ebn.apply(x=x, variables=shared)
    yf = fbn.apply(x=x, variables=shared)
    assert np.allclose(np.asarray(ye), np.asarray(yf), atol=1e-5)

    # gradient flows only through x (stats are stop_gradient'd): with init
    # stats the train-mode op is identity → gradient of sum == ones
    g = jax.grad(
        lambda xx: float(0) + jnp.sum(
            sbn.apply(x=xx, variables=variables, mutable=["batch_stats"])[0]
        )
    )(x)
    assert np.allclose(np.asarray(g), 1.0, atol=1e-5)


def test_bn_mode_stale_model_smoke(rng):
    """The full backbone trains a step under bn_mode='stale' (finite loss,
    batch_stats move) and its param tree matches bn_mode='batch' shapes."""
    feats, labels, pyr = make_inputs(rng)
    model = PointTransformerSeg(
        num_classes=5, planes=(8, 16, 32), blocks=(2, 2, 2), share_planes=4,
        base_fdim=8, bn_mode="stale",
    )
    variables = model.init(jax.random.PRNGKey(0), feats, pyr, train=True)
    ref = tiny_model().init(jax.random.PRNGKey(0), feats, pyr, train=True)
    shapes = lambda t: jax.tree_util.tree_map(lambda a: a.shape, t)
    assert shapes(variables["params"]) == shapes(ref["params"])
    out, mut = model.apply(
        variables, feats, pyr, train=True, mutable=["batch_stats"]
    )
    assert np.isfinite(np.asarray(out.logits)).all()
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).sum()),
        mut["batch_stats"], variables["batch_stats"],
    )
    assert sum(jax.tree_util.tree_leaves(moved)) > 0
