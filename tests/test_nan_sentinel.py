"""NaN sentinels (round-5 VERDICT item 1).

Round-4 postmortem: the parity campaign trained a fast-arm checkpoint to
99.8% NaN and pickled/evaluated it without any error. These regressions pin
the guards added in response: checkpoint saves refuse non-finite trees,
`tree_finite` is the shared predicate, and `debug_metrics` exposes the
grad/param global norms the bisect harness logs.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from contrastboundary_tpu.train.checkpoint import CheckpointManager
from contrastboundary_tpu.train.debug import tree_finite
from contrastboundary_tpu.train.state import create_train_state, make_optimizer


def make_state(bad=False):
    k = np.arange(16, dtype=np.float32).reshape(4, 4)
    if bad:
        k = k.copy()
        k[1, 2] = np.nan
    variables = {
        "params": {"dense": {"kernel": jnp.asarray(k)}},
        "batch_stats": {"bn": {"mean": jnp.zeros(4)}},
    }
    return create_train_state(variables, make_optimizer(0.1))


def test_tree_finite():
    assert tree_finite({"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}})
    assert not tree_finite({"a": jnp.array([1.0, np.inf])})
    assert not tree_finite({"a": jnp.array([[np.nan]])})
    # int leaves and empty trees are vacuously finite
    assert tree_finite({"i": jnp.arange(3)})
    assert tree_finite({})


def test_checkpoint_refuses_nan(tmp_path):
    ckpt = CheckpointManager(str(tmp_path))
    with pytest.raises(FloatingPointError, match="non-finite"):
        ckpt.save(1, make_state(bad=True))
    # nothing persisted
    import os

    assert not any(d.startswith("snap-") for d in os.listdir(tmp_path))
    # override still available for forensic dumps
    ckpt.save(1, make_state(bad=True), check_finite=False)
    ckpt.save(2, make_state(bad=False))  # clean tree saves normally


def test_debug_metrics_norms():
    """debug_metrics adds finite grad/param global norms to step metrics."""
    from contrastboundary_tpu.losses.contrast import ContrastConfig
    from contrastboundary_tpu.models import PointTransformerSeg
    from contrastboundary_tpu.ops import PyramidSpec, build_pyramid
    from contrastboundary_tpu.train import (
        TrainStepConfig, create_train_state, make_train_step,
    )
    import jax

    B, N, C = 1, 256, 13
    spec = PyramidSpec(
        strides=(1, 4), k_self=(8, 8), k_down=(8, 8), k_contrast=(8, 8),
        with_subscene=True, sampler="serialized",
    )
    model = PointTransformerSeg(
        num_classes=C, planes=(8, 16), blocks=(2, 2), share_planes=4,
        base_fdim=8,
    )
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    feats = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, C, (B, N)), jnp.int32)
    pyr = build_pyramid(pts, spec)
    variables = model.init(jax.random.PRNGKey(0), feats, pyr, train=True)
    cfg = TrainStepConfig(
        num_classes=C, spec=spec, contrast=ContrastConfig(),
        debug_metrics=True,
    )
    state = create_train_state(variables, make_optimizer(0.01))
    step = make_train_step(model, cfg)
    _, metrics = step(state, {"points": pts, "features": feats, "labels": labels})
    assert np.isfinite(float(metrics["grad_norm"]))
    assert float(metrics["grad_norm"]) > 0
    assert np.isfinite(float(metrics["param_norm"]))
