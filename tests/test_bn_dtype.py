"""BN compute-dtype knob (BN_COMPUTE=model, opt-in — models/blocks.py::
_bn_dtype): bf16 BN tracks the f32-BN trajectory, the variable trees stay
checkpoint-identical, and the DEFAULT (env unset) keeps BN in f32."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastboundary_tpu.losses.contrast import ContrastConfig
from contrastboundary_tpu.models import PointTransformerSeg
from contrastboundary_tpu.models.blocks import make_bn
from contrastboundary_tpu.ops import PyramidSpec, build_pyramid
from contrastboundary_tpu.train import (
    TrainStepConfig,
    create_train_state,
    make_train_step,
)
from contrastboundary_tpu.train.state import make_optimizer

B, N, NCLS = 2, 512, 5
SPEC = PyramidSpec(
    strides=(1, 4, 4),
    k_self=(8, 8, 8),
    k_down=(8, 8, 8),
    k_contrast=(12, 8, 8),
    with_subscene=True,
    sampler="serialized",
    layout="sorted",
)


def test_default_bn_dtype_is_f32(monkeypatch):
    monkeypatch.delenv("BN_COMPUTE", raising=False)
    bn = make_bn("batch", train=True, model_dtype=jnp.bfloat16)
    assert bn.dtype == jnp.float32
    bn = make_bn("stale", train=True, model_dtype=jnp.bfloat16)
    assert bn.dtype == jnp.float32


def test_bn_compute_model_uses_block_dtype(monkeypatch):
    monkeypatch.setenv("BN_COMPUTE", "model")
    bn = make_bn("batch", train=True, model_dtype=jnp.bfloat16)
    assert bn.dtype == jnp.bfloat16
    # call sites that don't pass model_dtype keep f32 under the env too
    bn = make_bn("batch", train=True)
    assert bn.dtype == jnp.float32


def _run(monkeypatch, bn_compute, steps=6):
    if bn_compute:
        monkeypatch.setenv("BN_COMPUTE", bn_compute)
    else:
        monkeypatch.delenv("BN_COMPUTE", raising=False)
    model = PointTransformerSeg(
        num_classes=NCLS, planes=(16, 32, 64), blocks=(2, 2, 2),
        dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    batch = {
        "points": jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 4.0),
        "features": jnp.asarray(rng.rand(B, N, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(-1, NCLS, (B, N)).astype(np.int32)),
    }
    pyr = build_pyramid(batch["points"], SPEC)
    feats = jnp.take_along_axis(batch["features"], pyr.order0[..., None], 1)
    variables = model.init(jax.random.PRNGKey(0), feats, pyr, train=True)
    state = create_train_state(
        variables, make_optimizer(0.05, momentum=0.9, weight_decay=1e-4)
    )
    step = make_train_step(
        model,
        TrainStepConfig(num_classes=NCLS, spec=SPEC, contrast=ContrastConfig()),
    )
    losses = []
    for _ in range(steps):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    return losses, variables


def test_bn_bf16_trains_and_tracks_f32_bn(monkeypatch):
    l_bf16, v_bf16 = _run(monkeypatch, "model")
    l_f32, v_f32 = _run(monkeypatch, None)
    assert np.isfinite(l_bf16).all()
    assert l_bf16[-1] < l_bf16[0]
    # same trajectory within bf16 rounding noise (class as tests/test_bf16.py)
    np.testing.assert_allclose(l_bf16[0], l_f32[0], rtol=0.05)
    np.testing.assert_allclose(l_bf16[-1], l_f32[-1], rtol=0.10)
    # checkpoint compatibility: identical variable trees (paths and shapes)
    flat16 = jax.tree_util.tree_flatten_with_path(v_bf16)[0]
    flat32 = jax.tree_util.tree_flatten_with_path(v_f32)[0]
    assert [(p, a.shape) for p, a in flat16] == [
        (p, a.shape) for p, a in flat32
    ]
    # params themselves stay f32 (only activations round)
    for _, a in jax.tree_util.tree_flatten_with_path(v_bf16["params"])[0]:
        assert a.dtype == jnp.float32
