"""bfloat16 model path: the sorted-layout train step runs in bf16 with loss
math pinned to f32 (losses/contrast.py), and tracks the f32 trajectory."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from contrastboundary_tpu.losses.contrast import ContrastConfig
from contrastboundary_tpu.models import PointTransformerSeg
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


def _run(dtype, steps=6):
    model = PointTransformerSeg(
        num_classes=NCLS, planes=(16, 32, 64), blocks=(2, 2, 2), dtype=dtype
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
        model, TrainStepConfig(num_classes=NCLS, spec=SPEC, contrast=ContrastConfig())
    )
    losses = []
    for _ in range(steps):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    return losses


def test_bf16_trains_and_tracks_f32():
    l16 = _run(jnp.bfloat16)
    l32 = _run(jnp.float32)
    assert np.isfinite(l16).all()
    assert l16[-1] < l16[0]
    # same trajectory within bf16 rounding noise
    np.testing.assert_allclose(l16[0], l32[0], rtol=0.05)
    np.testing.assert_allclose(l16[-1], l32[-1], rtol=0.10)
