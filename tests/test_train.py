import numpy as np
import jax
import jax.numpy as jnp
import pytest

from contrastboundary_tpu.losses.contrast import ContrastConfig
from contrastboundary_tpu.models import PointTransformerSeg
from contrastboundary_tpu.ops import PyramidSpec, build_pyramid
from contrastboundary_tpu.parallel import make_mesh, shard_batch, replicated_sharding
from contrastboundary_tpu.train import (
    TrainStepConfig,
    create_train_state,
    make_train_step,
    make_eval_step,
    exponential_epoch_decay,
    multistep_epoch_decay,
)
from contrastboundary_tpu.train.state import make_optimizer


SPEC = PyramidSpec(
    strides=(1, 4, 4),
    k_self=(8, 8, 8),
    k_down=(8, 8, 8),
    k_contrast=(8, 8, 8),
    with_subscene=True,
    sampler="serialized",
)


def make_setup(rng, b=2, n=128, with_cbl=True, lr=0.05):
    model = PointTransformerSeg(
        num_classes=3, planes=(8, 16, 32), blocks=(2, 2, 2), share_planes=4,
        base_fdim=8,
    )
    cfg = TrainStepConfig(
        num_classes=3, spec=SPEC,
        contrast=ContrastConfig(weight=0.1) if with_cbl else None,
    )
    pts = rng.rand(b, n, 3).astype(np.float32)
    labels = (pts[..., 0] > 0.5).astype(np.int32) + (pts[..., 1] > 0.5)
    batch = {
        "points": jnp.asarray(pts),
        "features": jnp.asarray(pts.copy()),
        "labels": jnp.asarray(labels),
    }
    pyr = build_pyramid(batch["points"], SPEC)
    variables = model.init(jax.random.PRNGKey(0), batch["features"], pyr, train=True)
    tx = make_optimizer(lr, momentum=0.9, weight_decay=1e-4)
    state = create_train_state(variables, tx)
    return model, cfg, state, batch


def test_loss_decreases(rng):
    model, cfg, state, batch = make_setup(rng)
    step = make_train_step(model, cfg)
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.7, losses


def test_train_metrics_structure(rng):
    model, cfg, state, batch = make_setup(rng)
    step = make_train_step(model, cfg)
    state, metrics = step(state, batch)
    for k in ["loss", "ce", "cbl", "cbl_stage0", "cbl_stage1", "cbl_stage2", "confusion"]:
        assert k in metrics, k
    assert metrics["confusion"].shape == (3, 3)
    assert int(state.step) == 1


def test_eval_step(rng):
    model, cfg, state, batch = make_setup(rng)
    estep = make_eval_step(model, cfg)
    probs, conf = estep(state, batch)
    assert probs.shape == (2, 128, 3)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-4)


def test_multichip_dp(rng):
    """8-virtual-device data-parallel step: same semantics as single-device
    (covers the reference's untested multi-device gap)."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(jax.devices()[:8])
    model, cfg, state, batch = make_setup(rng, b=8)
    sharded = shard_batch(mesh, batch)
    state_r = jax.device_put(state, replicated_sharding(mesh))
    step = make_train_step(model, cfg)
    new_state, metrics = step(state_r, sharded)
    assert np.isfinite(float(metrics["loss"]))

    # parity: identical step on unsharded inputs gives the same loss
    model3, cfg3, state3, batch3 = make_setup(rng_copy(), b=8)
    step3 = make_train_step(model3, cfg3)
    _, metrics3 = step3(state3, batch3)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics3["loss"]), rtol=2e-4
    )


def rng_copy():
    return np.random.RandomState(0)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_schedules():
    ex = exponential_epoch_decay(0.01, 0.9885531, steps_per_epoch=500)
    assert np.isclose(float(ex(0)), 0.01)
    assert np.isclose(float(ex(500)), 0.01 * 0.9885531)
    assert np.isclose(float(ex(1000)), 0.01 * 0.9885531**2)

    ms = multistep_epoch_decay(0.5, [120, 160], 0.1, steps_per_epoch=100)
    assert np.isclose(float(ms(0)), 0.5)
    assert np.isclose(float(ms(12000)), 0.05)
    assert np.isclose(float(ms(16000)), 0.005)
