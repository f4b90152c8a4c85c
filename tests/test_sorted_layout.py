"""layout='sorted' equivalence: with full-width windows and exact KNN, the
Morton-sorted tile-local pipeline (pyramid + backbone matmul-gathers + CBL +
train/eval steps) must reproduce the natural-layout results.

The sampler is 'serialized' so both layouts select the SAME point sets per
level (every stride-th point of the Morton order — order-invariant); exact
KNN (knn_recall=None) then yields identical neighbor sets, and every loss is
permutation invariant.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastboundary_tpu.losses.contrast import ContrastConfig
from contrastboundary_tpu.models import PointTransformerSeg
from contrastboundary_tpu.ops import PyramidSpec, build_pyramid
from contrastboundary_tpu.ops.sampling import morton_code
from contrastboundary_tpu.train import (
    TrainStepConfig,
    create_train_state,
    make_train_step,
)
from contrastboundary_tpu.train.state import make_optimizer
from contrastboundary_tpu.train.trainer import make_eval_step

B, N, NCLS = 2, 512, 5

NATURAL = PyramidSpec(
    strides=(1, 4, 4),
    k_self=(8, 8, 8),
    k_down=(8, 8, 8),
    k_contrast=(12, 8, 8),
    with_subscene=True,
    sampler="serialized",
    knn_recall=None,
)
# full-width windows → the tile path is EXACT (every tile sees the whole
# cloud), isolating the layout/matmul-gather machinery from windowing recall
SORTED = dataclasses.replace(
    NATURAL, layout="sorted", self_window=99, contrast_window=99
)


def _model():
    return PointTransformerSeg(
        num_classes=NCLS, planes=(16, 32, 64), blocks=(2, 2, 2)
    )


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "points": jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 4.0),
        "features": jnp.asarray(rng.rand(B, N, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(-1, NCLS, (B, N)).astype(np.int32)),
    }


def _state(model, batch, spec):
    pyr = build_pyramid(batch["points"], spec)
    feats = batch["features"]
    if pyr.order0 is not None:
        feats = jnp.take_along_axis(feats, pyr.order0[..., None], 1)
    variables = model.init(
        jax.random.PRNGKey(0), feats, pyr, train=True
    )
    tx = make_optimizer(0.05, momentum=0.9, weight_decay=1e-4)
    return create_train_state(variables, tx)


def test_sorted_pyramid_levels_are_morton_sorted():
    batch = _batch()
    pyr = build_pyramid(batch["points"], SORTED)
    assert pyr.order0 is not None
    assert all(m is not None for m in pyr.self_local)
    for l, pts in enumerate(pyr.points):
        codes = np.asarray(morton_code(pts))
        assert (np.diff(codes, axis=-1) >= 0).all(), f"level {l} not sorted"
    # sampled levels: strictly increasing row indices into the parent level
    for l in range(1, len(pyr.sample_idx)):
        s = np.asarray(pyr.sample_idx[l])
        assert (np.diff(s, axis=-1) > 0).all()


def test_sorted_train_step_matches_natural():
    model = _model()
    batch = _batch(1)
    cfg_n = TrainStepConfig(num_classes=NCLS, spec=NATURAL, contrast=ContrastConfig())
    cfg_s = TrainStepConfig(num_classes=NCLS, spec=SORTED, contrast=ContrastConfig())
    state = _state(model, batch, NATURAL)

    _, m_n = make_train_step(model, cfg_n)(state, batch)
    state2 = _state(model, batch, SORTED)  # fresh state (donated args)
    # same init params regardless of layout (init consumes shapes only)
    _, m_s = make_train_step(model, cfg_s)(state2, batch)

    for k in ("loss", "ce", "cbl"):
        np.testing.assert_allclose(
            float(m_n[k]), float(m_s[k]), rtol=2e-4, atol=1e-5
        )
    # argmax of near-uniform init logits is tie-fragile across the two
    # computation orders — compare only the (permutation-invariant) counts
    assert np.asarray(m_n["confusion"]).sum() == np.asarray(m_s["confusion"]).sum()


def test_sorted_eval_probs_match_natural_in_original_order():
    model = _model()
    batch = _batch(2)
    cfg_n = TrainStepConfig(num_classes=NCLS, spec=NATURAL)
    cfg_s = TrainStepConfig(num_classes=NCLS, spec=SORTED)
    state = _state(model, batch, NATURAL)

    probs_n, conf_n = make_eval_step(model, cfg_n)(state, batch)
    probs_s, conf_s = make_eval_step(model, cfg_s)(state, batch)
    # sorted-layout eval returns predictions in the CALLER's row order
    np.testing.assert_allclose(
        np.asarray(probs_n), np.asarray(probs_s), rtol=2e-4, atol=2e-5
    )
    assert np.asarray(conf_n).sum() == np.asarray(conf_s).sum()


def test_sorted_windowed_training_converges():
    """The production config (window=1, approx knn): losses stay finite and
    decrease over a few steps."""
    spec = dataclasses.replace(
        NATURAL, layout="sorted", self_window=1, contrast_window=1,
        knn_recall=0.95,
    )
    model = _model()
    cfg = TrainStepConfig(num_classes=NCLS, spec=spec, contrast=ContrastConfig())
    batch = _batch(3)
    state = _state(model, batch, spec)
    step = make_train_step(model, cfg)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_convnet_rejects_sorted_layout():
    from contrastboundary_tpu.models.convnet import ConvNetSeg

    spec = dataclasses.replace(SORTED, k_contrast=None, with_subscene=False)
    batch = _batch(4)
    pyr = build_pyramid(batch["points"], spec)
    model = ConvNetSeg(num_classes=NCLS)
    with pytest.raises(ValueError, match="layout"):
        model.init(
            jax.random.PRNGKey(0), batch["features"], pyr, train=True
        )
