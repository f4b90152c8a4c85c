import numpy as np
import jax
import jax.numpy as jnp
import pytest

from contrastboundary_tpu.config.base import CONFIGS, gen_configs, load_config
from contrastboundary_tpu.models import PointTransformerSeg
from contrastboundary_tpu.ops import PyramidSpec, build_pyramid


SPEC = PyramidSpec(
    strides=(1, 4), k_self=(8, 8), k_down=(8, 8), sampler="serialized",
)


def test_remat_same_outputs_and_grads(rng):
    pts = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
    feats = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
    pyr = build_pyramid(pts, SPEC)

    outs = {}
    grads = {}
    for sm in (False, True):
        model = PointTransformerSeg(
            num_classes=4, planes=(8, 16), blocks=(2, 2), share_planes=4,
            base_fdim=8, save_memory=sm,
        )
        variables = model.init(jax.random.PRNGKey(0), feats, pyr, train=False)
        outs[sm] = model.apply(variables, feats, pyr, train=False).logits

        def loss(p):
            o, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                feats, pyr, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(o.logits**2)

        grads[sm] = jax.grad(loss)(variables["params"])

    np.testing.assert_allclose(
        np.asarray(outs[False]), np.asarray(outs[True]), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(grads[False]),
        jax.tree_util.tree_leaves(grads[True]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_gen_configs():
    names = gen_configs(
        "test_sweep",
        base={"data": {"dataset": "synthetic", "num_rooms": 2}},
        axes={
            "arch_out": [
                "multi-Ua-concat-latent",
                "multi-Ua-concat-latent|contrast-Ua-softnn-latent-label-l2-w.1",
            ],
            "optim.base_lr": [0.1, 0.5],
        },
    )
    assert len(names) == 4
    cfg = load_config(names[1])
    assert cfg.optim.base_lr == 0.5
    assert cfg.data.num_rooms == 2
    cfg3 = load_config(names[2])
    assert cfg3.contrast is not None and cfg3.optim.base_lr == 0.1
    for n in names:
        del CONFIGS[n]
