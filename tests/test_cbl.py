import numpy as np
import jax
import jax.numpy as jnp

from contrastboundary_tpu.losses import (
    ContrastConfig,
    subscene_labels,
    cbl_stage_loss,
    cross_entropy,
)
from contrastboundary_tpu.ops import knn

from reference_impl import (
    subscene_label_np,
    cbl_softnn_np,
    cbl_nce_np,
    cbl_kl_posmask_np,
    knn_np,
)


def test_subscene_labels_match_numpy(rng):
    p0 = rng.rand(1, 64, 3).astype(np.float32)
    p1 = p0[:, ::4]
    labels = rng.randint(0, 5, (1, 64)).astype(np.int32)
    idx, _ = knn(jnp.asarray(p1), jnp.asarray(p0), 4)
    soft = np.asarray(
        subscene_labels(jnp.asarray(labels), idx, num_classes=5)
    )
    ref = subscene_label_np(p0[0], p1[0], labels[0], 4, 5)
    np.testing.assert_allclose(soft[0], ref, rtol=1e-5, atol=1e-6)


def test_subscene_level0_is_onehot(rng):
    labels = rng.randint(0, 5, (2, 16)).astype(np.int32)
    soft = np.asarray(subscene_labels(jnp.asarray(labels), None, num_classes=5))
    assert (soft.sum(-1) == 1).all()
    assert (soft.argmax(-1) == labels).all()


def test_subscene_ignore_label():
    labels = jnp.asarray([[0, -1, 2]])
    soft = np.asarray(subscene_labels(labels, None, num_classes=3, ignore_label=-1))
    assert (soft[0, 1] == 0).all()
    assert soft[0, 0, 0] == 1 and soft[0, 2, 2] == 1


def test_cbl_softnn_matches_numpy(rng):
    """Golden test of the full stage loss vs. the numpy re-derivation of
    pytorch/model/heads.py point_contrast (l2 + cnt + softnn)."""
    m, c, ncls, k = 48, 8, 4, 7
    feats = rng.randn(1, m, c).astype(np.float32)
    # spatially-clustered labels so pos/neg coexist
    pts = rng.rand(1, m, 3).astype(np.float32)
    labels = (pts[0, :, 0] * 2).astype(np.int64) % ncls
    label_soft = np.eye(ncls, dtype=np.float32)[labels][None]

    idx, _ = knn(jnp.asarray(pts), jnp.asarray(pts), k, exclude_self=True)
    cfg = ContrastConfig(contrast="softnn", dist="l2", pos="cnt", temperature=1.0, weight=0.1)
    loss = float(
        cbl_stage_loss(jnp.asarray(feats), idx, jnp.asarray(label_soft), cfg)
    )
    ref = cbl_softnn_np(feats[0], np.asarray(idx)[0], label_soft[0], temperature=1.0)
    np.testing.assert_allclose(loss, 0.1 * ref, rtol=1e-4)


def test_cbl_nce_matches_tf_default(rng):
    """nce golden: per-point SUM over positives with Σ_all denominator
    (tensorflow/models/heads/head.py:773-795) — round-1 review fix #3b."""
    m, c, ncls, k = 48, 8, 4, 7
    feats = rng.randn(1, m, c).astype(np.float32)
    pts = rng.rand(1, m, 3).astype(np.float32)
    labels = (pts[0, :, 0] * 2).astype(np.int64) % ncls
    label_soft = np.eye(ncls, dtype=np.float32)[labels][None]
    idx, _ = knn(jnp.asarray(pts), jnp.asarray(pts), k, exclude_self=True)
    cfg = ContrastConfig(contrast="nce", dist="l2", pos="cnt", temperature=1.0, weight=0.1)
    loss = float(
        cbl_stage_loss(jnp.asarray(feats), idx, jnp.asarray(label_soft), cfg)
    )
    ref = cbl_nce_np(feats[0], np.asarray(idx)[0], label_soft[0], temperature=1.0)
    np.testing.assert_allclose(loss, 0.1 * ref, rtol=1e-4)


def test_cbl_kl_point_mask_from_kl_posmask(rng):
    """The kl variant's point mask must come from the kl posmask itself
    (head.py:639-662 fed by :492-519) — round-1 review fix #3a. Construct a
    case where the cnt and kl point masks DIFFER and check the loss equals a
    numpy re-derivation using the kl-derived mask."""
    m, c, ncls, k = 40, 6, 3, 7
    feats = rng.randn(1, m, c).astype(np.float32)
    pts = rng.rand(1, m, 3).astype(np.float32)
    # fully-soft random label distributions (as real sub-scene labels are):
    # argmax equality and KL<thr then disagree on some pairs
    logits = rng.randn(m, ncls).astype(np.float32) * 1.5
    e = np.exp(logits - logits.max(-1, keepdims=True))
    label_soft = (e / e.sum(-1, keepdims=True))[None].astype(np.float32)
    idx_j, _ = knn(jnp.asarray(pts), jnp.asarray(pts), k, exclude_self=True)
    idx = np.asarray(idx_j)[0]
    threshold = 0.5

    nb_label = label_soft[0][idx]
    posmask, point_mask = cbl_kl_posmask_np(label_soft[0], nb_label, threshold)
    # the cnt-derived mask must differ for this construction to test anything
    cnt_pos = label_soft[0].argmax(-1)[:, None] == nb_label.argmax(-1)
    cnt_point = cnt_pos.any(-1) & (~cnt_pos).any(-1)
    assert (point_mask != cnt_point).any(), "construction failed: masks equal"

    # numpy loss with the kl posmask + kl-derived point mask (softnn, l2)
    eps = 1e-12
    f = feats[0][point_mask]
    nf = feats[0][idx][point_mask]
    pm = posmask[point_mask]
    dist = np.sqrt(((f[:, None, :] - nf) ** 2).sum(-1) + eps)
    d = -dist
    d = d - d.max(-1, keepdims=True)
    e = np.exp(d)
    ref = (-np.log((e * pm).sum(-1) / e.sum(-1) + eps)).mean()

    cfg = ContrastConfig(
        contrast="softnn", dist="l2", pos="kl", kl_threshold=threshold,
        temperature=1.0, weight=1.0,
    )
    loss = float(
        cbl_stage_loss(jnp.asarray(feats), idx_j, jnp.asarray(label_soft), cfg)
    )
    np.testing.assert_allclose(loss, ref, rtol=1e-4)


def test_cbl_no_boundary_returns_zero(rng):
    """All same label → no point has a negative → loss 0 (reference returns
    tensor(0.) — pytorch/model/heads.py:222-233)."""
    feats = rng.randn(1, 32, 8).astype(np.float32)
    pts = rng.rand(1, 32, 3).astype(np.float32)
    label_soft = np.zeros((1, 32, 4), np.float32)
    label_soft[..., 2] = 1
    idx, _ = knn(jnp.asarray(pts), jnp.asarray(pts), 5, exclude_self=True)
    cfg = ContrastConfig()
    loss = float(cbl_stage_loss(jnp.asarray(feats), idx, jnp.asarray(label_soft), cfg))
    assert loss == 0.0


def test_cbl_gradient_direction(rng):
    """CBL must pull same-label features together: a gradient step should
    reduce the loss."""
    m, c = 40, 6
    pts = rng.rand(1, m, 3).astype(np.float32)
    labels = (pts[0, :, 0] > 0.5).astype(np.int64)
    label_soft = jnp.asarray(np.eye(3, dtype=np.float32)[labels][None])
    idx, _ = knn(jnp.asarray(pts), jnp.asarray(pts), 9, exclude_self=True)
    cfg = ContrastConfig(weight=1.0)
    feats = jnp.asarray(rng.randn(1, m, c).astype(np.float32))

    def f(x):
        return cbl_stage_loss(x, idx, label_soft, cfg)

    l0 = float(f(feats))
    g = jax.grad(f)(feats)
    l1 = float(f(feats - 0.5 * g))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0


def test_cbl_variants_finite(rng):
    pts = rng.rand(1, 32, 3).astype(np.float32)
    labels = (pts[0, :, 0] > 0.5).astype(np.int64)
    label_soft = jnp.asarray(np.eye(3, dtype=np.float32)[labels][None])
    idx, _ = knn(jnp.asarray(pts), jnp.asarray(pts), 7, exclude_self=True)
    feats = jnp.asarray(rng.randn(1, 32, 6).astype(np.float32))
    for contrast in ["softnn", "nce"]:
        for dist in ["l2", "l2square", "norml2", "kl"]:
            for pos in ["cnt", "kl"]:
                cfg = ContrastConfig(contrast=contrast, dist=dist, pos=pos)
                val = float(cbl_stage_loss(feats, idx, label_soft, cfg))
                assert np.isfinite(val), (contrast, dist, pos)
                g = jax.grad(
                    lambda x: cbl_stage_loss(x, idx, label_soft, cfg)
                )(feats)
                assert np.isfinite(np.asarray(g)).all(), (contrast, dist, pos)


def test_cbl_shadow_neighbors_excluded(rng):
    """Invalid (shadow) neighbor slots must not contribute to pos or neg."""
    m, c = 16, 4
    feats = jnp.asarray(rng.randn(1, m, c).astype(np.float32))
    labels = rng.randint(0, 2, m)
    label_soft = jnp.asarray(np.eye(3, dtype=np.float32)[labels][None])
    idx_np = rng.randint(0, m, (1, m, 6))
    idx_full = jnp.asarray(idx_np)
    # same neighbors + 2 shadow columns: loss must equal the 6-col version
    idx_shadow = jnp.concatenate(
        [idx_full, jnp.full((1, m, 2), m, jnp.int32)], axis=-1
    )
    cfg = ContrastConfig()
    l_full = float(cbl_stage_loss(feats, idx_full, label_soft, cfg))
    l_shadow = float(cbl_stage_loss(feats, idx_shadow, label_soft, cfg))
    np.testing.assert_allclose(l_full, l_shadow, rtol=1e-5)


def test_cross_entropy_ignore(rng):
    logits = jnp.asarray(rng.randn(2, 8, 4).astype(np.float32))
    labels = rng.randint(0, 4, (2, 8)).astype(np.int32)
    labels[0, :4] = -1
    ce = float(cross_entropy(logits, jnp.asarray(labels), ignore_label=-1))
    # manual
    lp = np.asarray(jax.nn.log_softmax(logits))
    vals = []
    for b in range(2):
        for i in range(8):
            if labels[b, i] >= 0:
                vals.append(-lp[b, i, labels[b, i]])
    np.testing.assert_allclose(ce, np.mean(vals), rtol=1e-5)


def test_cbl_ignore_label_center_excluded(rng):
    """Ignore-labeled centers (all-zero soft labels) must not contribute:
    flipping an ignored point's features must not change the loss."""
    m, c = 32, 6
    pts = rng.rand(1, m, 3).astype(np.float32)
    labels = (pts[0, :, 0] > 0.5).astype(np.int64)
    labels[:5] = -1  # ignored
    soft = subscene_labels(jnp.asarray(labels[None]), None, num_classes=3)
    assert float(jnp.sum(soft[0, :5])) == 0.0
    idx, _ = knn(jnp.asarray(pts), jnp.asarray(pts), 9, exclude_self=True)
    cfg = ContrastConfig(weight=1.0)
    feats = rng.randn(1, m, c).astype(np.float32)
    l1 = float(cbl_stage_loss(jnp.asarray(feats), idx, soft, cfg))
    feats2 = feats.copy()
    feats2[0, 0] += 100.0  # ignored center: a valid neighbor may still gather
    # it, but as a neighbor it's excluded from pos AND denominator too
    l2 = float(cbl_stage_loss(jnp.asarray(feats2), idx, soft, cfg))
    np.testing.assert_allclose(l1, l2, rtol=1e-5)


def test_subscene_label_infer_variants(rng):
    p0 = rng.rand(1, 64, 3).astype(np.float32)
    p1 = p0[:, ::4]
    labels = rng.randint(0, 5, (1, 64)).astype(np.int32)
    idx, _ = knn(jnp.asarray(p1), jnp.asarray(p0), 4)

    soft = np.asarray(subscene_labels(jnp.asarray(labels), idx, 5, infer="soft"))
    nst = np.asarray(subscene_labels(jnp.asarray(labels), idx, 5, infer="nst"))
    hard = np.asarray(subscene_labels(jnp.asarray(labels), idx, 5, infer="max"))

    # nst = one-hot of the nearest level-0 label
    np.testing.assert_array_equal(
        nst[0].argmax(-1), labels[0][np.asarray(idx)[0, :, 0]]
    )
    assert ((nst == 0) | (nst == 1)).all()
    # max = argmax of soft, hard one-hot
    np.testing.assert_array_equal(hard[0].argmax(-1), soft[0].argmax(-1))
    assert ((hard == 0) | (hard == 1)).all()
    # soft sums to 1 (all labels valid here)
    np.testing.assert_allclose(soft.sum(-1), 1.0, rtol=1e-5)

    from contrastboundary_tpu.config.dsl import parse_contrast_ops

    c = parse_contrast_ops("contrast-Ua-softnn-latent-label-nst-l2-w.1")
    assert c.label_infer == "nst"


def test_cbl_nn_rand_samplers(rng):
    """nn<k> forces nearest neighbors positive; rand<k> adds random
    negatives (TF sample_labels, head.py:561-601)."""
    m, c = 40, 6
    pts = rng.rand(1, m, 3).astype(np.float32)
    labels = (pts[0, :, 0] > 0.5).astype(np.int64)
    soft = jnp.asarray(np.eye(3, dtype=np.float32)[labels][None])
    idx, _ = knn(jnp.asarray(pts), jnp.asarray(pts), 9, exclude_self=True)
    feats = jnp.asarray(rng.randn(1, m, c).astype(np.float32))

    cfg = ContrastConfig(weight=1.0, extra_pos_nn=3, extra_neg_rand=5)
    key = jax.random.PRNGKey(0)
    l1 = float(cbl_stage_loss(feats, idx, soft, cfg, key=key))
    assert np.isfinite(l1)
    # deterministic in key, different across keys
    l1b = float(cbl_stage_loss(feats, idx, soft, cfg, key=key))
    l2 = float(cbl_stage_loss(feats, idx, soft, cfg, key=jax.random.PRNGKey(1)))
    assert l1 == l1b and l1 != l2
    # differs from the plain label-only loss
    l0 = float(cbl_stage_loss(feats, idx, soft, ContrastConfig(weight=1.0)))
    assert l1 != l0
    # rand-only requires a key
    import pytest as _pytest
    with _pytest.raises(ValueError, match="PRNG key"):
        cbl_stage_loss(feats, idx, soft, cfg)

    from contrastboundary_tpu.config.dsl import parse_contrast_ops
    c2 = parse_contrast_ops("contrast-Ua-softnn-latent-label-nn4-rand8-l2-w.1")
    assert c2.extra_pos_nn == 4 and c2.extra_neg_rand == 8


def test_cbl_recur_label_inference(rng):
    from contrastboundary_tpu.losses import cbl_loss
    from contrastboundary_tpu.ops import PyramidSpec, build_pyramid

    spec = PyramidSpec(
        strides=(1, 4, 4), k_self=(8, 8, 8), k_down=(8, 8, 8),
        k_contrast=(8, 8, 8), with_subscene=True, sampler="fps",
    )
    pts = rng.rand(1, 64, 3).astype(np.float32)
    labels = jnp.asarray((pts[..., 0] > 0.5).astype(np.int32))
    pyr = build_pyramid(jnp.asarray(pts), spec)
    latents = tuple(
        jnp.asarray(rng.randn(1, n, 6).astype(np.float32))
        for n in (64, 16, 4)
    )
    for infer in ("soft", "recur"):
        cfg = ContrastConfig(stages=(0, 1, 2), label_infer=infer)
        total, per = cbl_loss(latents, pyr, labels, 3, cfg)
        assert np.isfinite(float(total)), infer
        assert len(per) == 3
    # the recur label DISTRIBUTION differs from the direct-to-U0 soft labels
    # at deeper stages (loss can still coincide when argmaxes agree)
    from contrastboundary_tpu.core.gather import shadow_gather
    import jax.numpy as _jnp

    direct = subscene_labels(labels, pyr.subscene_idx[2], 3)
    lv = subscene_labels(labels, None, 3)
    for l in (1, 2):
        nb, _ = shadow_gather(lv, pyr.down_idx[l], fill=0.0)
        lv = _jnp.mean(nb, axis=-2)
    assert not np.allclose(np.asarray(direct), np.asarray(lv))
    # but both must agree on the dominant class for clean labels
    assert (np.asarray(direct).argmax(-1) == np.asarray(lv).argmax(-1)).mean() > 0.9


def _margin_setup(rng, m=48, c=8, ncls=4, k=7):
    from reference_impl import cbl_aug_np

    feats = rng.randn(1, m, c).astype(np.float32)
    pts = rng.rand(1, m, 3).astype(np.float32)
    labels = (pts[0, :, 0] * 2).astype(np.int64) % ncls
    label_soft = np.eye(ncls, dtype=np.float32)[labels][None]
    idx, _ = knn(jnp.asarray(pts), jnp.asarray(pts), k, exclude_self=True)
    return feats, label_soft, idx, cbl_aug_np


def test_cbl_separate_pos_softnn_golden(rng):
    """'S' margin: softnn contrasts pos/Σneg (head.py:763-766)."""
    feats, label_soft, idx, ref_fn = _margin_setup(rng)
    cfg = ContrastConfig(
        contrast="softnn", separate_pos=True, margin="S", weight=0.1,
    )
    loss = float(
        cbl_stage_loss(jnp.asarray(feats), idx, jnp.asarray(label_soft), cfg)
    )
    ref = ref_fn(
        feats[0], np.asarray(idx)[0], label_soft[0],
        contrast="softnn", temperature=1.0, separate_pos=True,
    )
    np.testing.assert_allclose(loss, 0.1 * ref, rtol=1e-4)
    # and it differs from the default pos/(pos+neg) form
    base = float(
        cbl_stage_loss(
            jnp.asarray(feats), idx, jnp.asarray(label_soft),
            ContrastConfig(contrast="softnn", weight=0.1),
        )
    )
    assert abs(loss - base) > 1e-6


def test_cbl_separate_pos_nce_golden(rng):
    """'S' margin: nce per-sample denominator exp_k + Σneg (head.py:784-788)."""
    feats, label_soft, idx, ref_fn = _margin_setup(rng)
    cfg = ContrastConfig(
        contrast="nce", separate_pos=True, margin="S", weight=0.1,
    )
    loss = float(
        cbl_stage_loss(jnp.asarray(feats), idx, jnp.asarray(label_soft), cfg)
    )
    ref = ref_fn(
        feats[0], np.asarray(idx)[0], label_soft[0],
        contrast="nce", temperature=1.0, separate_pos=True,
    )
    np.testing.assert_allclose(loss, 0.1 * ref, rtol=1e-4)


def test_cbl_mask_mode_nce_golden(rng):
    """'mask' token: nce flat mean over every positive term (head.py:796-798)."""
    feats, label_soft, idx, ref_fn = _margin_setup(rng)
    cfg = ContrastConfig(contrast="nce", mask_mode=True, weight=0.1)
    loss = float(
        cbl_stage_loss(jnp.asarray(feats), idx, jnp.asarray(label_soft), cfg)
    )
    ref = ref_fn(
        feats[0], np.asarray(idx)[0], label_soft[0],
        contrast="nce", temperature=1.0, mask_mode=True,
    )
    np.testing.assert_allclose(loss, 0.1 * ref, rtol=1e-4)


def test_cbl_power_golden(rng):
    """'p<x>' power post-op on the per-point loss (head.py:800-803)."""
    feats, label_soft, idx, ref_fn = _margin_setup(rng)
    for contrast in ("softnn", "nce"):
        cfg = ContrastConfig(contrast=contrast, power=2.0, weight=0.1)
        loss = float(
            cbl_stage_loss(jnp.asarray(feats), idx, jnp.asarray(label_soft), cfg)
        )
        ref = ref_fn(
            feats[0], np.asarray(idx)[0], label_soft[0],
            contrast=contrast, temperature=1.0, power=2.0,
        )
        np.testing.assert_allclose(loss, 0.1 * ref, rtol=1e-4, err_msg=contrast)


def test_cbl_softnn_mask_raises(rng):
    """The reference asserts softnn+mask out (head.py:756)."""
    import pytest

    feats, label_soft, idx, _ = _margin_setup(rng)
    cfg = ContrastConfig(contrast="softnn", mask_mode=True)
    with pytest.raises(ValueError):
        cbl_stage_loss(jnp.asarray(feats), idx, jnp.asarray(label_soft), cfg)


def test_cbl_recurhard_golden(rng):
    """'recurhard' re-hardens the label at every recursion hop — a numpy
    re-derivation of TF get_scene_label_recursive at reduction='max'
    (tensorflow/models/heads/head.py:51-81, 117-131, dispatch :524-527):
    gather previous-stage one-hots over the pooling neighborhood, SUM,
    argmax, re-one-hot. Deviation kept deliberately: all-ignored rows stay
    all-zero (the reference argmaxes them to class 0); on inputs with no
    ignored labels the two derivations coincide, which is what this golden
    test pins. The per-stage loss must equal cbl_stage_loss fed the numpy
    hard labels."""
    import pytest

    from contrastboundary_tpu.losses import cbl_loss
    from contrastboundary_tpu.ops import PyramidSpec, build_pyramid

    spec = PyramidSpec(
        strides=(1, 4, 4), k_self=(8, 8, 8), k_down=(8, 8, 8),
        k_contrast=(8, 8, 8), with_subscene=True, sampler="fps",
    )
    pts = rng.rand(1, 64, 3).astype(np.float32)
    labels = (pts[..., 0] > 0.5).astype(np.int32) + (
        pts[..., 1] > 0.5
    ).astype(np.int32)  # 3 classes, no ignores
    pyr = build_pyramid(jnp.asarray(pts), spec)
    latents = tuple(
        jnp.asarray(rng.randn(1, n, 6).astype(np.float32))
        for n in (64, 16, 4)
    )

    # numpy re-derivation (reduction='max' per hop)
    ncls = 3
    lv = np.eye(ncls, dtype=np.float32)[labels[0]]  # [N, ncls]
    hard_per_stage = [lv]
    for l in (1, 2):
        idx = np.asarray(pyr.down_idx[l][0])  # [M, k], shadow == N_prev
        n_prev = lv.shape[0]
        padded = np.concatenate([lv, np.zeros((1, ncls), np.float32)], 0)
        s = padded[np.clip(idx, 0, n_prev)].sum(axis=1)  # [M, ncls]
        hard = np.eye(ncls, dtype=np.float32)[s.argmax(-1)]
        hard *= (s.sum(-1, keepdims=True) > 0)
        hard_per_stage.append(hard)
        lv = hard

    cfg = ContrastConfig(stages=(0, 1, 2), label_infer="recurhard")
    total, per = cbl_loss(latents, pyr, jnp.asarray(labels), ncls, cfg)
    assert np.isfinite(float(total))
    base = ContrastConfig(stages=(0, 1, 2))
    for i in (1, 2):
        want = float(
            cbl_stage_loss(
                latents[i], pyr.contrast_idx[i],
                jnp.asarray(hard_per_stage[i][None]), base,
            )
        )
        assert float(per[f"cbl_stage{i}"]) == pytest.approx(want, rel=1e-5), i
    # recurhard differs from soft recur at depth (hardening loses mass)
    cfg_soft = ContrastConfig(stages=(0, 1, 2), label_infer="recur")
    _, per_soft = cbl_loss(latents, pyr, jnp.asarray(labels), ncls, cfg_soft)
    assert float(per["cbl_stage2"]) != float(per_soft["cbl_stage2"])

    # DSL: published spellings select the recursion variants
    from contrastboundary_tpu.config.dsl import parse_contrast_ops

    for tok, want_infer in [
        ("label_recur", "recur"), ("label_recurhard", "recurhard"),
        ("recur", "recur"), ("recurhard", "recurhard"),
        ("label_nst", "nst"),
    ]:
        c = parse_contrast_ops(f"contrast-Ua-softnn-latent-{tok}-l2-w.1")
        assert c.label_infer == want_infer, tok
