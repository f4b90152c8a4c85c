"""Contrastive Boundary Learning (CBL) — the core loss, fixed-shape.

Reproduces pytorch/model/heads.py:63-253 `ContrastHead` and
tensorflow/models/heads/head.py:462-807 `contrast_head` without any dynamic
row compaction: the reference's `boolean_mask` point selection
(head.py:705-715 / heads.py:235-237) becomes a multiplicative `point_mask`
with a masked mean — numerically identical, XLA-friendly.

Pipeline per decoder stage i (SURVEY.md §2.4):
  1. soft sub-scene labels: mean one-hot of the kr = ∏stride nearest level-0
     points (pytorch/model/basic_operators.py:9-50);
  2. pos/neg masks over k−1 self-neighbors (self excluded), `cnt` argmax
     equality or `kl` divergence threshold;
  3. point mask: ≥1 valid positive AND ≥1 valid negative;
  4. distance: l2 (eps-guarded sqrt), norml2, l2square, or kl;
  5. softnn  −log(Σ_pos e^{−d/T} / Σ_all e^{−d/T})  or per-positive nce,
     with max-subtraction stabilization; mean over masked points × weight.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.gather import batch_gather, shadow_gather
from ..core.masking import EPS, INF, masked_mean

_LOG_EPS = 1e-12

# (shape key) -> bool: eager probe-compile results for the fused v2 kernel
# (the remote Mosaic helper 500s intermittently; see ops/pallas/cbl_tile2.py)
_CBL_PALLAS_PROBED: dict = {}


def _cbl_pallas_ok(tile, width, window, k, c, ncls, temperature, dtype,
                   strict: bool) -> bool:
    import warnings

    if jax.default_backend() not in ("tpu", "axon"):
        return False
    key = (tile, width, window, k, c, ncls, jnp.dtype(dtype).name)
    if key in _CBL_PALLAS_PROBED:
        return _CBL_PALLAS_PROBED[key]

    from ..ops.pallas.cbl_tile2 import cbl_tile_softnn2

    def attempt():
        g = max(width, 2)
        m = g * tile
        f = jnp.zeros((1, m, c), dtype)
        ls = jnp.zeros((1, m, ncls), jnp.float32)
        li = jnp.zeros((1, m, k), jnp.int32)
        out = cbl_tile_softnn2(f, ls, li, temperature, tile, width, window)
        jax.block_until_ready(out)
        gr = jax.grad(
            lambda ff: jnp.sum(
                cbl_tile_softnn2(ff, ls, li, temperature, tile, width,
                                 window)[0]
            )
        )(f)
        jax.block_until_ready(gr)

    ok, err = False, None
    # single attempt (no flakiness retry): a rejected compile at the
    # flagship K=35 shape takes the remote helper ~25 min to refuse
    try:
        attempt()
        ok = True
    except Exception as e:
        err = e
    if not ok:
        if strict:
            raise RuntimeError(
                f"ContrastConfig(impl='pallas') but the fused CBL kernel "
                f"failed to compile for shape {key}: {err}"
            )
        warnings.warn(
            f"fused CBL kernel unavailable for shape {key} "
            f"({type(err).__name__}); using the XLA tile path"
        )
    _CBL_PALLAS_PROBED[key] = ok
    return ok


@dataclasses.dataclass(frozen=True)
class ContrastConfig:
    """Static CBL configuration (the reference's op-string segment
    `contrast-Ua-softnn-latent-label-l2-w.1`)."""

    contrast: str = "softnn"  # softnn | nce
    dist: str = "l2"  # l2 | l2square | norml2 | kl
    pos: str = "cnt"  # cnt | kl
    temperature: Optional[float] = 1.0
    weight: float = 0.1
    kl_threshold: float = 0.5  # posmask kl variant (config `labelkl.5`)
    stages: Tuple[int, ...] = (0, 1, 2, 3, 4)  # 'Ua' = all up stages
    project: str = ""  # per-stage projection MLP: '' | linear | mlp | mlp2
    # which per-stage features the contrast runs on (reference head_cfg.ftype,
    # resolved by get_branch_head, tensorflow/models/heads/head.py:247-287):
    # latent (flagship) | logits | probs | f_out
    ftype: str = "latent"
    # sub-scene label inference: 'soft' mean one-hot over kr (default),
    # 'nst' nearest-1 one-hot (TF head.py:83-91), 'max' argmax of the mean
    # distribution (TF head.py:127-128, hard labels), 'recur' stage-to-stage
    # soft recursion, 'recurhard' recursion re-hardened per hop (TF
    # head.py:51-81 + :524-527; DSL tokens 'label_recur'/'label_recurhard')
    label_infer: str = "soft"
    # extra sample sets concatenated to the label-based neighbors
    # (TF sample_labels, head.py:561-601): nn<k> forces the k spatially
    # nearest neighbors positive; rand<k> adds k uniform-random points as
    # negatives (DSL tokens `nn4` / `rand8`)
    extra_pos_nn: int = 0
    extra_neg_rand: int = 0
    # margin token value (DSL `m<x>`, reference config/head.py:161-162, e.g.
    # '.1', 'I', 'S', 'T2'). In the reference loss (head.py:729-803) only two
    # sub-flags are numerically active: 'T<f>' (temperature, parsed into
    # `temperature`) and 'S' (parsed into `separate_pos`); numeric margins
    # like 'm.1'/'mI' are stored but inert unless a bare `mask` token
    # borrows them as its truthy flag — reproduced faithfully here.
    margin: str = ""
    # 'S' in margin: softnn contrasts pos/Σneg instead of pos/(pos+neg);
    # nce uses a per-sample denominator exp_k + Σ neg exps (head.py:763-766,
    # 784-788)
    separate_pos: bool = False
    # 'mask' token (head.py:730-732, 796-798): nce reduces by a flat mean
    # over every positive term instead of per-point sums. softnn + mask is
    # asserted out by the reference (head.py:756).
    mask_mode: bool = False
    # 'p<x>' power post-op on the per-point/per-term loss (head.py:800-803)
    power: float = 1.0
    # fused per-tile Pallas kernel for the flagship option point
    # (softnn · l2/norml2 · cnt, tile-local indices); other option
    # combinations always use the XLA path.
    # 'auto' probe-compiles the v2 kernel (ops/pallas/cbl_tile2.py) once per
    # shape on TPU and falls back to XLA if the deployment's remote Mosaic
    # rejects it; 'pallas' raises instead of falling back; 'xla' forces the
    # XLA tile path.
    impl: str = "xla"  # xla | auto | pallas


def subscene_labels(
    labels0: jax.Array,
    subscene_idx: Optional[jax.Array],
    num_classes: int,
    ignore_label: int = -1,
    infer: str = "soft",
) -> jax.Array:
    """Labels of downsampled points, inferred from level-0 neighbors.

    labels0 [B, N0] int; subscene_idx [B, M, kr] indices into level 0 (None →
    level 0 itself: plain one-hot). Ignored labels contribute a zero row.

    infer: 'soft' = mean one-hot distribution (the flagship,
    pytorch/model/basic_operators.py:43); 'nst' = nearest-1 one-hot
    (tensorflow/models/heads/head.py:83-91); 'max' = argmax of the mean
    (head.py:127-128) — hard one-hot unless all neighbors ignored.
    """
    valid = labels0 != ignore_label
    safe = jnp.where(valid, labels0, 0)
    onehot = jax.nn.one_hot(safe, num_classes, dtype=jnp.float32)
    onehot = onehot * valid[..., None]
    if subscene_idx is None:
        return onehot
    if infer == "nst":
        return batch_gather(onehot, subscene_idx[..., 0])
    nb = batch_gather(onehot, subscene_idx)  # [B, M, kr, ncls]
    soft = jnp.mean(nb, axis=-2)
    if infer == "max":
        any_valid = jnp.sum(soft, axis=-1, keepdims=True) > 0
        hard = jax.nn.one_hot(
            jnp.argmax(soft, -1), num_classes, dtype=jnp.float32
        )
        return hard * any_valid
    return soft


def _posmask_cnt(label_soft, nb_label_soft):
    """Argmax-equality positives (pytorch/model/heads.py:145-149)."""
    center = jnp.argmax(label_soft, axis=-1)[..., None]
    nb = jnp.argmax(nb_label_soft, axis=-1)
    return center == nb


def _posmask_kl(label_soft, nb_label_soft, threshold):
    """KL(label ‖ neighbor) < threshold positives — the `kl` CBL variant
    (tensorflow/models/heads/head.py:492-519, config head `labelkl.5`)."""
    l = jnp.maximum(label_soft[..., None, :], _LOG_EPS)
    nl = jnp.maximum(nb_label_soft, _LOG_EPS)
    kl = jnp.sum(label_soft[..., None, :] * (jnp.log(l) - jnp.log(nl)), axis=-1)
    return kl < threshold


def _dist(cfg: ContrastConfig, f, nb_f, pre_normalized: bool = False):
    """Distance [B, M, K] between each point and its neighbors.
    l2 matches pytorch/model/heads.py:116-119 (eps inside sqrt)."""
    if cfg.dist in ("l2", "norml2", "l2square"):
        if cfg.dist == "norml2" and not pre_normalized:
            f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), EPS)
            nb_f = nb_f / jnp.maximum(
                jnp.linalg.norm(nb_f, axis=-1, keepdims=True), EPS
            )
        d2 = jnp.sum((f[..., None, :] - nb_f) ** 2, axis=-1)
        if cfg.dist == "l2square":
            return d2
        return jnp.sqrt(d2 + _LOG_EPS)
    if cfg.dist == "kl":
        # KL(center-dist ‖ neighbor-dist), both log-softmax'd
        lp = jax.nn.log_softmax(f, axis=-1)[..., None, :]
        lq = jax.nn.log_softmax(nb_f, axis=-1)
        return jnp.sum(jnp.exp(lp) * (lp - lq), axis=-1)
    raise ValueError(f"unknown dist {cfg.dist!r}")


def _contrast_softnn(cfg, dist, posmask, valid):
    """−log(Σ_pos e^{−d/T} / Σ_all e^{−d/T}) per point
    (pytorch/model/heads.py:151-165). With cfg.separate_pos ('S' margin,
    tensorflow/models/heads/head.py:763-766) the denominator is the
    NEGATIVES-only sum: −log(Σ_pos / Σ_neg)."""
    vb = valid > 0
    d = -dist
    d = d - jax.lax.stop_gradient(
        jnp.max(jnp.where(vb, d, -INF), axis=-1, keepdims=True)
    )
    if cfg.temperature is not None:
        d = d / cfg.temperature
    # rows with NO valid samples keep the −INF reference → d−ref = +INF and
    # exp(+INF)·0 = NaN would poison the masked mean (0·NaN); pin invalid
    # slots to a finite exponent instead (they are excluded downstream)
    d = jnp.where(vb, d, -50.0)
    e = jnp.exp(d) * valid
    pos = jnp.sum(e * posmask, axis=-1)
    if cfg.separate_pos:
        under = jnp.sum(e * (valid - posmask), axis=-1)
    else:
        under = jnp.sum(e, axis=-1)
    return -jnp.log(pos / jnp.maximum(under, EPS) + EPS)


def _nce_terms(cfg, dist, posmask, valid):
    """Per-sample InfoNCE terms [B, M, K] and the positive-term mask.

    Default denominator is Σ over all valid pos+neg samples
    (tensorflow/models/heads/head.py:789-791); with cfg.separate_pos ('S')
    it is per-sample: exp_k + Σ neg exps (head.py:784-788).
    """
    vb = valid > 0
    d = -dist
    d = d - jax.lax.stop_gradient(
        jnp.max(jnp.where(vb, d, -INF), axis=-1, keepdims=True)
    )
    if cfg.temperature is not None:
        d = d / cfg.temperature
    d = jnp.where(vb, d, -50.0)  # see _contrast_softnn: no-valid-row NaN guard
    e = jnp.exp(d) * valid
    if cfg.separate_pos:
        under = e + jnp.sum(e * (valid - posmask), axis=-1, keepdims=True)
    else:
        under = jnp.sum(e, axis=-1, keepdims=True)  # all valid samples
    ratio = e / jnp.maximum(under, EPS)
    per_pos = -jnp.log(ratio + EPS)
    return per_pos, posmask * valid


def _contrast_nce(cfg, dist, posmask, valid):
    """Per-positive InfoNCE, SUMMED over the positives of each point —
    the TF default (no mask/margin token): denominator is Σ over all valid
    pos+neg samples and the per-point reduction is a sum
    (tensorflow/models/heads/head.py:782-795:
    `under = reduce_sum(exps·(pos|neg))`, `-reduce_sum(log(...)·pos_mask)`).
    The pytorch stack's variant (heads.py:167-183, per-pos+neg denominator,
    flat mean) is NOT the published semantics of `nce` op-strings.
    """
    per_pos, pmask = _nce_terms(cfg, dist, posmask, valid)
    return jnp.sum(per_pos * pmask, axis=-1)


def cbl_stage_loss(
    features: jax.Array,
    contrast_idx: jax.Array,
    label_soft: jax.Array,
    cfg: ContrastConfig,
    key: Optional[jax.Array] = None,
    local: Optional[Tuple[int, int]] = None,
) -> jax.Array:
    """CBL loss for one stage.

    features:     [B, M, C] stage features (latent).
    contrast_idx: [B, M, K] self-KNN excluding self; shadow index M = invalid.
                  With `local` = (tile, width): indices are WINDOW-RELATIVE in
                  Morton-sorted space (ops/knn.py::tile_self_knn; shadow =
                  width·tile) and features/label_soft must already be sorted —
                  the neighbor gather then runs as per-tile MXU matmuls
                  (ops/tile_gather.py) instead of row gathers.
    label_soft:   [B, M, ncls] sub-scene soft labels.
    key:          PRNG key, required when cfg.extra_neg_rand > 0.

    Returns the scalar stage loss (already × cfg.weight).
    """
    b, m, _ = features.shape
    shadow = local[0] * local[1] if local else m
    # sample sets: [main | nn-prefix] share the index space of contrast_idx;
    # rand negatives are global rows, gathered separately in tile mode
    idx_parts = [contrast_idx]
    fp_parts = [jnp.full(contrast_idx.shape, jnp.nan)]
    if cfg.extra_pos_nn:
        nn_idx = contrast_idx[..., : cfg.extra_pos_nn]
        idx_parts.append(nn_idx)
        fp_parts.append(jnp.ones(nn_idx.shape))
    rand_idx = None
    if cfg.extra_neg_rand:
        if key is None:
            raise ValueError("rand<k> negatives need a PRNG key")
        rand_idx = jax.random.randint(
            key, (b, m, cfg.extra_neg_rand), 0, m, dtype=contrast_idx.dtype
        )
        fp_parts.append(jnp.zeros(rand_idx.shape))

    if cfg.dist == "norml2":
        features = features / jnp.maximum(
            jnp.linalg.norm(features, axis=-1, keepdims=True), EPS
        )
    # one fused gather (row-bound on TPU): [labels | features]. When the
    # model runs in bfloat16, gather in bf16 too: the tile-mode one-hot
    # matmul (ops/tile_gather.py) then takes its single-pass MXU path (3×
    # cheaper than the f32-exact bf16×3).
    #
    # For the `cnt` posmask only the per-neighbor label ARGMAX and validity
    # matter (argmax-equality, pytorch/model/heads.py:145-149), and
    # argmax(label[idx]) == argmax(label)[idx] — so gather a 2-channel
    # (argmax, any-valid) summary instead of the ncls-channel distribution:
    # fewer gather channels AND the [B, M, K, ncls] argmax disappears. This
    # is computed on the f32 labels BEFORE any bf16 cast (class ids ≤ 12 and
    # 0/1 flags are exact in bf16), so it is exact where the old bf16-rounded
    # distribution gather could flip near-ties. The `kl` posmask needs the
    # full distribution and keeps the wide gather.
    c = features.shape[-1]
    fuse_dtype = (
        jnp.bfloat16 if features.dtype == jnp.bfloat16 else label_soft.dtype
    )
    cnt_fast = cfg.pos == "cnt"
    if cnt_fast:
        center_arg = jnp.argmax(label_soft, axis=-1).astype(jnp.int32)
        lab_pack = jnp.stack(
            [
                center_arg.astype(jnp.float32),
                (jnp.sum(label_soft, axis=-1) > 0).astype(jnp.float32),
            ],
            axis=-1,
        )  # [B, M, 2]
    else:
        lab_pack = label_soft
    n_lab = lab_pack.shape[-1]
    fused = jnp.concatenate(
        [lab_pack.astype(fuse_dtype), features.astype(fuse_dtype)], -1
    )

    _flagship_options = (
        local is not None
        and cfg.contrast == "softnn"
        and cfg.dist in ("l2", "norml2")  # norml2 pre-normalized above
        and cfg.pos == "cnt"
        and not cfg.extra_pos_nn
        and not cfg.extra_neg_rand
        and cfg.temperature is not None
        and not cfg.separate_pos
        and not cfg.mask_mode
        and cfg.power == 1.0
    )
    if _flagship_options:
        # dense-window kernel v3 (ops/pallas/cbl_dense.py): one [T,C]@[C,W]
        # score matmul + full-lane [T,W] masked softnn — no per-k math at
        # all (PERF.md round 4). Env-gated (CBL_DENSE=auto|on|off) and
        # probe-compiled independently of cfg.impl, like the WIN_TOPK
        # kernels: distances come from the clamped matmul expansion (ulp-
        # level noise, documented), so exact-semantics runs set
        # CBL_DENSE=off.
        tile, width = local
        window = (width - 1) // 2
        from ..ops.pallas.cbl_dense import cbl_dense_loss, cbl_dense_ok

        if cbl_dense_ok(
            m // tile, tile, width, window, contrast_idx.shape[-1],
            features.shape[-1], float(cfg.temperature),
        ):
            import os

            interp = os.environ.get("CBL_DENSE") == "interpret"
            return cbl_dense_loss(
                features.astype(jnp.float32),
                label_soft.astype(jnp.float32), contrast_idx,
                float(cfg.temperature), tile, width, window,
                weight=cfg.weight, interpret=interp,
            )

    if _flagship_options and cfg.impl in ("auto", "pallas"):
        # k-chunked kernel v2 (ops/pallas/cbl_tile2.py) — kept for
        # toolchains whose Mosaic rejects the dense body; opt-in via
        # cfg.impl (measured negative at step level, PERF.md round 3).
        tile, width = local
        window = (width - 1) // 2
        k = contrast_idx.shape[-1]
        c = features.shape[-1]
        ncls = label_soft.shape[-1]
        # the kernel runs in f32 regardless of the model dtype: CBL loss
        # math is f32-pinned on every path, and this deployment's Mosaic
        # accepts the f32 kernel but 500s on the bf16 variant (probed on
        # device, round 3) — so bf16 models cast here, which also keys the
        # probe cache on one dtype.
        if _cbl_pallas_ok(
            tile, width, window, k, c, ncls, float(cfg.temperature),
            jnp.float32, strict=cfg.impl == "pallas",
        ):
            from ..ops.pallas.cbl_tile2 import cbl_tile_softnn2

            ls, ms = cbl_tile_softnn2(
                features.astype(jnp.float32),
                label_soft.astype(jnp.float32), contrast_idx,
                float(cfg.temperature), tile, width, window,
            )
            return (
                jnp.sum(ls) / jnp.maximum(jnp.sum(ms), 1.0) * cfg.weight
            )

    samp = (
        jnp.concatenate(idx_parts, axis=-1)
        if len(idx_parts) > 1
        else contrast_idx
    )
    valid = samp < shadow
    import os

    split_tile = local is not None and os.environ.get(
        "CBL_SPLIT_GATHER", "0"
    ) != "0"
    if split_tile:
        # tile mode, SPLIT label/feature gathers: the label gather carries
        # no gradient (labels are data), so the feature gather's transposed-
        # matmul backward runs on the bare C channels — the fused [lab|feat]
        # variant's backward pads the feature cotangent with zero label
        # lanes and re-lays out [B, M, K, C+n] (profile: ~3 ms of pad/
        # reshape/copy churn at L0). The one-hot compares are identical
        # expressions, CSE'd across the two matmul sets.
        from ..ops.tile_gather import tile_window_gather_auto

        nb_l = tile_window_gather_auto(
            lab_pack.astype(fuse_dtype), samp, local[0], local[1]
        )
        nb_f = tile_window_gather_auto(
            features.astype(fuse_dtype), samp, local[0], local[1]
        )
        if rand_idx is not None:
            nb_l = jnp.concatenate(
                [nb_l, batch_gather(lab_pack.astype(fuse_dtype), rand_idx)],
                axis=2,
            )
            nb_f = jnp.concatenate(
                [nb_f, batch_gather(features.astype(fuse_dtype), rand_idx)],
                axis=2,
            )
    elif local is not None:
        from ..ops.tile_gather import tile_window_gather_auto

        nb = tile_window_gather_auto(fused, samp, local[0], local[1])
    else:
        nb = batch_gather(fused, jnp.where(valid, samp, 0))
    if rand_idx is not None:
        if not split_tile:
            nb = jnp.concatenate([nb, batch_gather(fused, rand_idx)], axis=2)
        valid = jnp.concatenate(
            [valid, jnp.ones(rand_idx.shape, bool)], axis=-1
        )
    force_pos = (
        jnp.concatenate(fp_parts, axis=-1) if len(fp_parts) > 1 else None
    )
    # loss math stays f32 regardless of the gather dtype (the reference's
    # head computes in f32; only the gather matmul takes the bf16 fast path)
    if split_tile:
        nb_label = nb_l.astype(jnp.float32)
        nb_feat = nb_f.astype(jnp.float32)
    else:
        nb_label = nb[..., :n_lab].astype(jnp.float32)
        nb_feat = nb[..., n_lab:].astype(jnp.float32)
    features = features.astype(jnp.float32)
    label_soft = label_soft.astype(jnp.float32)

    # ignore-labeled points carry all-zero soft labels (subscene_labels):
    # exclude them as centers AND as neighbors (the reference's ignored-label
    # validity masks, tensorflow/models/heads/head.py:541-544)
    center_valid = jnp.sum(label_soft, axis=-1) > 0  # [B, M]

    forced = ~jnp.isnan(force_pos) if force_pos is not None else None
    if cnt_fast:
        valid = valid & (nb_label[..., 1] > 0.5)
        posmask = center_arg[..., None] == nb_label[..., 0].astype(jnp.int32)
    else:
        valid = valid & (jnp.sum(nb_label, axis=-1) > 0)
        posmask = _posmask_kl(label_soft, nb_label, cfg.kl_threshold)
    if forced is not None:
        posmask = jnp.where(forced, force_pos > 0.5, posmask)
    validf = valid.astype(jnp.float32)
    # point mask (≥1 valid pos AND ≥1 valid neg) derives from the FINAL
    # posmask: the reference's solve_samples_mask (head.py:639-662) consumes
    # the same posneg that collect_labels produced — the kl posmask for the
    # labelkl configs, not the cnt one.
    pos_cnt = jnp.sum(posmask * validf, axis=-1)
    valid_cnt = jnp.sum(validf, axis=-1)
    point_mask = (pos_cnt > 0) & (pos_cnt < valid_cnt) & center_valid
    posmask = posmask.astype(jnp.float32) * validf

    dist = _dist(cfg, features, nb_feat, pre_normalized=(cfg.dist == "norml2"))
    if cfg.contrast == "softnn":
        if cfg.mask_mode:
            # the reference asserts this combination out (head.py:756)
            raise ValueError("softnn does not support the 'mask' token")
        loss = _contrast_softnn(cfg, dist, posmask, validf)
    elif cfg.contrast == "nce":
        if cfg.mask_mode:
            # flat mean over every positive term (head.py:796-798: the
            # boolean_mask over pos_mask followed by reduce_mean) — each log
            # term is one contrastive example, instead of per-point sums
            per_pos, pmask = _nce_terms(cfg, dist, posmask, validf)
            if cfg.power != 1.0:
                per_pos = per_pos**cfg.power
            w = pmask * point_mask[..., None]
            return (
                jnp.sum(per_pos * w) / jnp.maximum(jnp.sum(w), 1.0)
            ) * cfg.weight
        loss = _contrast_nce(cfg, dist, posmask, validf)
    else:
        raise ValueError(f"unknown contrast {cfg.contrast!r}")

    if cfg.power != 1.0:
        # 'p<x>' post-op on the per-point loss (head.py:800-803)
        loss = loss**cfg.power
    return masked_mean(loss, point_mask) * cfg.weight


def cbl_loss(
    latents: Tuple,
    pyramid,
    labels0: jax.Array,
    num_classes: int,
    cfg: ContrastConfig,
    ignore_label: int = -1,
    key: Optional[jax.Array] = None,
):
    """Full CBL: Σ over configured stages. Returns (total, per-stage dict)."""
    losses = {}
    total = 0.0
    # 'Ua' = all present; stages the head didn't compute (None) are skipped
    stages = [
        i for i in cfg.stages if i < len(latents) and latents[i] is not None
    ]

    recur_labels = None
    if cfg.label_infer in ("recur", "recurhard"):
        # recursive stage-to-stage propagation (TF head.py:51-81): stage-i
        # labels from stage-(i-1) labels over the pooling neighborhood,
        # instead of a direct search back to level 0. 'recur' = soft mean
        # per hop (reduction='soft'); 'recurhard' re-hardens each hop —
        # sum the one-hots, argmax, re-one-hot (reduction='max',
        # get_neighbor_summary TF head.py:117-131; dispatch :524-527).
        # Deviation, documented: the reference argmaxes an all-ignored
        # (all-zero) row to class 0; here such rows STAY all-zero, per this
        # repo's ignore-label invariant (they are masked downstream).
        hard = cfg.label_infer == "recurhard"
        lv = subscene_labels(labels0, None, num_classes, ignore_label)
        recur_labels = [lv]
        for l in range(1, len(pyramid.points)):
            nb, _ = shadow_gather(lv, pyramid.down_idx[l], fill=0.0)
            if hard:
                s = jnp.sum(nb, axis=-2)
                any_valid = jnp.sum(s, axis=-1, keepdims=True) > 0
                lv = (
                    jax.nn.one_hot(
                        jnp.argmax(s, axis=-1), num_classes, dtype=jnp.float32
                    )
                    * any_valid
                )
            else:
                lv = jnp.mean(nb, axis=-2)
            recur_labels.append(lv)

    orders = getattr(pyramid, "contrast_order", ()) or (None,) * len(latents)
    locals_ = getattr(pyramid, "contrast_local", ()) or (None,) * len(latents)
    for i in stages:
        if recur_labels is not None:
            label_soft = recur_labels[i]
        else:
            label_soft = subscene_labels(
                labels0, pyramid.subscene_idx[i], num_classes, ignore_label,
                infer=cfg.label_infer,
            )
        ki = jax.random.fold_in(key, i) if key is not None else None
        feats = latents[i]
        local = locals_[i] if i < len(locals_) else None
        if i < len(orders) and orders[i] is not None:
            # tile mode over a natural-layout pyramid: sort features + labels
            # into Morton order once (M rows, vs M·K neighbor rows saved
            # downstream); the loss is a masked mean — permutation invariant,
            # no unsort needed. Under layout='sorted' everything is already
            # sorted (orders[i] is None) and local indices apply directly.
            feats = batch_gather(feats, orders[i])
            label_soft = batch_gather(label_soft, orders[i])
        li = cbl_stage_loss(
            feats, pyramid.contrast_idx[i], label_soft, cfg, key=ki,
            local=local,
        )
        losses[f"cbl_stage{i}"] = li
        total = total + li
    return total, losses
