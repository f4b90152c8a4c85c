"""Pure-numpy reference implementations mirroring the reference repo's
native-op semantics (SURVEY.md §2.1 N1-N10). Device kernels are
property-tested against these on random clouds — the TPU-native analog of the
reference's op smoke tests (tensorflow/ops/tf_custom_ops/test.py,
ops/nearest_neighbors/test.py).
"""
import numpy as np


def knn_np(query, support, k, exclude_self=False):
    """Brute-force KNN, ascending squared distances.
    query [M,3], support [N,3] → idx [M,k], d2 [M,k]."""
    d2 = ((query[:, None, :] - support[None, :, :]) ** 2).sum(-1)
    if exclude_self:
        m = min(len(query), len(support))
        d2[np.arange(m), np.arange(m)] = np.inf
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d2, idx, axis=1)


def fps_np(points, m, start=0):
    """Exact farthest point sampling (greedy, start at `start`)."""
    n = len(points)
    idx = np.zeros(m, np.int64)
    idx[0] = start
    mind2 = np.full(n, np.inf)
    last = start
    for i in range(1, m):
        d2 = ((points - points[last]) ** 2).sum(-1)
        mind2 = np.minimum(mind2, d2)
        last = int(np.argmax(mind2))
        idx[i] = last
    return idx


def interpolate_np(p_src, p_dst, x_src, k=3):
    """IDW interpolation with 1/(d2+1e-8) weights (pointops.interpolation)."""
    idx, d2 = knn_np(p_dst, p_src, k)
    w = 1.0 / (d2 + 1e-8)
    w = w / w.sum(-1, keepdims=True)
    return (x_src[idx] * w[..., None]).sum(-2)


def voxel_subsample_np(points, features, labels, voxel_size, num_classes):
    """Barycenter + feature-mean + label-majority per occupied voxel
    (grid_subsampling.cpp semantics). Returns arrays sorted by voxel hash."""
    mn = points.min(0)
    v = np.floor((points - mn) / voxel_size).astype(np.int64)
    key = (v[:, 0] * 2048 + v[:, 1]) * 2048 + v[:, 2]
    uniq, inv = np.unique(key, return_inverse=True)
    m = len(uniq)
    cnt = np.bincount(inv, minlength=m).astype(np.float64)
    out_p = np.stack(
        [np.bincount(inv, weights=points[:, d], minlength=m) for d in range(3)], -1
    ) / cnt[:, None]
    out_f = None
    if features is not None:
        out_f = np.stack(
            [
                np.bincount(inv, weights=features[:, d], minlength=m)
                for d in range(features.shape[1])
            ],
            -1,
        ) / cnt[:, None]
    out_l = None
    if labels is not None:
        votes = np.zeros((m, num_classes))
        np.add.at(votes, (inv, labels), 1.0)
        out_l = votes.argmax(-1)
    return out_p, out_f, out_l


def subscene_label_np(p_from, p_to, labels_from, kr, num_classes):
    """Soft sub-scene label: mean one-hot over kr nearest level-0 points
    (pytorch/model/basic_operators.py:9-50)."""
    idx, _ = knn_np(p_to, p_from, kr)
    onehot = np.eye(num_classes)[labels_from]
    return onehot[idx].mean(-2)


def cbl_nce_np(features, neighbor_idx, labels_soft, temperature=1.0):
    """Per-stage CBL nce loss (TF default, no mask/margin token) — mirrors
    tensorflow/models/heads/head.py:773-795: denominator = Σ exps over ALL
    valid pos+neg samples, per-point SUM of −log over positives, mean over
    point-masked rows. cnt posmask + l2 dist."""
    eps = 1e-12
    k = neighbor_idx.shape[1]
    nb_label = labels_soft[neighbor_idx]
    nb_feat = features[neighbor_idx]
    posmask = labels_soft.argmax(-1)[:, None] == nb_label.argmax(-1)
    cnt = posmask.sum(-1)
    point_mask = (0 < cnt) & (cnt < k)
    if not point_mask.any():
        return 0.0
    pm = posmask[point_mask]
    f = features[point_mask]
    nf = nb_feat[point_mask]
    dist = np.sqrt(((f[:, None, :] - nf) ** 2).sum(-1) + eps)
    d = -dist
    d = d / temperature
    d = d - d.max(-1, keepdims=True)
    e = np.exp(d)
    under = e.sum(-1, keepdims=True)  # all pos+neg (head.py:788)
    per_pos = -np.log(e / under + eps)  # head.py:795 (log of ratio + eps)
    return (per_pos * pm).sum(-1).mean()


def cbl_kl_posmask_np(labels_soft, nb_label, threshold):
    """kl posmask + the point mask derived FROM IT — mirrors
    tensorflow/models/heads/head.py:492-519 (labelkl posneg) feeding
    solve_samples_mask (:639-662). Returns (posmask [M,K], point_mask [M])."""
    eps = 1e-12
    l = np.maximum(labels_soft[:, None, :], eps)
    nl = np.maximum(nb_label, eps)
    kl = (labels_soft[:, None, :] * (np.log(l) - np.log(nl))).sum(-1)
    posmask = kl < threshold
    pos_point = posmask.any(-1)
    neg_point = (~posmask).any(-1)
    return posmask, pos_point & neg_point


def cbl_softnn_np(features, neighbor_idx, labels_soft, temperature=1.0):
    """Per-stage CBL softnn loss on one cloud — mirrors
    pytorch/model/heads.py:185-246 `point_contrast` with cnt posmask and l2
    dist. features [M,C], neighbor_idx [M,K] (self excluded),
    labels_soft [M,ncls]. Returns scalar mean loss over masked points
    (weight NOT applied)."""
    eps = 1e-12
    k = neighbor_idx.shape[1]
    nb_label = labels_soft[neighbor_idx]  # [M,K,ncls]
    nb_feat = features[neighbor_idx]  # [M,K,C]
    posmask = labels_soft.argmax(-1)[:, None] == nb_label.argmax(-1)  # [M,K]
    cnt = posmask.sum(-1)
    point_mask = (0 < cnt) & (cnt < k)
    if not point_mask.any():
        return 0.0
    pm = posmask[point_mask]
    f = features[point_mask]
    nf = nb_feat[point_mask]
    dist = np.sqrt(((f[:, None, :] - nf) ** 2).sum(-1) + eps)
    d = -dist
    d = d - d.max(-1, keepdims=True)
    d = d / temperature
    e = np.exp(d)
    pos = (e * pm).sum(-1)
    neg = e.sum(-1)
    loss = -np.log(pos / neg + eps)
    return loss.mean()


def cbl_aug_np(
    features, neighbor_idx, labels_soft, contrast="softnn", temperature=None,
    separate_pos=False, mask_mode=False, power=1.0,
):
    """Margin/mask/power re-derivation of tensorflow/models/heads/head.py:
    747-806 (calc_loss_from_dist): 'S' separate pos term (:763-766, :784-788),
    'mask' nce flat mean over positive terms (:796-798), 'p<x>' power post-op
    (:800-803). cnt posmask + l2 dist; all neighbors valid (dense KNN)."""
    eps = 1e-12
    k = neighbor_idx.shape[1]
    nb_label = labels_soft[neighbor_idx]
    nb_feat = features[neighbor_idx]
    posmask = labels_soft.argmax(-1)[:, None] == nb_label.argmax(-1)
    cnt = posmask.sum(-1)
    point_mask = (0 < cnt) & (cnt < k)
    if not point_mask.any():
        return 0.0
    pm = posmask[point_mask]
    negm = ~pm
    f = features[point_mask]
    nf = nb_feat[point_mask]
    dist = np.sqrt(((f[:, None, :] - nf) ** 2).sum(-1) + eps)
    d = -dist
    if temperature is not None:
        d = d / temperature
    d = d - d.max(-1, keepdims=True)
    e = np.exp(d)
    if contrast == "softnn":
        pos = (e * pm).sum(-1)
        neg = (e * negm).sum(-1)
        ratio = pos / np.maximum(neg, eps) if separate_pos else pos / (pos + neg)
        loss = -np.log(ratio + eps)
        if power != 1.0:
            loss = loss**power
        return loss.mean()
    # nce
    if separate_pos:
        under = e + (e * negm).sum(-1, keepdims=True)  # per-sample (:784-788)
    else:
        under = e.sum(-1, keepdims=True)  # all pos+neg (:789-791)
    terms = -np.log(e / under + eps)
    if mask_mode:
        t = terms[pm]  # every positive term is one example (:796-798)
        if power != 1.0:
            t = t**power
        return t.mean()
    loss = (terms * pm).sum(-1)
    if power != 1.0:
        loss = loss**power
    return loss.mean()
