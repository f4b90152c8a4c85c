"""Train/eval step factories and the epoch loop.

TPU-native equivalent of the reference's execution layer — GraphBuilder's
tower assembly + average_gradients (tensorflow/utils/tf_graph_builder.py:58-110)
and the DDP loop (pytorch/tool/train.py:304-380): here one jitted step fuses
pyramid construction, forward, CE + CBL losses, backward and the optimizer
update; data parallelism is expressed by sharding the batch over the mesh's
`data` axis and letting XLA insert the gradient `psum`s.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp

from ..eval.metrics import AverageMeter, confusion_matrix, metrics_from_confusion
from ..losses.contrast import ContrastConfig, cbl_loss
from ..losses.segmentation import cross_entropy
from ..ops.pyramid import PyramidSpec, build_pyramid
from .state import TrainState


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    num_classes: int
    spec: PyramidSpec
    contrast: Optional[ContrastConfig] = None
    ignore_label: int = -1
    # per-stage branch supervision (multi head 'loss'/'lossSub' tokens;
    # reference multiscale branch segment, tensorflow/models/heads/head.py:
    # 374-383 + mlp_head.pred :289-335)
    branch_loss: str = ""  # '' | 'loss' (U0 labels) | 'lossSub' (soft labels)
    branch_weight: float = 1.0
    # main segmentation loss type/weight (plain mlp-head grammar
    # '<depth>-<loss>-w<f>', tensorflow/config/head.py:56-82; loss dispatch
    # at models/heads/head.py:197-244)
    main_loss: str = "xen"  # xen | sigmoid | none
    main_weight: float = 1.0
    # per-class weights for the main xen loss (mlp-head 'class' token;
    # losses/segmentation.py::inverse_frequency_weights). Tuple → hashable.
    class_weights: Optional[tuple] = None
    # latent dropout needs a PRNG stream (reference dropout at
    # models/heads/head.py:273-274); harmless to thread when no Dropout
    # module exists
    has_dropout: bool = False
    # opt-in training-dynamics instrumentation: adds grad/param global norms
    # to the step metrics (used by the NaN root-cause harness,
    # scripts/nan_bisect.py — round-5 VERDICT item 1)
    debug_metrics: bool = False


def make_train_step(model, cfg: TrainStepConfig) -> Callable:
    """Returns jitted (state, batch) → (state, metrics). batch is a dict with
    points [B,N,3], features [B,N,C], labels [B,N]."""

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        pyramid = build_pyramid(batch["points"], cfg.spec)
        features, labels = batch["features"], batch["labels"]
        if pyramid.order0 is not None:
            # layout='sorted': the pyramid lives in Morton-sorted space —
            # move features/labels there too (every loss below is
            # permutation invariant, so nothing needs un-sorting)
            from ..core.gather import batch_gather as _bg

            features = _bg(features, pyramid.order0)
            labels = _bg(labels, pyramid.order0)

        def loss_fn(params):
            rngs = (
                {"dropout": jax.random.fold_in(jax.random.PRNGKey(17), state.step)}
                if cfg.has_dropout
                else None
            )
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                features,
                pyramid,
                train=True,
                mutable=["batch_stats"],
                rngs=rngs,
            )
            if cfg.main_loss == "sigmoid":
                from ..losses.segmentation import sigmoid_cross_entropy

                ce = sigmoid_cross_entropy(out.logits, labels, cfg.ignore_label)
            elif cfg.main_loss == "none":
                ce = jnp.float32(0.0)
            else:
                pw = None
                if cfg.class_weights is not None:
                    table = jnp.asarray(cfg.class_weights, jnp.float32)
                    pw = table[jnp.clip(labels, 0, len(table) - 1)]
                ce = cross_entropy(
                    out.logits, labels, cfg.ignore_label, weight=pw
                )
            total = cfg.main_weight * ce
            metrics = {"ce": ce}
            if cfg.branch_loss and any(
                sl is not None for sl in out.stage_logits
            ):
                from ..core.gather import batch_gather
                from ..losses.contrast import subscene_labels
                from ..losses.segmentation import soft_cross_entropy

                for i, sl in enumerate(out.stage_logits):
                    if sl is None:
                        continue
                    if cfg.branch_loss == "lossSub":
                        # stage-local soft labels (head.py:303-317)
                        soft = subscene_labels(
                            labels, pyramid.subscene_idx[i],
                            cfg.num_classes, cfg.ignore_label,
                        )
                        bl = soft_cross_entropy(sl, soft)
                    else:  # 'loss': upsample logits to U0, full labels
                        l0 = sl if i == 0 else batch_gather(
                            sl, pyramid.near0_idx[i]
                        )
                        bl = cross_entropy(
                            l0, labels, cfg.ignore_label
                        )
                    total = total + cfg.branch_weight * bl
                    metrics[f"branch_stage{i}"] = bl
            if cfg.contrast is not None:
                cfeats = (
                    out.contrast_feats
                    if any(f is not None for f in out.contrast_feats)
                    else out.latents
                )
                cbl_key = (
                    jax.random.fold_in(jax.random.PRNGKey(13), state.step)
                    if cfg.contrast.extra_neg_rand
                    else None
                )
                cb, per_stage = cbl_loss(
                    cfeats,
                    pyramid,
                    labels,
                    cfg.num_classes,
                    cfg.contrast,
                    cfg.ignore_label,
                    key=cbl_key,
                )
                total = total + cb
                metrics["cbl"] = cb
                metrics.update(per_stage)
            metrics["loss"] = total
            pred = jnp.argmax(out.logits, axis=-1)
            conf = confusion_matrix(
                pred, labels, cfg.num_classes, cfg.ignore_label
            )
            return total, (mutated["batch_stats"], metrics, conf)

        grads, (new_bs, metrics, conf) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        if cfg.debug_metrics:
            import optax

            metrics["grad_norm"] = optax.global_norm(grads)
            metrics["param_norm"] = optax.global_norm(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        metrics["confusion"] = conf
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=0)


def _with_kernel_fallback(build, logger=None, what="step") -> Callable:
    """Wrap a jitted-step factory with a kernels-off compile-retry ladder.

    The Pallas window-top-k kernels are probe-compiled per instantiation
    with XLA fallback, but the remote Mosaic helper has 500'd on combined
    STEP modules whose kernels all probe fine standalone (round 4, preset
    shape B=1 N=65536, key t256w3k36; suspected host-contention starvation
    of the compile-helper subprocess) — production runs must degrade to the
    XLA paths, not crash. Ladder: retry same config (flakiness) → attention
    kernel off (the least-proven kernel, only live under bn_mode='stale') →
    self top-k kernels off (the round-4 deterministic 500 class was
    self-mode) → dense CBL kernel off → all window-top-k kernels off."""
    holder = {
        "step": build(),
        "ladder": [(), ("PT_ATTN", "off"), ("WIN_TOPK_SELF", "off"),
                   ("CBL_DENSE", "off"), ("WIN_TOPK", "off")],
    }

    def step(*args):
        while True:
            try:
                return holder["step"](*args)
            except Exception as e:  # noqa: BLE001 — filter, else re-raise
                msg = str(e)
                retriable = (
                    "remote_compile" in msg or "Mosaic" in msg
                    or "tpu_compile_helper" in msg
                )
                if not retriable or not holder["ladder"]:
                    raise
                import os

                rung = holder["ladder"].pop(0)
                if logger is not None:
                    logger.warning(
                        f"{what} compile failed with Pallas kernels "
                        f"({type(e).__name__}); retrying"
                        + (f" with {rung[0]}={rung[1]}" if rung
                           else " (same config)")
                    )
                if rung:
                    os.environ[rung[0]] = rung[1]
                from ..ops.knn import tile_cross_knn
                from ..ops.pyramid import build_pyramid as _bp

                _bp.clear_cache()
                tile_cross_knn.clear_cache()
                holder["step"] = build()

    return step


def make_train_step_with_fallback(model, cfg: TrainStepConfig,
                                  logger=None) -> Callable:
    """make_train_step with the kernels-off compile-retry ladder."""
    return _with_kernel_fallback(
        lambda: make_train_step(model, cfg), logger, "train step"
    )


def make_eval_step_with_fallback(model, cfg: TrainStepConfig, logger=None,
                                 **kw) -> Callable:
    """make_eval_step with the kernels-off compile-retry ladder."""
    return _with_kernel_fallback(
        lambda: make_eval_step(model, cfg, **kw), logger, "eval step"
    )


def make_eval_step(
    model, cfg: TrainStepConfig, with_features: bool = False,
    output: str = "probs",
) -> Callable:
    """Returns jitted (state, batch) → (probs [B,N,C], confusion[, feats]).

    output='logits' returns raw logits instead of probs — the enumerate
    protocol accumulates logits (pytorch/tool/test.py:330-352).

    Inference needs no contrast/sub-scene KNNs — the eval pyramid drops them
    (the level-0 contrast search is one of the most expensive KNNs).

    with_features=True additionally returns a dict of per-stage latents
    upsampled (nearest) to level 0 — the reference's per-stage feature
    extraction during eval (tensorflow/utils/tester.py:51-96), feeding the
    feature-distance-across-boundary stats (:817-886)."""
    eval_spec = dataclasses.replace(
        cfg.spec, k_contrast=None, with_subscene=False
    )

    def eval_step(state: TrainState, batch):
        from ..core.gather import batch_gather

        pyramid = build_pyramid(batch["points"], eval_spec)
        features = batch["features"]
        inv0 = None
        if pyramid.order0 is not None:
            # layout='sorted': model inputs/outputs live in Morton-sorted
            # space; predictions must be returned in the CALLER's row order
            # (voting/reprojection index into the original crop rows), so
            # un-permute with the inverse order (a cheap N-row scatter).
            features = batch_gather(features, pyramid.order0)
            b, n = pyramid.order0.shape
            inv0 = (
                jnp.zeros_like(pyramid.order0)
                .at[jnp.arange(b)[:, None], pyramid.order0]
                .set(jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n)))
            )
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            features,
            pyramid,
            train=False,
        )
        probs = (
            out.logits
            if output == "logits"
            else jax.nn.softmax(out.logits, axis=-1)
        )
        if inv0 is not None:
            probs = batch_gather(probs, inv0)
        pred = jnp.argmax(probs, axis=-1)
        conf = confusion_matrix(
            pred, batch["labels"], cfg.num_classes, cfg.ignore_label
        )
        if not with_features:
            return probs, conf

        feats = {}
        for i, lat in enumerate(out.latents):
            if lat is None:
                continue
            f0 = lat if i == 0 else batch_gather(lat, pyramid.near0_idx[i])
            if inv0 is not None:
                f0 = batch_gather(f0, inv0)
            feats[f"latent{i}"] = f0
        return probs, conf, feats

    return jax.jit(eval_step)


class Trainer:
    """Minimal epoch driver: meters, periodic logging, metric aggregation.
    (The full dataset trainer with voting validation lives with the data
    pipeline; reference utils/trainer.py:31-171.)"""

    def __init__(self, model, state: TrainState, cfg: TrainStepConfig, log_fn=print):
        self.model = model
        self.state = state
        self.cfg = cfg
        self.train_step = make_train_step(model, cfg)
        self.eval_step = make_eval_step(model, cfg)
        self.log = log_fn

    def train_epoch(
        self, batches: Iterable, log_freq: int = 10
    ) -> Dict[str, float]:
        meters: Dict[str, AverageMeter] = {}
        conf_sum = None
        t0 = time.time()
        n = 0
        for i, batch in enumerate(batches):
            self.state, metrics = self.train_step(self.state, batch)
            conf = metrics.pop("confusion")
            conf_sum = conf if conf_sum is None else conf_sum + conf
            for k, v in metrics.items():
                meters.setdefault(k, AverageMeter()).update(float(v))
            n += 1
            if log_freq and (i + 1) % log_freq == 0:
                self.log(
                    f"step {i+1}: "
                    + " ".join(f"{k}={m.avg:.4f}" for k, m in meters.items())
                )
        out = {k: m.avg for k, m in meters.items()}
        if conf_sum is not None:
            m = metrics_from_confusion(jax.device_get(conf_sum))
            out.update({k: m[k] for k in ("mIoU", "OA", "mACC")})
        out["steps_per_sec"] = n / max(time.time() - t0, 1e-9)
        return out
