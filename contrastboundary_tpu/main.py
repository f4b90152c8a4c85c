"""CLI entry: config-driven training and voting evaluation.

Equivalent of tensorflow/main.py (argparse → config → train/val dispatch) and
pytorch/tool/train.py / tool/test.py, on one jitted data-parallel step:

  python -m contrastboundary_tpu.main -c synthetic_tiny --mode train
  python -m contrastboundary_tpu.main -c s3dis_pt_cbl --mode train \
      --set data.data_root:/path/to/npy
  python -m contrastboundary_tpu.main -c synthetic_tiny --mode val \
      --model_path auto
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_dataset(cfg, split: str):
    from .data import S3DISDataset, SyntheticSceneDataset

    d = cfg.data
    if d.dataset == "synthetic":
        return SyntheticSceneDataset(
            num_rooms=d.num_rooms,
            points_per_room=d.points_per_room,
            seed=cfg.seed,
            split=split,
            loop=d.loop if split == "train" else 1,
            ignore_fraction=d.ignore_fraction,
        )
    if d.dataset == "s3dis":
        return S3DISDataset(
            d.data_root, split=split, test_area=d.test_area,
            loop=d.loop if split == "train" else 1,
        )
    if d.dataset in ("scannet", "semantic3d", "npm3d"):
        from .data.datasets import (
            NPM3DDataset,
            ScanNetDataset,
            Semantic3DDataset,
        )

        cls = {
            "scannet": ScanNetDataset,
            "semantic3d": Semantic3DDataset,
            "npm3d": NPM3DDataset,
        }[d.dataset]
        return cls(
            d.data_root, split=split, loop=d.loop if split == "train" else 1
        )
    raise ValueError(f"unknown dataset {d.dataset!r}")


def setup(cfg, logger):
    import jax
    import jax.numpy as jnp

    from .ops import build_pyramid
    from .parallel import make_mesh, replicated_sharding
    from .train import TrainStepConfig, create_train_state, make_train_step, make_eval_step
    from .train.schedule import exponential_epoch_decay, multistep_epoch_decay
    from .train.state import make_optimizer

    model = cfg.build_model()
    spec = cfg.pyramid_spec()
    multi = cfg.heads.get("multi", {})
    mlp = cfg.heads.get("mlp", {})
    class_weights = None
    if mlp.get("class_weight"):
        # mlp-head 'class' token: inverse-frequency weights from the train
        # split's label histogram (semantics note in config/dsl.py —
        # the reference's get_class_weight is an undefined symbol there)
        from .losses.segmentation import inverse_frequency_weights

        ds = build_dataset(cfg, "train")
        counts = np.zeros(cfg.data.num_classes, np.int64)
        for i in range(min(ds.num_rooms, 64)):  # histogram estimate cap
            lab = ds.room(i)[2]
            counts += np.bincount(
                lab[lab >= 0].astype(np.int64), minlength=cfg.data.num_classes
            )
        class_weights = inverse_frequency_weights(counts)
        logger.info(
            "class weights (inv-sqrt-freq): "
            + " ".join(f"{w:.3f}" for w in class_weights)
        )
    step_cfg = TrainStepConfig(
        num_classes=cfg.data.num_classes,
        spec=spec,
        contrast=cfg.contrast,
        ignore_label=cfg.data.ignore_label,
        branch_loss=multi.get("branch_loss", ""),
        branch_weight=multi.get("branch_weight", 1.0),
        main_loss=mlp.get("loss", "xen"),
        main_weight=mlp.get("weight", 1.0),
        has_dropout=bool(mlp.get("drop")),
        class_weights=class_weights,
    )

    train_ds = build_dataset(cfg, "train")
    steps_per_epoch = max(len(train_ds) // cfg.optim.batch_size, 1)
    o = cfg.optim
    if o.schedule == "multistep":
        lr = multistep_epoch_decay(
            o.base_lr, [m * o.epochs for m in o.milestones], o.multiplier,
            steps_per_epoch,
        )
    else:
        lr = exponential_epoch_decay(o.base_lr, o.decay_rate, steps_per_epoch)
    tx = make_optimizer(
        lr, optimizer=o.optimizer, momentum=o.momentum,
        weight_decay=o.weight_decay, grad_clip_norm=o.grad_clip_norm,
    )

    # init on one example batch
    from .data import make_batch_iterator

    ex = next(
        iter(
            make_batch_iterator(
                train_ds, cfg.optim.batch_size, cfg.data.n_points,
                seed=cfg.seed, voxel_size=cfg.data.voxel_size,
                voxel_max=cfg.data.voxel_max,
            )
        )
    )
    pyr = build_pyramid(jnp.asarray(ex["points"]), spec)
    init_rngs = {
        "params": jax.random.PRNGKey(cfg.seed),
        "dropout": jax.random.PRNGKey(cfg.seed + 1),
    }
    variables = jax.jit(model.init, static_argnames=("train",))(
        init_rngs, jnp.asarray(ex["features"]), pyr, train=True
    )
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    logger.info(f"model {cfg.model.arch}: {nparams/1e6:.2f}M params, "
                f"{steps_per_epoch} steps/epoch")
    state = create_train_state(variables, tx)

    # the data mesh must evenly divide both the train and eval batch sizes;
    # use the largest device count that does (all devices in production
    # shapes, fewer when a smoke config's batch is smaller than the mesh)
    import math

    ndev = len(jax.devices())
    g = math.gcd(cfg.optim.batch_size, cfg.eval.batch_size)
    d = max(k for k in range(1, min(g, ndev) + 1) if g % k == 0)
    if d < ndev:
        logger.info(f"mesh: using {d}/{ndev} devices (batch divisibility)")
    mesh = make_mesh(jax.devices()[:d])
    state = jax.device_put(state, replicated_sharding(mesh))
    return model, spec, step_cfg, state, mesh, train_ds, steps_per_epoch


def run_eval(
    cfg, model, step_cfg, state, mesh, logger,
    num_votes=None, extra_ops: str = "", h5_path: str = "", ctx=None,
):
    """Voting evaluation. Pass a dict as `ctx` to cache the jitted eval step,
    the val dataset and the evaluator across calls — repeated evals then skip
    recompilation/KDTree rebuilds and accumulate probs across rounds (the
    reference's running vote, tensorflow/utils/tester.py:101-148)."""
    import jax

    from .eval.voting import VotingEvaluator
    from .parallel import shard_batch
    from .train import make_eval_step_with_fallback

    ctx = ctx if ctx is not None else {}
    # 'feature' in extra_ops → extract per-stage latents during eval for the
    # feature-distance-across-boundary stats (reference tester.py:51-96)
    with_features = bool(extra_ops) and "feature" in extra_ops
    if "eval_step" not in ctx:
        ctx["eval_step"] = make_eval_step_with_fallback(
            model, step_cfg, with_features=with_features
        )
        ctx["val_ds"] = build_dataset(cfg, "val")
    eval_step = ctx["eval_step"]
    ctx["state"] = state  # current params for the cached predict closure

    def predict(batch):
        b = dict(batch)
        b["labels"] = np.zeros(b["points"].shape[:2], np.int32)
        b = shard_batch(mesh, b)
        out = eval_step(
            ctx["state"], {k: b[k] for k in ("points", "features", "labels")}
        )
        if with_features:
            probs, _, feats = out
            return jax.device_get(probs), jax.device_get(feats)
        probs, _ = out
        return jax.device_get(probs)

    if "evaluator" not in ctx:
        ctx["evaluator"] = VotingEvaluator(
            ctx["val_ds"], predict, cfg.data.num_classes, cfg.data.n_points,
            batch_size=cfg.eval.batch_size, voxel_size=cfg.data.voxel_size,
            num_votes=num_votes if num_votes is not None else cfg.eval.num_votes,
            smooth=cfg.eval.smooth, seed=cfg.seed,
            crop_mode=cfg.data.crop_mode, in_radius=cfg.data.in_radius,
        )
    ev = ctx["evaluator"]
    ev.predict_fn = predict
    ev.reset_potentials()
    m = ev.run(progress=lambda s, p: logger.info(f"  vote step {s}, min_pot {p:.2f}"))
    logger.info(
        f"val: sub mIoU {m['sub']['mIoU']:.4f} OA {m['sub']['OA']:.4f} "
        f"mACC {m['sub']['mACC']:.4f} | full mIoU {m['full']['mIoU']:.4f} "
        f"OA {m['full']['OA']:.4f}"
    )

    if extra_ops and "boundary" in extra_ops:
        from .eval.boundary import save_eval_h5

        clouds = [
            {
                "coord": cs.coord, "label": cs.label, "prob": cs.probs,
                "features": cs.features or None,
            }
            for cs in ev.clouds
        ]
        m.update(run_boundary_suite(cfg, clouds, logger, extra_ops))
        if h5_path:
            save_eval_h5(
                h5_path,
                [{k: c[k] for k in ("coord", "label", "prob")} for c in clouds],
            )
            logger.info(f"saved eval artifacts to {h5_path}")
    return m


def run_boundary_suite(cfg, clouds, logger, extra_ops: str) -> dict:
    """Boundary suite over per-cloud (coord, label, prob[, features]) dicts —
    shared by the live voting eval and the offline h5 re-analysis (reference
    solve_extra_ops, tensorflow/utils/tester.py:786-886; offline entry
    :1077-1124). Returns {'boundary': ..., ['stat': ...]}."""
    from .eval.boundary import BoundaryEvaluator

    bev = BoundaryEvaluator(cfg.data.num_classes, radius=cfg.model.base_radius)
    for c in clouds:
        bev.add_cloud(
            np.asarray(c["coord"]),
            np.asarray(c["label"]).astype(np.int64),
            np.asarray(c["prob"]),
            features=c.get("features") or None,
        )
    m: dict = {}
    br = bev.results()
    m["boundary"] = br
    logger.info(f"boundary: B-IoU {br['B-IoU']:.4f}")
    for which in ("bound", "plain", "ideal"):
        s = br[f"conf_{which}_label"]
        logger.info(
            f"  conf_{which}: mIoU {s['mIoU']:.4f} OA {s['OA']:.4f} "
            f"mACC {s['mACC']:.4f}"
        )
    d = br["dist_prob:kl"]
    logger.info(
        f"  prob-kl across boundary: pos {d['pos']:.4f} neg {d['neg']:.4f} "
        f"bound {d['bound_mean']:.4f} plain {d['plain_mean']:.4f}"
    )
    # feature-distance-across-boundary stats (tester.py:817-886)
    for key in sorted(br):
        if key.startswith("dist_latent"):
            d = br[key]
            logger.info(
                f"  {key}: pos {d['pos']:.4f} neg {d['neg']:.4f} "
                f"bound {d['bound_mean']:.4f} plain {d['plain_mean']:.4f}"
            )
    if "stat" in extra_ops:
        # per-class boundary FP/FN tables (tester.py:800-830)
        st = bev.stat()
        m["stat"] = st
        for mask_n in ("label", "pred"):
            logger.info(
                f"  stat[{mask_n}]: {st[f'pct_err_on_bound_{mask_n}']*100:5.1f}% "
                f"of error on bound ({st[f'err_bound_{mask_n}']} bound / "
                f"{st[f'err_plain_{mask_n}']} plain / {st['err_total']} total)"
            )
            for err_t in ("FP", "FN"):
                b = st[f"{mask_n}-bound"][err_t]
                p = st[f"{mask_n}-plain"][err_t]
                with np.printoptions(linewidth=200):
                    logger.info(f"  stat {mask_n} bound {err_t}: {b}")
                    logger.info(f"  stat {mask_n} plain {err_t}: {p}")
    return m


def analyze(cfg, logger, h5_path: str, extra_ops: str = "boundary-stat") -> dict:
    """Offline re-analysis of saved eval artifacts — the boundary suite from
    an h5 file WITHOUT a model (reference solve_extra_ops_from_file,
    tensorflow/utils/tester.py:1077-1124). Produces numbers identical to the
    in-process run that wrote the file."""
    from .eval.boundary import load_eval_h5

    if not h5_path:
        raise SystemExit("--mode analyze requires --h5 <saved val_*.h5>")
    clouds = load_eval_h5(h5_path)
    logger.info(f"analyze: {len(clouds)} clouds from {h5_path}")
    if "boundary" not in extra_ops:
        extra_ops = "boundary-" + extra_ops
    return run_boundary_suite(cfg, clouds, logger, extra_ops)


def train(cfg, logger, exp_dir: str):
    import jax

    from .data import default_train_transform, make_batch_iterator
    from .eval.metrics import AverageMeter, metrics_from_confusion
    from .parallel import shard_batch
    from .train import make_train_step_with_fallback
    from .train.checkpoint import CheckpointManager

    model, spec, step_cfg, state, mesh, train_ds, steps_per_epoch = setup(cfg, logger)
    train_step = make_train_step_with_fallback(model, step_cfg, logger)
    ckpt = CheckpointManager(os.path.join(exp_dir, "checkpoints"))
    transform = default_train_transform()
    # scalar summary export (reference's optional summaries/tensorboardX,
    # tf_graph_builder.py:119-151, pytorch/tool/train.py:264-270) — rank-0
    # only; metric values are already global under the sharded step
    from .utils.scalars import ScalarWriter

    scalars = ScalarWriter(exp_dir) if jax.process_index() == 0 else None
    best_miou = -1.0
    eval_ctx: dict = {}  # caches eval step/dataset/evaluator across epochs
    # per-host input shards: each process preprocesses only its share, and
    # shard_batch assembles the global array from the local shards via
    # make_array_from_process_local_data (parallel/mesh.py; 2-process test
    # in tests/test_multihost.py)
    proc_idx, proc_cnt = jax.process_index(), jax.process_count()

    pot_state = None
    if cfg.data.sampler == "potential":
        # stateful spatially-regular sampler, persistent ACROSS epochs so
        # coverage potentials keep accumulating (datasets/base.py:297-330)
        from .data.pipeline import PotentialSampler

        pot_state = PotentialSampler(
            train_ds, cfg.data.voxel_size, in_radius=cfg.data.in_radius,
            cap=cfg.data.voxel_max, seed=cfg.seed + proc_idx,
        )
        logger.info(
            f"potential sampler over {len(pot_state.rooms)} rooms "
            f"(in_radius {cfg.data.in_radius})"
        )

    for epoch in range(cfg.optim.epochs):
        t0 = time.time()
        meters = {}
        conf_sum = None
        from .data.prefetch import prefetch

        it = prefetch(
            lambda epoch=epoch: make_batch_iterator(
                train_ds, cfg.optim.batch_size, cfg.data.n_points,
                seed=cfg.seed, epoch=epoch, transform=transform,
                voxel_size=cfg.data.voxel_size, voxel_max=cfg.data.voxel_max,
                crop_mode=cfg.data.crop_mode, in_radius=cfg.data.in_radius,
                shard_index=proc_idx, num_shards=proc_cnt,
                sampler=cfg.data.sampler, potential_state=pot_state,
            ),
            depth=3,
        )
        n_steps = 0
        for i, batch in enumerate(it):
            batch.pop("src_idx"), batch.pop("room_idx")
            batch = shard_batch(mesh, batch)
            if cfg.runtime_freq and (i + 1) % cfg.runtime_freq == 0:
                from .utils.profiling import trace

                with trace(os.path.join(exp_dir, "traces")):
                    state, metrics = train_step(state, batch)
                    import jax as _jax

                    _jax.block_until_ready(metrics["loss"])
            else:
                state, metrics = train_step(state, batch)
            n_steps += 1
            # NaN sentinel — ALWAYS on at log_freq granularity (the float()
            # there is paid for logging anyway); `debug_nan` tightens it to
            # every step. A diverged run must halt with a reproducer, not
            # burn the rest of the schedule training NaN weights (round-4
            # postmortem; the reference's own loop is unguarded,
            # pytorch/tool/train.py:325 — we do better).
            if (cfg.debug_nan or (i + 1) % cfg.log_freq == 0) and not np.isfinite(
                float(metrics["loss"])
            ):
                from .train.debug import dump_nan_state

                dump_nan_state(exp_dir, state, batch, metrics, logger)
                raise FloatingPointError(f"NaN loss at step {int(state.step)}")
            conf = metrics.pop("confusion")
            conf_sum = conf if conf_sum is None else conf_sum + conf
            if (i + 1) % cfg.log_freq == 0:
                for k, v in metrics.items():
                    meters.setdefault(k, AverageMeter()).update(float(v))
                if scalars is not None:
                    scalars.write(
                        int(state.step),
                        {f"train/{k}": float(v) for k, v in metrics.items()},
                    )
                logger.info(
                    f"epoch {epoch} step {i+1}/{steps_per_epoch}: "
                    + " ".join(
                        f"{k}={m.avg:.4f}" for k, m in sorted(meters.items())
                        if not k.startswith("cbl_stage")
                    )
                )
        tm = metrics_from_confusion(jax.device_get(conf_sum))
        dt = time.time() - t0
        pps = n_steps * cfg.optim.batch_size * cfg.data.n_points / max(dt, 1e-9)
        logger.info(
            f"epoch {epoch} done in {dt:.1f}s ({pps/1e3:.0f}k pts/s): "
            f"train mIoU {tm['mIoU']:.4f} OA {tm['OA']:.4f}"
        )
        if scalars is not None:
            scalars.write(
                int(state.step),
                {"epoch": epoch, "epoch/train_mIoU": tm["mIoU"],
                 "epoch/train_OA": tm["OA"], "epoch/points_per_sec": pps},
            )

        if (epoch + 1) % cfg.eval.eval_freq == 0 or epoch == cfg.optim.epochs - 1:
            m = run_eval(cfg, model, step_cfg, state, mesh, logger, ctx=eval_ctx)
            miou = m["full"]["mIoU"]
            is_best = miou > best_miou
            best_miou = max(best_miou, miou)
            if scalars is not None:
                scalars.write(
                    int(state.step),
                    {"epoch": epoch, "val/mIoU": miou,
                     "val/best_mIoU": best_miou},
                )
            if (epoch + 1) % cfg.save_freq == 0 or is_best:
                ckpt.save(int(state.step), state, best=is_best, metric=miou)
                logger.info(f"saved snap-{int(state.step)}" + (" (best)" if is_best else ""))
    logger.info(f"training done; best full-cloud mIoU {best_miou:.4f}")
    return best_miou


def _resolve_model_path(exp_dir: str, model_path: str, logger) -> str:
    """'best' resolves ACROSS the experiment dir's `Log_*` runs (the
    reference's get_best_val_snap, tensorflow/config/utils.py:280-310), not
    just within this run's checkpoints/."""
    if model_path != "best":
        return model_path
    from .train.checkpoint import find_best_snapshot

    hit = find_best_snapshot(exp_dir)
    if hit is None:
        return model_path  # fall through to within-run resolution
    miou = "" if hit["mIoU"] == float("-inf") else f" (mIoU {hit['mIoU']:.4f})"
    logger.info(
        f"best across runs: step {hit['step']}{miou} from {hit['run']}"
    )
    return hit["path"]


def validate(
    cfg, logger, exp_dir: str, model_path: str, extra_ops: str = "",
    protocol: str = "voting",
):
    from .train.checkpoint import CheckpointManager

    model, spec, step_cfg, state, mesh, _, _ = setup(cfg, logger)
    ckpt = CheckpointManager(os.path.join(exp_dir, "checkpoints"))
    model_path = _resolve_model_path(exp_dir, model_path, logger)
    state, skipped = ckpt.restore(state, model_path)
    if skipped:
        logger.info(f"partial restore skipped {len(skipped)} leaves")
    logger.info(f"restored step {int(state.step)}")
    if protocol == "enumerate":
        return run_enumerate_eval(
            cfg, model, step_cfg, state, mesh, logger, extra_ops=extra_ops
        )
    h5 = os.path.join(exp_dir, f"val_{int(state.step)}.h5") if "save" in extra_ops else ""
    return run_eval(
        cfg, model, step_cfg, state, mesh, logger,
        extra_ops=extra_ops, h5_path=h5,
    )


def run_enumerate_eval(cfg, model, step_cfg, state, mesh, logger, extra_ops=""):
    """Whole-scene voxel-duplicate enumeration protocol (pytorch/tool/
    test.py:128-238) — every point of every room receives a prediction;
    LOGITS accumulate across passes."""
    import jax

    from .eval.enumerate import EnumerateEvaluator
    from .parallel import shard_batch
    from .train import make_eval_step_with_fallback as make_eval_step

    eval_step = make_eval_step(model, step_cfg, output="logits")

    def predict(batch):
        b = dict(batch)
        b["labels"] = np.zeros(b["points"].shape[:2], np.int32)
        b = shard_batch(mesh, b)
        logits, _ = eval_step(
            state, {k: b[k] for k in ("points", "features", "labels")}
        )
        return jax.device_get(logits)

    ds = build_dataset(cfg, "val")
    ev = EnumerateEvaluator(
        ds, predict, cfg.data.num_classes, cfg.data.n_points,
        batch_size=cfg.eval.batch_size, voxel_size=cfg.data.voxel_size,
        voxel_max=cfg.data.voxel_max, seed=cfg.seed,
    )
    m = ev.run(
        progress=lambda r, p: logger.info(f"  room {r}: {p} parts predicted")
    )
    logger.info(
        f"enumerate val: full mIoU {m['full']['mIoU']:.4f} "
        f"OA {m['full']['OA']:.4f} mACC {m['full']['mACC']:.4f}"
    )
    if extra_ops and "boundary" in extra_ops:
        from .eval.boundary import BoundaryEvaluator

        bev = BoundaryEvaluator(cfg.data.num_classes, radius=cfg.model.base_radius)
        for coord, lab, lg in zip(ev.coords, ev.labels, ev.logits):
            e = np.exp(lg - lg.max(-1, keepdims=True))
            bev.add_cloud(coord, lab, e / e.sum(-1, keepdims=True))
        br = bev.results()
        m["boundary"] = br
        logger.info(f"enumerate boundary: B-IoU {br['B-IoU']:.4f}")
        if "stat" in extra_ops:
            st = bev.stat()
            m["stat"] = st
            for mask_n in ("label", "pred"):
                logger.info(
                    f"  stat[{mask_n}]: "
                    f"{st[f'pct_err_on_bound_{mask_n}']*100:5.1f}% of error "
                    f"on bound ({st[f'err_bound_{mask_n}']} bound / "
                    f"{st[f'err_plain_{mask_n}']} plain / "
                    f"{st['err_total']} total)"
                )
    return m


def run_test(cfg, logger, exp_dir: str, model_path: str, out_dir: str = ""):
    """Test-split inference + benchmark submission (reference
    tensorflow/main.py:110-147 `--mode test`, utils/tester.py:222-327
    `test_vote_seg` + `project_test_predictions`).

    Flow: voting inference over the (unlabeled) test rooms with the test
    smoothing 0.98 (tester.py:235), argmax on the voted sub-cloud, reproject
    to every raw point via the ingest's KDTree indices, inverse label remap,
    write the benchmark's ascii files (+ zip for Semantic3D)."""
    import jax

    from .eval.voting import VotingEvaluator
    from .parallel import shard_batch
    from .train import make_eval_step_with_fallback as make_eval_step
    from .train.checkpoint import CheckpointManager

    model, spec, step_cfg, state, mesh, _, _ = setup(cfg, logger)
    ckpt = CheckpointManager(os.path.join(exp_dir, "checkpoints"))
    model_path = _resolve_model_path(exp_dir, model_path, logger)
    state, skipped = ckpt.restore(state, model_path)
    logger.info(f"restored step {int(state.step)} (skipped {len(skipped)})")

    test_ds = build_dataset(cfg, "test")
    eval_step = make_eval_step(model, step_cfg)

    def predict(batch):
        b = dict(batch)
        b["labels"] = np.zeros(b["points"].shape[:2], np.int32)
        b = shard_batch(mesh, b)
        probs, _ = eval_step(
            state, {k: b[k] for k in ("points", "features", "labels")}
        )
        return jax.device_get(probs)

    ev = VotingEvaluator(
        test_ds, predict, cfg.data.num_classes, cfg.data.n_points,
        batch_size=cfg.eval.batch_size, voxel_size=cfg.data.voxel_size,
        num_votes=cfg.eval.num_votes, smooth=0.98, seed=cfg.seed,
        crop_mode=cfg.data.crop_mode, in_radius=cfg.data.in_radius,
    )
    ev.run(progress=lambda s, p: logger.info(f"  test vote step {s}, min_pot {p:.2f}"))

    predictions = {}
    for r in range(test_ds.num_rooms):
        name = test_ds.names[r]
        # voted sub-cloud → npy-level full cloud (ev.proj) → raw scan points
        pred_npy = ev.clouds[r].predictions()[ev.proj[r]]
        try:
            raw_proj = test_ds.projection(name)
            pred_raw = pred_npy[raw_proj]
        except (FileNotFoundError, AttributeError):
            logger.info(f"{name}: no raw projection file — submitting npy-level")
            pred_raw = pred_npy
        predictions[name] = pred_raw
        logger.info(f"{name}: {len(pred_raw)} point predictions")

    out_dir = out_dir or os.path.join(exp_dir, "submission")
    if cfg.data.dataset == "semantic3d":
        from .data.datasets import Semantic3DDataset

        zpath = Semantic3DDataset.write_submission(out_dir, predictions)
        logger.info(f"submission zip: {zpath}")
        return zpath
    if cfg.data.dataset == "npm3d":
        from .data.datasets import NPM3DDataset

        files = NPM3DDataset.write_submission(out_dir, predictions)
        logger.info(f"submission files: {len(files)} in {out_dir}")
        return out_dir
    # datasets without an external benchmark: persist raw predictions
    os.makedirs(out_dir, exist_ok=True)
    for name, pred in predictions.items():
        np.save(os.path.join(out_dir, f"{name}_pred.npy"), pred)
    logger.info(f"saved raw predictions to {out_dir}")
    return out_dir


def calibrate(cfg, logger, max_clouds: int = 10):
    """Measure the dataset and print the static caps to put in the config —
    the reference's calibrate_batches/calibrate_neighbors
    (tensorflow/datasets/base.py:158-294) rerun as a host pass over sample
    clouds (see data/calibrate.py for the criterion)."""
    from .data.calibrate import (
        calibrate_crop_points,
        calibrate_neighborhood_limits,
    )

    ds = build_dataset(cfg, "train")
    clouds = [ds.room(i)[0] for i in range(min(ds.num_rooms, max_clouds))]

    n_points = calibrate_crop_points(
        clouds, cfg.data.in_radius, cfg.data.voxel_size,
        max_clouds=max_clouds,
    )
    logger.info(
        f"calibrated crop size (radius {cfg.data.in_radius} m, "
        f"90th pct, pow2): data.n_points={n_points}"
    )
    if cfg.model.arch == "convnet":
        nl = len(cfg.model.strides)
        radii = [cfg.model.base_radius * 2**i for i in range(nl)]
        cells = [cfg.data.voxel_size * 2**i for i in range(nl)]
        limits = calibrate_neighborhood_limits(
            clouds, radii, cells, max_clouds=max_clouds
        )
        logger.info(
            f"calibrated neighbor caps (80% untouched criterion): "
            f"model.neighborhood_limits={limits}"
        )
    return n_points


def check_pipeline(cfg, logger, num_batches: int = 8):
    """Input-pipeline check harness: runs the batch iterator standalone and
    reports timing + label/occupancy histograms (the reference's
    check_input_pipeline_* debug harnesses, e.g.
    tensorflow/datasets/tf_scannet_dataset.py:534-860)."""
    from .data import default_train_transform, make_batch_iterator

    ds = build_dataset(cfg, "train")
    it = make_batch_iterator(
        ds, cfg.optim.batch_size, cfg.data.n_points, seed=cfg.seed,
        transform=default_train_transform(), voxel_size=cfg.data.voxel_size,
        voxel_max=cfg.data.voxel_max,
    )
    t0 = time.time()
    label_counts = np.zeros(cfg.data.num_classes + 1, np.int64)
    dup_fracs, extents = [], []
    n = 0
    for i, batch in enumerate(it):
        if i >= num_batches:
            break
        n += 1
        lab = batch["labels"]
        np.add.at(label_counts, np.where(lab >= 0, lab, cfg.data.num_classes).ravel(), 1)
        for b in range(lab.shape[0]):
            src = batch["src_idx"][b]
            dup_fracs.append(1 - len(np.unique(src)) / len(src))
            extents.append(batch["points"][b].max(0) - batch["points"][b].min(0))
    dt = (time.time() - t0) / max(n, 1)
    logger.info(f"pipeline: {dt*1000:.0f} ms/batch (B={cfg.optim.batch_size}, "
                f"N={cfg.data.n_points})")
    logger.info(f"duplicate-pad fraction: mean {np.mean(dup_fracs):.3f} "
                f"max {np.max(dup_fracs):.3f}")
    ex = np.stack(extents)
    logger.info(f"crop extent (m): mean {ex.mean(0).round(2)} max {ex.max(0).round(2)}")
    total = label_counts.sum()
    hist = " ".join(f"{c}:{100*v/total:.1f}%" for c, v in enumerate(label_counts[:-1]))
    logger.info(f"label histogram: {hist} ignored:{100*label_counts[-1]/total:.1f}%")


def main(argv=None):
    parser = argparse.ArgumentParser(description="contrastboundary_tpu")
    parser.add_argument("-c", "--config", default="synthetic_tiny")
    parser.add_argument("--mode", default="train",
                        choices=["train", "val", "test", "check", "calibrate",
                                 "analyze"])
    parser.add_argument("--h5", default="",
                        help="analyze mode: saved val_*.h5 eval artifacts")
    parser.add_argument("--set", dest="sets", default=None,
                        help="overrides a.b:v;c.d:v")
    parser.add_argument("--cfg_file", default=None,
                        help="YAML update file merged over the -c preset "
                             "(reference config/utils.py:87-146); -c may "
                             "also be a .yaml path directly")
    parser.add_argument("--model_path", default="auto",
                        help="val mode: auto | best | <path>")
    parser.add_argument("--extra_ops", default="boundary-stat",
                        help="val mode extras: boundary | stat | feature "
                             "(per-stage latent boundary distances) | save (h5)")
    parser.add_argument("--exp_dir", default=None)
    parser.add_argument("--out_dir", default="",
                        help="test mode: submission output directory")
    parser.add_argument("--protocol", default="voting",
                        choices=["voting", "enumerate"],
                        help="val protocol: TF-style voting or the PT stack's "
                             "whole-scene voxel-duplicate enumeration")
    args = parser.parse_args(argv)

    from .config import load_config
    from .utils import setup_logger
    from .utils.cache import setup_compile_cache

    # fingerprint-keyed persistent compile cache + TPU flags (scoped-VMEM
    # limit for the fused attention kernel) — before the first device op
    setup_compile_cache()

    cfg = load_config(args.config, args.sets, cfg_file=args.cfg_file)
    exp_dir = args.exp_dir or os.path.join(
        cfg.save_path, cfg.data.dataset, cfg.name, time.strftime("Log_%m%d_%H%M%S")
    )
    if args.mode in ("val", "test") and args.exp_dir is None:
        raise SystemExit(f"--mode {args.mode} requires --exp_dir pointing at a train run")
    os.makedirs(exp_dir, exist_ok=True)
    logger = setup_logger(log_file=os.path.join(exp_dir, f"log_{args.mode}.txt"))
    logger.info(f"config {cfg.name}: heads={list(cfg.heads)} exp_dir={exp_dir}")

    from .parallel.distributed import maybe_initialize_distributed

    dist = maybe_initialize_distributed()
    if dist["process_count"] > 1:
        logger.info(
            f"distributed: process {dist['process_index']}/{dist['process_count']}"
        )

    np.random.seed(cfg.seed)
    if args.mode == "train":
        train(cfg, logger, exp_dir)
    elif args.mode == "check":
        check_pipeline(cfg, logger)
    elif args.mode == "calibrate":
        calibrate(cfg, logger)
    elif args.mode == "test":
        run_test(cfg, logger, exp_dir, args.model_path, args.out_dir)
    elif args.mode == "analyze":
        analyze(cfg, logger, args.h5, args.extra_ops)
    else:
        validate(cfg, logger, exp_dir, args.model_path, args.extra_ops,
                 protocol=args.protocol)


if __name__ == "__main__":
    main()
