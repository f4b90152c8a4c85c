"""Checkpoint-controlled fast-vs-paper parity (round-4 VERDICT item 3).

The round-3 seed-pair experiment could not bound the fast-path deficit below
the ±4 mIoU seed noise. This script removes the training noise entirely:
train ONE model, then evaluate the SAME checkpoint under both pyramid
protocols (fast = sorted layout + windowed KNN + strided sampler; paper =
natural layout + dense KNN + bucket_fps). The params/batch_stats trees are
layout-independent, so any checkpoint evaluates under any spec; with
identical vote seeds the paired eval delta isolates the *search-recall*
effect from the *training-dynamics* effect (which only seed pairs can see).

Reference protocol constants: tensorflow/config/s3dis.py:52 (20 votes),
utils/tester.py:106 (smooth 0.95).

Usage:
  python scripts/parity_ckpt.py train <seed> <arm>     # train + save ckpt
  python scripts/parity_ckpt.py eval  <seed> <train_arm> <eval_arm>
Appends JSON lines to results/parity_ckpt.jsonl; ckpts in results/ckpts/.
"""
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp

from contrastboundary_tpu.utils.cache import setup_compile_cache

setup_compile_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from contrastboundary_tpu.data import SyntheticSceneDataset, make_batch_iterator
from contrastboundary_tpu.data.prefetch import prefetch
from contrastboundary_tpu.data.transforms import default_train_transform
from contrastboundary_tpu.eval.boundary import BoundaryEvaluator
from contrastboundary_tpu.eval.voting import VotingEvaluator
from contrastboundary_tpu.losses.contrast import ContrastConfig
from contrastboundary_tpu.models import PointTransformerSeg
from contrastboundary_tpu.ops import PyramidSpec, build_pyramid
from contrastboundary_tpu.train import (
    TrainStepConfig, create_train_state, make_eval_step, make_train_step,
)
from contrastboundary_tpu.train.schedule import multistep_epoch_decay
from contrastboundary_tpu.train.state import make_optimizer

TRAIN_ROOMS, VAL_ROOMS, PTS = 64, 16, 120_000
N_POINTS, VOXEL_MAX = 65536, 80000
EPOCHS = int(os.environ.get("PARITY_EPOCHS", "15"))
# paper protocol = 20 votes (tensorflow/config/s3dis.py:52); a reduced
# paired budget stays decision-grade for fast-vs-paper DELTAS as long as
# both arms share it (identical vote seeds), and cuts eval wall-clock ~4x
VOTES = float(os.environ.get("PARITY_VOTES", "20"))
LOOP, BATCH = 2, 1
NUM_CLASSES = 13
CKPT_DIR = "results/ckpts"


def build(arm: str):
    """arm → (spec, bn_mode). 'fast_stale' is the round-4 production
    candidate: fast pyramid + StaleBatchNorm. The arm answers the BN-
    SEMANTICS accuracy question, so the fused attention kernel is forced
    off (its numerics are covered by interpret-mode parity tests, and the
    combined train-step module 500'd in the remote Mosaic helper at this
    shape on 2026-08-20 — probe-passes/combined-fails class, PERF.md)."""
    if arm == "fast_stale":
        os.environ.setdefault("PT_ATTN", "off")
    if arm == "fast_bnbf16":
        # round-5 continuation: BN compute/output in the block dtype (bf16)
        # — the measured −4.2 ms step knob (scripts/ab_bn_dtype.py). Train
        # with it, eval under the plain 'fast' arm (BN f32): the seed-paired
        # delta vs the existing fast cell isolates the training-dynamics
        # effect of bf16 BN activations.
        os.environ["BN_COMPUTE"] = "model"
    if arm in ("fast", "fast_stale", "fast_bnbf16"):
        spec = PyramidSpec(
            k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
            layout="sorted", sampler="strided",
        )
    elif arm == "paper":
        spec = PyramidSpec(
            k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
            layout="natural", sampler="bucket_fps",
        )
    else:
        raise ValueError(arm)
    bn_mode = "stale" if arm == "fast_stale" else "batch"
    return spec, bn_mode


def make_model_state(arm: str, seed: int):
    spec, bn_mode = build(arm)
    model = PointTransformerSeg(
        num_classes=NUM_CLASSES, dtype=jnp.bfloat16, bn_mode=bn_mode
    )
    cfg = TrainStepConfig(
        num_classes=NUM_CLASSES, spec=spec, contrast=ContrastConfig()
    )
    rng = np.random.RandomState(seed)
    pts0 = jnp.asarray(rng.rand(BATCH, N_POINTS, 3).astype(np.float32) * 4)
    f0 = jnp.asarray(rng.rand(BATCH, N_POINTS, 3).astype(np.float32))
    pyr0 = build_pyramid(pts0, spec)
    feats0 = f0
    if pyr0.order0 is not None:
        feats0 = jnp.take_along_axis(f0, pyr0.order0[..., None], 1)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(seed), feats0, pyr0, train=True
    )
    return model, spec, cfg, variables


def ckpt_path(seed: int, arm: str) -> str:
    return os.path.join(CKPT_DIR, f"parity_s{seed}_{arm}_e{EPOCHS}.pkl")


def train(seed: int, arm: str):
    t_start = time.time()
    model, spec, cfg, variables = make_model_state(arm, seed)
    train_ds = SyntheticSceneDataset(
        num_rooms=TRAIN_ROOMS, points_per_room=PTS, seed=seed, split="train",
        loop=LOOP,
    )
    steps_per_epoch = len(train_ds) // BATCH
    lr = multistep_epoch_decay(
        0.5, [0.6 * EPOCHS, 0.8 * EPOCHS], 0.1, steps_per_epoch
    )
    clip = os.environ.get("PARITY_CLIP", "")
    state = create_train_state(
        variables,
        make_optimizer(lr, momentum=0.9, weight_decay=1e-4,
                       grad_clip_norm=float(clip) if clip else None),
    )
    if clip:
        print(f"[train {arm} s{seed}] grad clip {clip} (PARITY_CLIP)",
              flush=True)
    train_step = make_train_step(model, cfg)
    transform = default_train_transform()
    for epoch in range(EPOCHS):
        t0 = time.time()
        it = prefetch(
            lambda epoch=epoch: make_batch_iterator(
                train_ds, BATCH, N_POINTS, seed=seed, epoch=epoch,
                transform=transform, voxel_size=0.04, voxel_max=VOXEL_MAX,
            ),
            depth=3,
        )
        losses = []
        for batch in it:
            batch.pop("src_idx"), batch.pop("room_idx")
            state, metrics = train_step(
                state, {k: jnp.asarray(v) for k, v in batch.items()}
            )
            losses.append(metrics["loss"])
        lv = float(jnp.mean(jnp.stack([jnp.asarray(l) for l in losses])))
        print(f"[train {arm} s{seed}] epoch {epoch}: loss {lv:.4f} "
              f"({time.time()-t0:.0f}s)", flush=True)
        if not np.isfinite(lv):
            # round-5 sentinel: halt the arm at the first non-finite epoch
            # mean — never let a diverged run reach the checkpoint save
            # (round-4 postmortem: seed-1 fast saved a 99.8%-NaN pickle).
            raise FloatingPointError(
                f"[train {arm} s{seed}] non-finite epoch-{epoch} loss; "
                "arm aborted (see scripts/nan_bisect.py for root-causing)"
            )
    from contrastboundary_tpu.train.debug import tree_finite

    if not (tree_finite(state.params) and tree_finite(state.batch_stats)):
        raise FloatingPointError(
            f"[train {arm} s{seed}] non-finite weights at save time; "
            "refusing to write checkpoint"
        )
    os.makedirs(CKPT_DIR, exist_ok=True)
    with open(ckpt_path(seed, arm), "wb") as f:
        pickle.dump(
            jax.device_get({"params": state.params,
                            "batch_stats": state.batch_stats}), f,
        )
    print(f"saved {ckpt_path(seed, arm)} "
          f"({(time.time()-t_start)/60:.1f} min)", flush=True)


def evaluate(seed: int, train_arm: str, eval_arm: str):
    t_start = time.time()
    with open(ckpt_path(seed, train_arm), "rb") as f:
        ck = pickle.load(f)
    model, spec, cfg, variables = make_model_state(eval_arm, seed)
    state = create_train_state(
        {"params": ck["params"], "batch_stats": ck["batch_stats"]},
        make_optimizer(0.0),
    )
    eval_step = make_eval_step(model, cfg)
    val_ds = SyntheticSceneDataset(
        num_rooms=VAL_ROOMS, points_per_room=PTS, seed=seed, split="val",
    )

    def predict(batch):
        b = {
            "points": jnp.asarray(batch["points"]),
            "features": jnp.asarray(batch["features"]),
            "labels": jnp.zeros(batch["points"].shape[:2], jnp.int32),
        }
        probs, _ = eval_step(state, b)
        return jax.device_get(probs)

    ev = VotingEvaluator(
        val_ds, predict, NUM_CLASSES, N_POINTS, batch_size=2,
        voxel_size=0.04, num_votes=VOTES, smooth=0.95, seed=seed,
    )
    m = ev.run(progress=lambda s, p: print(
        f"[eval {train_arm}->{eval_arm} s{seed}] vote {s}, pot {p:.2f}",
        flush=True,
    ) if s % 20 == 0 else None)
    bev = BoundaryEvaluator(NUM_CLASSES, radius=0.1)
    for cs in ev.clouds:
        bev.add_cloud(cs.coord, cs.label.astype(np.int64), cs.probs)
    br = bev.results()
    rec = {
        "train_arm": train_arm,
        "eval_arm": eval_arm,
        "seed": seed,
        "epochs": EPOCHS,
        "votes": VOTES,
        "sub_mIoU": m["sub"]["mIoU"],
        "full_mIoU": m["full"]["mIoU"],
        "full_OA": m["full"]["OA"],
        "full_mACC": m["full"]["mACC"],
        "B_IoU": br["B-IoU"],
        "bound_mIoU": br["conf_bound_label"]["mIoU"],
        "minutes": round((time.time() - t_start) / 60, 1),
    }
    os.makedirs("results", exist_ok=True)
    with open("results/parity_ckpt.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "train":
        train(int(sys.argv[2]), sys.argv[3])
    else:
        evaluate(int(sys.argv[2]), sys.argv[3], sys.argv[4])
