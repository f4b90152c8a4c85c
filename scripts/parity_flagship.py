"""Flagship-scale, paper-protocol parity experiment (round-3 VERDICT #4).

Seed-paired arms at the REAL preset shape (B=1 x N=65536 crops, flagship
planes 32..512 bf16, voxel_max 80000):

  fast : layout='sorted', sampler='strided', window-restricted contrast KNN
         (the s3dis_pt_cbl production fast path)
  paper: layout='natural', sampler='bucket_fps', dense contrast KNN
         (the s3dis_pt_cbl_paper protocol)

Both train on identical synthetic rooms (64 x 120k pts) with identical
seeds and schedules, then evaluate with the PAPER protocol: 20 vote
rounds, smoothing 0.95 (tensorflow/config/s3dis.py:52, utils/tester.py:106)
on a 16-room val split, plus the boundary B-IoU.

Because the paper arm uses DENSE full-recall contrast neighbors, a null
accuracy delta also resolves VERDICT weak-#8 (the fast path's 0.87
level-0 contrast-window recall) at flagship scale.

Usage: python scripts/parity_flagship.py <seed> <arm fast|paper>
Appends one JSON line to results/parity_r3.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from contrastboundary_tpu.utils.cache import setup_compile_cache
setup_compile_cache()

from contrastboundary_tpu.data import SyntheticSceneDataset, make_batch_iterator
from contrastboundary_tpu.data.transforms import default_train_transform
from contrastboundary_tpu.data.prefetch import prefetch
from contrastboundary_tpu.eval.boundary import BoundaryEvaluator
from contrastboundary_tpu.eval.voting import VotingEvaluator
from contrastboundary_tpu.losses.contrast import ContrastConfig
from contrastboundary_tpu.models import PointTransformerSeg
from contrastboundary_tpu.ops import PyramidSpec
from contrastboundary_tpu.train import (
    TrainStepConfig, create_train_state, make_train_step, make_eval_step,
)
from contrastboundary_tpu.train.state import make_optimizer
from contrastboundary_tpu.train.schedule import multistep_epoch_decay

TRAIN_ROOMS, VAL_ROOMS, PTS = 64, 16, 120_000
N_POINTS, VOXEL_MAX = 65536, 80000
EPOCHS, LOOP, BATCH = 15, 2, 1
NUM_CLASSES = 13


def build(arm: str, seed: int):
    if arm == "fast":
        spec = PyramidSpec(
            k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
            layout="sorted", sampler="strided",
        )
    elif arm == "fast_w2":
        # fast path with doubled tile windows (self + contrast): the recall
        # lever for the flagship-scale deficit (ABLATION round 3)
        spec = PyramidSpec(
            k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
            layout="sorted", sampler="strided",
            self_window=2, contrast_window=2,
        )
    else:
        spec = PyramidSpec(
            k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
            layout="natural", sampler="bucket_fps",
        )
    model = PointTransformerSeg(num_classes=NUM_CLASSES, dtype=jnp.bfloat16)
    cfg = TrainStepConfig(
        num_classes=NUM_CLASSES, spec=spec, contrast=ContrastConfig()
    )
    return model, spec, cfg


def main(seed: int, arm: str):
    t_start = time.time()
    model, spec, cfg = build(arm, seed)
    train_ds = SyntheticSceneDataset(
        num_rooms=TRAIN_ROOMS, points_per_room=PTS, seed=seed, split="train",
        loop=LOOP,
    )
    steps_per_epoch = len(train_ds) // BATCH
    lr = multistep_epoch_decay(
        0.5, [0.6 * EPOCHS, 0.8 * EPOCHS], 0.1, steps_per_epoch
    )
    tx = make_optimizer(lr, momentum=0.9, weight_decay=1e-4)

    rng = np.random.RandomState(seed)
    pts0 = jnp.asarray(rng.rand(BATCH, N_POINTS, 3).astype(np.float32) * 4)
    f0 = jnp.asarray(rng.rand(BATCH, N_POINTS, 3).astype(np.float32))
    from contrastboundary_tpu.ops import build_pyramid

    pyr0 = build_pyramid(pts0, spec)
    feats0 = f0
    if pyr0.order0 is not None:
        feats0 = jnp.take_along_axis(f0, pyr0.order0[..., None], 1)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(seed), feats0, pyr0, train=True
    )
    state = create_train_state(variables, tx)
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
        print(
            f"[{arm} s{seed}] epoch {epoch}: loss {lv:.4f} "
            f"({time.time()-t0:.0f}s)", flush=True,
        )

    # ---- paper-protocol eval: 20 votes, smooth 0.95, 16-room val ----
    val_ds = SyntheticSceneDataset(
        num_rooms=VAL_ROOMS, points_per_room=PTS, seed=seed, split="val",
    )
    eval_step = make_eval_step(model, cfg)

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
        voxel_size=0.04, num_votes=20.0, smooth=0.95, seed=seed,
    )
    m = ev.run(progress=lambda s, p: print(
        f"[{arm} s{seed}] vote step {s}, min_pot {p:.2f}", flush=True
    ) if s % 20 == 0 else None)

    bev = BoundaryEvaluator(NUM_CLASSES, radius=0.1)
    for cs in ev.clouds:
        bev.add_cloud(cs.coord, cs.label.astype(np.int64), cs.probs)
    br = bev.results()

    rec = {
        "arm": arm,
        "seed": seed,
        "epochs": EPOCHS,
        "train_rooms": TRAIN_ROOMS,
        "val_rooms": VAL_ROOMS,
        "n_points": N_POINTS,
        "voxel_max": VOXEL_MAX,
        "sub_mIoU": m["sub"]["mIoU"],
        "full_mIoU": m["full"]["mIoU"],
        "full_OA": m["full"]["OA"],
        "full_mACC": m["full"]["mACC"],
        "B_IoU": br["B-IoU"],
        "bound_mIoU": br["conf_bound_label"]["mIoU"],
        "minutes": round((time.time() - t_start) / 60, 1),
    }
    os.makedirs("results", exist_ok=True)
    with open("results/parity_r3.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
