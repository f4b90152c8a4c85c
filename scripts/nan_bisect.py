"""NaN root-cause harness (round-5 VERDICT item 1).

The round-4 parity campaign's seed-1 `fast` arm (sorted layout + strided
sampler + windowed KNN + bf16, lr 0.5, B=1, no grad clip) produced a
checkpoint that is 99.8% NaN — silently.  This script re-runs a parity
training arm with per-STEP instrumentation (loss, grad global norm, param
global norm via `TrainStepConfig.debug_metrics`), appends one JSON line per
step to `results/nan_bisect_<tag>.jsonl`, and halts at the first non-finite
loss/grad, dumping the pre-update state + offending batch for postmortem.

Bisection deltas are env-driven so each arm is one process (compile cache
makes re-runs cheap):
    DTYPE=float32|bfloat16   model compute dtype        (default bfloat16)
    CLIP=<float>             optax.clip_by_global_norm  (default off)
    LR=<float>               base learning rate         (default 0.5)
    SAMPLER=strided|bucket_fps, LAYOUT=sorted|natural   (default per arm)
    PARITY_EPOCHS=<int>                                 (default 15)

Reference recipe notes: the PT recipe has NO grad clip
(pytorch/tool/train.py:156-161); the TF ConvNet recipe clips at 100
(tensorflow/config/s3dis.py:38).

Usage: python scripts/nan_bisect.py <seed> <arm> <tag>
"""
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from contrastboundary_tpu.utils.cache import setup_compile_cache

setup_compile_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

from contrastboundary_tpu.data import SyntheticSceneDataset, make_batch_iterator
from contrastboundary_tpu.data.prefetch import prefetch
from contrastboundary_tpu.data.transforms import default_train_transform
from contrastboundary_tpu.losses.contrast import ContrastConfig
from contrastboundary_tpu.models import PointTransformerSeg
from contrastboundary_tpu.ops import PyramidSpec, build_pyramid
from contrastboundary_tpu.train import (
    TrainStepConfig, create_train_state, make_train_step,
)
from contrastboundary_tpu.train.schedule import multistep_epoch_decay
from contrastboundary_tpu.train.state import make_optimizer

TRAIN_ROOMS, PTS = 64, 120_000
N_POINTS, VOXEL_MAX = 65536, 80000
EPOCHS = int(os.environ.get("PARITY_EPOCHS", "15"))
LOOP, BATCH = 2, 1
NUM_CLASSES = 13


def main(seed: int, arm: str, tag: str):
    if arm == "fast":
        layout, sampler = "sorted", "strided"
    elif arm == "paper":
        layout, sampler = "natural", "bucket_fps"
    else:
        raise ValueError(arm)
    layout = os.environ.get("LAYOUT", layout)
    sampler = os.environ.get("SAMPLER", sampler)
    dtype = jnp.dtype(os.environ.get("DTYPE", "bfloat16"))
    clip = os.environ.get("CLIP", "")
    clip = float(clip) if clip else None
    lr0 = float(os.environ.get("LR", "0.5"))

    spec = PyramidSpec(
        k_contrast=(36, 24, 24, 24, 24), with_subscene=True,
        layout=layout, sampler=sampler,
    )
    model = PointTransformerSeg(num_classes=NUM_CLASSES, dtype=dtype)
    cfg = TrainStepConfig(
        num_classes=NUM_CLASSES, spec=spec, contrast=ContrastConfig(),
        debug_metrics=True,
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

    train_ds = SyntheticSceneDataset(
        num_rooms=TRAIN_ROOMS, points_per_room=PTS, seed=seed, split="train",
        loop=LOOP,
    )
    steps_per_epoch = len(train_ds) // BATCH
    lr = multistep_epoch_decay(
        lr0, [0.6 * EPOCHS, 0.8 * EPOCHS], 0.1, steps_per_epoch
    )
    state = create_train_state(
        variables,
        make_optimizer(lr, momentum=0.9, weight_decay=1e-4,
                       grad_clip_norm=clip),
    )
    train_step = make_train_step(model, cfg)
    transform = default_train_transform()

    out_path = f"results/nan_bisect_{tag}.jsonl"
    os.makedirs("results", exist_ok=True)
    meta = dict(seed=seed, arm=arm, layout=layout, sampler=sampler,
                dtype=str(dtype), clip=clip, lr=lr0, epochs=EPOCHS)
    with open(out_path, "a") as f:
        f.write(json.dumps({"meta": meta}) + "\n")
    print(json.dumps(meta), flush=True)

    gstep = 0
    t_start = time.time()
    for epoch in range(EPOCHS):
        it = prefetch(
            lambda epoch=epoch: make_batch_iterator(
                train_ds, BATCH, N_POINTS, seed=seed, epoch=epoch,
                transform=transform, voxel_size=0.04, voxel_max=VOXEL_MAX,
            ),
            depth=3,
        )
        log = open(out_path, "a")
        for batch in it:
            batch.pop("src_idx"), batch.pop("room_idx")
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            prev_state = state
            state, metrics = train_step(state, jb)
            rec = {
                "epoch": epoch, "step": gstep,
                "loss": float(metrics["loss"]),
                "ce": float(metrics["ce"]),
                "cbl": float(metrics.get("cbl", 0.0)),
                "grad_norm": float(metrics["grad_norm"]),
                "param_norm": float(metrics["param_norm"]),
            }
            log.write(json.dumps(rec) + "\n")
            if not all(np.isfinite(v) for v in rec.values()):
                log.flush()
                dump = f"results/nan_bisect_{tag}_dump.pkl"
                with open(dump, "wb") as f:
                    pickle.dump({
                        "rec": rec,
                        "batch": {k: np.asarray(v) for k, v in batch.items()},
                        "params": jax.device_get(prev_state.params),
                        "batch_stats": jax.device_get(prev_state.batch_stats),
                    }, f)
                print(f"NON-FINITE at {rec} -> dumped {dump}", flush=True)
                return
            gstep += 1
        log.close()
        with open(out_path) as f:
            lines = [json.loads(l) for l in f if "loss" in l]
        ep = [l for l in lines if l["epoch"] == epoch]
        print(
            f"[{tag}] epoch {epoch}: loss {np.mean([l['loss'] for l in ep]):.4f} "
            f"gnorm max {max(l['grad_norm'] for l in ep):.1f} "
            f"pnorm {ep[-1]['param_norm']:.1f} "
            f"({time.time()-t_start:.0f}s)", flush=True)
    print(f"[{tag}] FINISHED CLEAN ({(time.time()-t_start)/60:.1f} min)",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], sys.argv[3])
