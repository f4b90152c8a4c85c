"""Named presets mirroring the reference's published configs.

Reference sources:
  pytorch/config/s3dis/origin_multi-Ua-concat-latent_contrast-Ua-softnn-
  latent-label-l2-w.1.yaml — the 71.6-mIoU flagship (voxel 0.04, voxel_max
  80000, batch 16, lr 0.5 multistep ×0.1 @ {0.6, 0.8}·epochs, 200 epochs,
  contrast nsample [36,24,24,24,24]);
  tensorflow/config/s3dis.py:16-96 — ConvNet recipe (600 epochs, SGD m=0.98,
  lr 0.01 × 0.9885531^epoch, grad clip 100).
"""
from .base import register_config

# flagship: point-transformer + CBL on S3DIS
register_config(
    "s3dis_pt_cbl",
    data={"dataset": "s3dis", "voxel_size": 0.04, "voxel_max": 80000,
          "n_points": 65536, "loop": 30, "num_classes": 13},
    optim={"base_lr": 0.5, "momentum": 0.9, "weight_decay": 1e-4,
           "schedule": "multistep", "milestones": (0.6, 0.8),
           "multiplier": 0.1, "epochs": 200, "batch_size": 16},
    arch_out="multi-Ua-concat-latent|contrast-Ua-softnn-latent-label-l2-w.1",
)

# baseline without CBL (origin_4gpu.yaml)
register_config(
    "s3dis_pt",
    data={"dataset": "s3dis", "voxel_size": 0.04, "voxel_max": 80000,
          "n_points": 65536, "loop": 30, "num_classes": 13},
    optim={"base_lr": 0.5, "momentum": 0.9, "weight_decay": 1e-4,
           "schedule": "multistep", "milestones": (0.6, 0.8),
           "multiplier": 0.1, "epochs": 200, "batch_size": 16},
    arch_out="",
)

# kl posmask variant (ConvNet table row 'CBL(kl)'; here on the PT backbone)
register_config(
    "s3dis_pt_cbl_kl",
    data={"dataset": "s3dis", "voxel_size": 0.04, "voxel_max": 80000,
          "n_points": 65536, "loop": 30, "num_classes": 13},
    optim={"base_lr": 0.5, "momentum": 0.9, "weight_decay": 1e-4,
           "schedule": "multistep", "milestones": (0.6, 0.8),
           "multiplier": 0.1, "epochs": 200, "batch_size": 16},
    arch_out="multi-Ua-concat-latent|contrast-Ua-softnn-latent-labelkl.5-l2-w.1",
)

# synthetic smoke/convergence configs (no S3DIS download needed)
register_config(
    "synthetic_tiny",
    data={"dataset": "synthetic", "num_rooms": 8, "points_per_room": 40000,
          "voxel_size": 0.06, "voxel_max": 4096, "n_points": 4096,
          "loop": 4, "num_classes": 13},
    model={"planes": (16, 32, 64, 128, 256), "blocks": (2, 2, 2, 2, 2),
           "base_fdim": 16},
    optim={"base_lr": 0.1, "epochs": 10, "batch_size": 4},
    eval={"num_votes": 1.0, "batch_size": 4},
    log_freq=5,
)

register_config(
    "synthetic_full",
    data={"dataset": "synthetic", "num_rooms": 16, "points_per_room": 120000,
          "voxel_size": 0.04, "voxel_max": 16384, "n_points": 16384,
          "loop": 8, "num_classes": 13},
    optim={"base_lr": 0.5, "epochs": 30, "batch_size": 4},
    eval={"num_votes": 2.0},
)

register_config("default", data={"dataset": "synthetic"})
