"""Learning-rate schedules, per-step, parameterized by epoch boundaries.

Reference parity:
  exponential per-epoch decay with floor — tensorflow/utils/scheduler.py:19-55
  (ConvNet: 0.01 × 0.9885531^epoch);
  multistep — pytorch/tool/train.py:162-165 (point-transformer: 0.5, ×0.1 at
  epochs {120, 160} of 200 — i.e. at 0.6/0.8 of training).
"""
from __future__ import annotations

from typing import Sequence

import optax


def exponential_epoch_decay(
    base_lr: float,
    decay_per_epoch: float,
    steps_per_epoch: int,
    min_lr: float = 0.0,
) -> optax.Schedule:
    sched = optax.exponential_decay(
        init_value=base_lr,
        transition_steps=steps_per_epoch,
        decay_rate=decay_per_epoch,
        staircase=True,
        end_value=min_lr if min_lr > 0 else None,
    )
    return sched


def multistep_epoch_decay(
    base_lr: float,
    milestones_epochs: Sequence[int],
    multiplier: float,
    steps_per_epoch: int,
) -> optax.Schedule:
    boundaries = {
        int(e * steps_per_epoch): multiplier for e in milestones_epochs
    }
    return optax.piecewise_constant_schedule(base_lr, boundaries)
