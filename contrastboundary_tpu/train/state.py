"""Train state: params + BN running stats + optimizer state.

The optimizer matches the reference recipes:
  point-transformer — SGD momentum 0.9, coupled weight decay 1e-4
  (pytorch/tool/train.py:156-161);
  ConvNet — SGD momentum 0.98, grad-clip-by-norm 100, L2 via loss collection
  (tensorflow/config/s3dis.py:25-38, utils/average_gradients.py:30).
Coupled decay (`optax.add_decayed_weights`) is torch's `weight_decay`
semantics; AdamW (the TF stack's decoupled AdamWOptimizer.py) is available
via `optimizer='adamw'`.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt,
        )


def make_optimizer(
    learning_rate,
    optimizer: str = "sgd",
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    grad_clip_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if optimizer == "sgd":
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=False))
        chain.append(optax.scale_by_learning_rate(learning_rate))
    elif optimizer == "adamw":
        chain.append(optax.scale_by_adam())
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale_by_learning_rate(learning_rate))
    elif optimizer == "adam":
        chain.append(optax.scale_by_adam())
        chain.append(optax.scale_by_learning_rate(learning_rate))
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    return optax.chain(*chain)


def create_train_state(variables, tx) -> TrainState:
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
