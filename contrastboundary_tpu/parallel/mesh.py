"""Device mesh + sharding helpers.

TPU-native replacement for the reference's two data-parallel schemes — the TF
in-graph tower loop (tensorflow/utils/tf_graph_builder.py:58-95 +
average_gradients.py) and PyTorch DDP over NCCL (pytorch/tool/train.py:122-196):
a 1-D `jax.sharding.Mesh` over the `data` axis, batch arrays sharded on axis
0, parameters replicated. Gradient averaging, loss averaging and sync-BN all
fall out of XLA's partitioner — the `psum`s the reference implements by hand
are inserted by the compiler.

Multi-host: the same code runs under `jax.distributed.initialize()`; per-host
input pipelines feed `jax.make_array_from_process_local_data` with the same
NamedSharding (the reference's per-GPU `iter.get_next()` pattern, TPU-style).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Sharding for a batch-leading array: axis 0 over `data`, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put every leaf of a batch pytree with axis-0 sharded over the
    mesh's data axis."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )
