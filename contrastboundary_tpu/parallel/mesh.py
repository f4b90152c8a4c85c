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
    """Shard every leaf of a batch pytree with axis-0 over the mesh's data
    axis.

    Single process: a plain device_put. Multi-process (after
    `jax.distributed.initialize`): each process holds only ITS slice of the
    global batch — `jax.make_array_from_process_local_data` assembles the
    global sharded array from the per-host shards (the per-host input
    pipelines from data/s3dis.py::make_batch_iterator shard_index/num_shards;
    the reference's per-GPU `iter.get_next()`, tensorflow/datasets/
    base.py:112-114, lifted to hosts)."""
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                batch_sharding(mesh, np.ndim(x)), np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )
