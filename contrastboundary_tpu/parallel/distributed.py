"""Multi-host initialization hook.

The reference's multi-process story is torch DDP on one host
(pytorch/tool/train.py:122-141). The TPU-native multi-host path is
`jax.distributed.initialize()` + per-host input shards
(data/s3dis.py::make_batch_iterator shard_index/num_shards) feeding the same
data-sharded jit — DCN handles the cross-host collectives.

Call `maybe_initialize_distributed()` once at program start; it is a no-op
unless a coordinator is configured (env `CBL_COORDINATOR`, or running under
a TPU pod runtime where `jax.distributed.initialize()` auto-detects).
"""
from __future__ import annotations

import os


def maybe_initialize_distributed() -> dict:
    """Returns {'process_index', 'process_count'} after (possibly no-op)
    initialization."""
    import jax

    coord = os.environ.get("CBL_COORDINATOR", "")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["CBL_NUM_PROCESSES"]),
            process_id=int(os.environ["CBL_PROCESS_ID"]),
        )
    elif os.environ.get("CBL_AUTO_DISTRIBUTED", ""):
        jax.distributed.initialize()
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }
