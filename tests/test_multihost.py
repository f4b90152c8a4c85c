"""Two-process CPU-mesh test of the multi-host data path.

Covers round-1 review item 8: `shard_batch` must assemble a GLOBAL sharded
array from per-process local shards via `jax.make_array_from_process_local_
data`, and a jitted computation over the global mesh must see every host's
data (SURVEY.md §2.5 multi-host mapping; the reference never tests
multi-node at all — §4.6)."""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.distributed.initialize(
    coordinator_address=sys.argv[1], num_processes=2, process_id=int(sys.argv[2])
)
import numpy as np
import jax.numpy as jnp
from contrastboundary_tpu.parallel import make_mesh, shard_batch

assert jax.process_count() == 2
assert len(jax.devices()) == 4  # 2 local CPU devices per process
mesh = make_mesh()
pid = jax.process_index()

# each process contributes its own 2-row slice of the global batch of 4
local = (np.arange(6, dtype=np.float32).reshape(2, 3) + 100.0 * pid)
batch = shard_batch(mesh, {"x": local})
assert batch["x"].shape == (4, 3), batch["x"].shape

total = float(jax.jit(jnp.sum)(batch["x"]))
expected = float(np.arange(6).sum() * 2 + 100.0 * 6)  # both hosts' data
assert abs(total - expected) < 1e-3, (total, expected)
print(f"process {pid}: global sum ok ({total})")
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_shard_batch():
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    paths = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in os.path.basename(os.path.normpath(p))]
    if REPO not in paths:
        paths.insert(0, REPO)
    env["PYTHONPATH"] = os.pathsep.join(paths)

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD, coord, str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert "global sum ok" in out


def test_sharded_train_step_hlo_only_allreduce_collectives():
    """DP-scaling lock-in (round-3 verdict weak #4): the compiled 8-device
    flagship train step must contain NO all-gather / all-to-all /
    collective-permute — per-cloud work is batch-local, so the only
    legitimate collectives are all-reduces (gradient psums, sync-BN stats,
    scalar metrics; the reference's only intended collective is the gradient
    average, tensorflow/utils/average_gradients.py:4-63). GSPMD likes to
    all-gather per-cloud argsorts/gathers under batch sharding — this test
    would have caught the round-2 advisor's deadlocking all-gather class, and
    guards multi-chip throughput from silently cratering."""
    import re

    import jax
    import numpy as np

    import __graft_entry__ as ge
    from contrastboundary_tpu.ops import build_pyramid
    from contrastboundary_tpu.parallel import (
        make_mesh,
        replicated_sharding,
        shard_batch,
    )
    from contrastboundary_tpu.train import (
        TrainStepConfig,
        create_train_state,
        make_train_step,
    )
    from contrastboundary_tpu.train.state import make_optimizer

    mesh = make_mesh(jax.devices()[:8])
    model, spec, ccfg = ge._flagship(256, tiny=True)
    cfg = TrainStepConfig(num_classes=13, spec=spec, contrast=ccfg)
    rng = np.random.RandomState(0)
    b, n = 8, 256
    batch = {
        "points": rng.rand(b, n, 3).astype(np.float32),
        "features": rng.rand(b, n, 3).astype(np.float32),
        "labels": rng.randint(0, 13, (b, n)).astype(np.int32),
    }
    batch = shard_batch(mesh, batch)
    pyr = build_pyramid(batch["points"], spec)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["features"], pyr, train=True
    )
    state = create_train_state(variables, make_optimizer(0.01))
    state = jax.device_put(state, replicated_sharding(mesh))

    step = make_train_step(model, cfg)
    txt = step.lower(state, batch).compile().as_text()
    pat = re.compile(r"\b(all-gather|all-to-all|collective-permute)\b")
    bad = [ln.strip() for ln in txt.splitlines() if pat.search(ln)]
    assert not bad, (
        f"{len(bad)} forbidden cross-device collectives in the compiled "
        f"step; first: {bad[0][:300]}"
    )
    # the gradient psums must be there (this IS a multi-device executable)
    assert "all-reduce" in txt
