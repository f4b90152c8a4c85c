import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from contrastboundary_tpu.train.checkpoint import CheckpointManager
from contrastboundary_tpu.train.state import TrainState, make_optimizer, create_train_state


def make_state(seed=0):
    rng = np.random.RandomState(seed)
    variables = {
        "params": {
            "dense": {"kernel": jnp.asarray(rng.randn(4, 4), jnp.float32)},
            "head": {"bias": jnp.asarray(rng.randn(4), jnp.float32)},
        },
        "batch_stats": {"bn": {"mean": jnp.zeros(4)}},
    }
    tx = make_optimizer(0.1, momentum=0.9, weight_decay=0.0)
    return create_train_state(variables, tx)


def test_save_restore_roundtrip(tmp_path):
    ckpt = CheckpointManager(str(tmp_path))
    state = make_state(0)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    ckpt.save(7, state, best=True)

    fresh = make_state(1)
    restored, skipped = ckpt.restore(fresh, "auto")
    assert int(restored.step) == 7
    np.testing.assert_allclose(
        restored.params["dense"]["kernel"], state.params["dense"]["kernel"]
    )
    assert not skipped

    best, _ = ckpt.restore(make_state(2), "best")
    assert int(best.step) == 7


def test_partial_restore_select_except(tmp_path):
    ckpt = CheckpointManager(str(tmp_path))
    state = make_state(0)
    ckpt.save(1, state)
    fresh = make_state(1)
    restored, skipped = ckpt.restore(fresh, "auto", except_=[r"head"])
    np.testing.assert_allclose(
        restored.params["dense"]["kernel"], state.params["dense"]["kernel"]
    )
    np.testing.assert_allclose(
        restored.params["head"]["bias"], fresh.params["head"]["bias"]
    )
    assert any("head" in s for s in skipped)


def test_gc_keeps_best(tmp_path):
    ckpt = CheckpointManager(str(tmp_path), max_to_keep=2)
    state = make_state(0)
    ckpt.save(1, state, best=True)
    for s in [2, 3, 4, 5]:
        ckpt.save(s, state)
    steps = ckpt.steps()
    assert 1 in steps  # best survives gc
    assert len(steps) <= 3
    assert ckpt.resolve("auto").endswith("snap-5")
    assert ckpt.resolve("best").endswith("snap-1")


def test_find_best_snapshot_across_runs(tmp_path):
    """Cross-run 'best' discovery (reference get_best_val_snap,
    tensorflow/config/utils.py:280-310): the globally best snapshot across
    Log_* runs of one experiment dir wins."""
    import json

    from contrastboundary_tpu.train.checkpoint import find_best_snapshot

    exp = tmp_path / "exp"
    for run, step, miou in [
        ("Log_0101_000000", 100, 0.41),
        ("Log_0102_000000", 250, 0.57),
        ("Log_0103_000000", 80, 0.49),
    ]:
        ck = exp / run / "checkpoints"
        (ck / f"snap-{step}").mkdir(parents=True)
        (ck / "best.json").write_text(json.dumps({"step": step, "mIoU": miou}))

    hit = find_best_snapshot(str(exp))
    assert hit is not None
    assert hit["step"] == 250 and hit["mIoU"] == 0.57
    assert hit["path"].endswith("Log_0102_000000/checkpoints/snap-250")

    # a marker whose snapshot dir is gone is skipped
    import shutil

    shutil.rmtree(exp / "Log_0102_000000" / "checkpoints" / "snap-250")
    hit = find_best_snapshot(str(exp))
    assert hit["step"] == 80 and hit["mIoU"] == 0.49

    # legacy marker without mIoU still resolves when it is the only run
    solo = tmp_path / "solo" / "Log_x"
    (solo / "checkpoints" / "snap-7").mkdir(parents=True)
    (solo / "checkpoints" / "best.json").write_text(json.dumps({"step": 7}))
    hit = find_best_snapshot(str(tmp_path / "solo"))
    assert hit["step"] == 7

    # empty experiment dir → None
    assert find_best_snapshot(str(tmp_path / "nothing")) is None
