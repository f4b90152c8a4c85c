"""Checkpointing: periodic + best snapshots, partial restore with regex
select/except patterns, latest/best discovery.

Reference behaviors kept (SURVEY.md §5): `snap-<step>` every save_freq +
`snap-best` on best validation mIoU (tensorflow/utils/trainer.py:121-127);
name-matched partial restore with regex select/except lists and leftover
reporting (tensorflow/utils/tf_utils.py:5-91); `auto`/`best` snapshot
discovery (config/utils.py:280-310). Storage is orbax.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional, Sequence

import jax
import orbax.checkpoint as ocp


def find_best_snapshot(exp_dir: str) -> Optional[dict]:
    """Globally best snapshot across the runs of an experiment directory —
    the reference's `get_best_val_snap` (tensorflow/config/utils.py:280-310),
    which parses every run's `log_train.txt` for its best validation mIoU
    and returns the winning snapshot. Here each run records its best in
    `checkpoints/best.json` at save time; this scans the experiment dir's
    `Log_*` runs (plus `exp_dir` itself if it is a run dir) and returns
    {'path', 'step', 'mIoU', 'run'} for the highest recorded mIoU, or None.
    Markers without a recorded mIoU rank lowest but still count (so a single
    legacy run remains resolvable)."""
    import json

    exp_dir = os.path.abspath(exp_dir)
    run_dirs = [exp_dir] + sorted(
        os.path.join(exp_dir, d)
        for d in (os.listdir(exp_dir) if os.path.isdir(exp_dir) else [])
        if d.startswith("Log_") and os.path.isdir(os.path.join(exp_dir, d))
    )
    best = None
    for run in run_dirs:
        marker = os.path.join(run, "checkpoints", "best.json")
        if not os.path.exists(marker):
            continue
        try:
            with open(marker) as f:
                info = json.load(f)
        except (OSError, ValueError):
            continue
        path = os.path.join(run, "checkpoints", f"snap-{int(info['step'])}")
        if not os.path.exists(path):
            continue
        miou = float(info.get("mIoU", float("-inf")))
        if best is None or miou > best["mIoU"]:
            best = {
                "path": path, "step": int(info["step"]), "mIoU": miou,
                "run": run,
            }
    return best


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep
        # orbax commits metadata on a background thread; make sure it drains
        # before interpreter shutdown (else "cannot schedule new futures").
        import atexit

        atexit.register(self.close)

    def close(self):
        try:
            self._ckpt.close()
        except Exception:
            pass

    def _path(self, tag) -> str:
        return os.path.join(self.directory, f"snap-{tag}")

    def save(
        self, step: int, state: Any, best: bool = False,
        metric: Optional[float] = None, check_finite: bool = True,
    ):
        """Save params/batch_stats/opt_state/step; optionally mark as best.

        Best is a marker file pointing at the step snapshot (repeatedly
        force-overwriting one orbax path races its async commit at exit).
        `metric` (the validation mIoU behind `best`) is recorded in the
        marker so cross-run discovery (`find_best_snapshot`) can rank runs —
        the reference's log-parsing experiment database
        (tensorflow/config/utils.py:208-310) distilled to one JSON file.

        `check_finite` (default ON) refuses to persist a non-finite weight
        tree — a diverged run must fail loudly at the save site, never ship
        a NaN snapshot (round-4 postmortem: a 99.8%-NaN parity checkpoint
        was written and evaluated without any error)."""
        if check_finite:
            from .debug import tree_finite

            if not (tree_finite(state.params)
                    and tree_finite(state.batch_stats)):
                raise FloatingPointError(
                    f"refusing to save snap-{int(step)}: non-finite values "
                    "in params/batch_stats (pass check_finite=False to "
                    "override; see train.debug.nan_report for diagnosis)"
                )
        payload = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        self._ckpt.save(self._path(int(step)), payload, force=True)
        # StandardCheckpointer is an AsyncCheckpointer in orbax ≥0.11 — block
        # until the commit lands so resolve()/gc/exit never see a tmp dir.
        self._ckpt.wait_until_finished()
        if best:
            import json

            marker = {"step": int(step)}
            if metric is not None:
                marker["mIoU"] = float(metric)
            with open(os.path.join(self.directory, "best.json"), "w") as f:
                json.dump(marker, f)
        self._gc()

    def best_step(self) -> Optional[int]:
        import json

        p = os.path.join(self.directory, "best.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(json.load(f)["step"])

    def _gc(self):
        snaps = self.steps()
        keep_best = self.best_step()
        for s in snaps[: -self.max_to_keep]:
            if s == keep_best:
                continue
            path = self._path(s)
            try:
                ocp.utils.rmtree(path)  # type: ignore[attr-defined]
            except Exception:
                import shutil

                shutil.rmtree(path, ignore_errors=True)

    def steps(self) -> Sequence[int]:
        out = []
        for d in os.listdir(self.directory):
            m = re.match(r"^snap-(\d+)$", d)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def resolve(self, which: str = "auto") -> Optional[str]:
        """'auto' → latest step snapshot; 'best' → snap-best; else a path."""
        if which == "best":
            s = self.best_step()
            if s is None:
                return None
            p = self._path(s)
            return p if os.path.exists(p) else None
        if which in ("auto", "latest", ""):
            steps = self.steps()
            return self._path(steps[-1]) if steps else None
        return which if os.path.exists(which) else None

    def restore(
        self,
        state: Any,
        which: str = "auto",
        select: Optional[Sequence[str]] = None,
        except_: Optional[Sequence[str]] = None,
    ):
        """Restore into `state` (used as the shape/dtype template).

        select/except_: regex lists over flattened param paths; non-matching
        (or excluded) leaves keep their current values — the reference's
        partial-restore semantics with leftover reporting."""
        path = self.resolve(which)
        if path is None:
            raise FileNotFoundError(f"no checkpoint for {which!r} in {self.directory}")
        template = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        loaded = self._ckpt.restore(path, template)

        if select is None and except_ is None:
            merged = loaded
            skipped: list = []
        else:
            sel = [re.compile(p) for p in (select or [".*"])]
            exc = [re.compile(p) for p in (except_ or [])]

            flat_l = jax.tree_util.tree_flatten_with_path(loaded)[0]
            flat_t, treedef = jax.tree_util.tree_flatten_with_path(template)
            skipped = []
            merged_leaves = []
            for (path_t, cur), (_, new) in zip(flat_t, flat_l):
                name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path_t)
                take = any(p.search(name) for p in sel) and not any(
                    p.search(name) for p in exc
                )
                merged_leaves.append(new if take else cur)
                if not take:
                    skipped.append(name)
            merged = jax.tree_util.tree_unflatten(treedef, merged_leaves)

        new_state = state.replace(
            step=merged["step"],
            params=merged["params"],
            batch_stats=merged["batch_stats"],
            opt_state=merged["opt_state"],
        )
        return new_state, skipped
