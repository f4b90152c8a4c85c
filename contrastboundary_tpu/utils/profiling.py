"""Tracing / profiling / memory probes.

TPU-native equivalent of the reference's tracing subsystem (SURVEY.md §5):
chrome-trace dumps + tf.profiler every `runtime_freq` steps
(tensorflow/utils/trainer.py:173-249, TimeLiner tf_utils.py:94-115) becomes
`jax.profiler` traces viewable in Perfetto/XProf; `print_mem`
(utils/logger.py:106-141) becomes host-RSS + device memory_stats probes.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (open with Perfetto / XProf)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str):
    """Named region inside a trace (shows up per-step in the timeline)."""
    import jax

    return jax.profiler.StepTraceAnnotation(name)


def memory_stats() -> Dict[str, float]:
    """Host RSS + per-device HBM usage in MB."""
    out: Dict[str, float] = {}
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    out["host_rss_mb"] = float(line.split()[1]) / 1024
    except OSError:
        pass
    try:
        import jax

        for d in jax.local_devices():
            stats = d.memory_stats()
            if stats:
                out[f"{d.platform}{d.id}_used_mb"] = stats.get(
                    "bytes_in_use", 0
                ) / 1e6
                out[f"{d.platform}{d.id}_peak_mb"] = stats.get(
                    "peak_bytes_in_use", 0
                ) / 1e6
    except Exception:
        pass
    return out


class StepTimer:
    """Per-step wall-clock split into data / compute, with running averages
    (the reference's batch-time/data-time meters, pytorch/tool/train.py:307+).
    """

    def __init__(self):
        self.data_time = 0.0
        self.step_time = 0.0
        self.count = 0
        self._t = time.time()

    def data_ready(self):
        now = time.time()
        self._data = now - self._t
        self._t = now

    def step_done(self):
        now = time.time()
        self.data_time += self._data
        self.step_time += now - self._t
        self.count += 1
        self._t = now

    def summary(self) -> Dict[str, float]:
        c = max(self.count, 1)
        return {
            "data_ms": 1000 * self.data_time / c,
            "step_ms": 1000 * self.step_time / c,
        }
