"""Runtime utilities: profiling, step timing, device memory stats.

The reference's only observability is wall-clock timing into metrics
(train_pad_20.py:79,165); this module adds the TPU-native equivalents
(SURVEY.md §5): ``jax.profiler`` trace capture for xprof/tensorboard,
per-step throughput accounting (images/sec/chip), and HBM usage snapshots.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/skinjax-trace"):
    """Capture a profiler trace viewable in xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-time + throughput accounting.

    Use around blocking step calls; ``summary()`` reports mean/p50/p95 step
    time and images/sec/chip for the configured batch size.
    """

    def __init__(self, batch_size: int, n_chips: int = 1, warmup: int = 2):
        self.batch_size = batch_size
        self.n_chips = max(n_chips, 1)
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self) -> Dict[str, float]:
        times = np.asarray(self.times[self.warmup :] or self.times)
        mean = float(times.mean())
        return {
            "steps": len(times),
            "mean_step_ms": mean * 1e3,
            "p50_step_ms": float(np.percentile(times, 50) * 1e3),
            "p95_step_ms": float(np.percentile(times, 95) * 1e3),
            "images_per_sec": self.batch_size / mean,
            "images_per_sec_per_chip": self.batch_size / mean / self.n_chips,
        }


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device HBM usage (bytes), where the backend exposes it."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use", float("nan")),
                "peak_bytes_in_use": s.get("peak_bytes_in_use", float("nan")),
                "bytes_limit": s.get("bytes_limit", float("nan")),
            }
        except Exception:
            out[str(d)] = {}
    return out
