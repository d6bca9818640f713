"""Profiling and tracing helpers (SURVEY.md §5: the reference only has
cuda-event wall clocks; here we expose jax.profiler traces + step timers)."""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/instascene_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class TraceWindow:
    """Iteration-windowed jax.profiler trace for training loops: call
    `tick(it)` each iteration and `close()` after the loop (idempotent —
    also stops a trace left open by a run that ended mid-window)."""

    def __init__(self, log_dir: str, start: int, end: int):
        self.log_dir = log_dir
        self.start = int(start)
        self.end = int(end)
        self._active = False

    def tick(self, it: int) -> None:
        if self.log_dir is None or self.end <= self.start:
            return
        if it == self.start and not self._active:
            import jax
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif it == self.end and self._active:
            self.close()

    def close(self) -> None:
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
            print(f"\nprofiler trace -> {self.log_dir}")


class StepProfiler:
    """Per-section wall-clock accounting across training steps."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, dict]:
        return {k: {"total_s": round(v, 3),
                    "mean_ms": round(v / max(self.counts[k], 1) * 1000, 2),
                    "count": self.counts[k]}
                for k, v in sorted(self.totals.items(),
                                   key=lambda kv: -kv[1])}

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


def device_memory_stats() -> dict:
    """Best-effort HBM usage snapshot."""
    import jax
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return {k: v for k, v in stats.items()
                if "bytes" in k or "size" in k}
    except Exception:
        return {}
