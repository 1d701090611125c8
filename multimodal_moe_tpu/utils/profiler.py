"""Tracing / profiling subsystem.

The reference's performance observability is wall-clock timers around
train/eval calls plus Ultralytics' per-image stage timings (SURVEY.md §5.1).
This module keeps those derived-metric names (the evaluator emits the same
``speed_*_ms_per_img`` keys) and adds the real profiler the reference lacks:
``jax.profiler`` trace capture viewable in XProf/TensorBoard, plus
lightweight stage timers for pipeline accounting.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: "str | Path", *, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a device+host profile into ``log_dir`` (open with XProf).

    Usage::

        with profiler.trace("outputs/profiles/train"):
            for batch in loader:
                state, _ = trainer.train_step(state, batch)
    """
    import jax

    log_dir = str(log_dir)
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region that shows up on the profiler timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Accumulating wall-clock stage timer for pipeline accounting.

    Produces the reference-compatible ``speed_<stage>_ms_per_img`` dict
    (ref: src/models/vision/yolo.py:231-236)."""

    def __init__(self) -> None:
        self.totals: "Dict[str, float]" = defaultdict(float)
        self.count = 0

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0

    def add_images(self, n: int) -> None:
        self.count += n

    def speeds_ms_per_img(self) -> "Dict[str, float]":
        n = max(self.count, 1)
        return {
            f"speed_{k}_ms_per_img": 1000.0 * v / n for k, v in self.totals.items()
        }


def memory_stats() -> "Dict[str, Optional[int]]":
    """Best-effort device memory stats (HBM usage observability)."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats() or {}
        return {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    except (RuntimeError, AttributeError):
        return {"bytes_in_use": None, "peak_bytes_in_use": None, "bytes_limit": None}
