"""Observability: device stats polling, profiler traces, stage timing.

Replaces the reference's ad-hoc time.time() prints and the nvidia-smi poller
(VISinger/utils/statistics_of_gpu_usage.py:19-117) with TPU-native
equivalents: jax device memory_stats() polling and jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import logging
import threading
import time
from dataclasses import dataclass, field
from typing import Optional

import jax


def device_memory_stats() -> list[dict]:
    """Per-device memory stats (bytes_in_use etc.); empty dict if the backend
    doesn't expose them (CPU)."""
    out = []
    for d in jax.local_devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        out.append({"device": str(d), **{k: v for k, v in stats.items()
                                         if isinstance(v, (int, float))}})
    return out


class DeviceStatsPoller:
    """Background thread logging device memory every `interval_s` seconds
    (the nvidia-smi poller equivalent)."""

    def __init__(self, interval_s: float = 60.0,
                 logger: Optional[logging.Logger] = None):
        self.interval_s = interval_s
        self.logger = logger or logging.getLogger("device_stats")
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self):
        def loop():
            while not self._stop.wait(self.interval_s):
                for s in device_memory_stats():
                    used = s.get("bytes_in_use")
                    limit = s.get("bytes_limit")
                    if used is not None:
                        pct = f" ({100 * used / limit:.1f}%)" if limit else ""
                        self.logger.info("%s: %.1f MiB in use%s",
                                         s["device"], used / 2 ** 20, pct)
        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace context (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class StageTimer:
    """Per-stage wall-clock accounting for the serving pipeline."""
    stages: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.stages.setdefault(name, []).append(time.time() - t0)

    def summary(self) -> dict:
        return {k: {"count": len(v), "total_s": round(sum(v), 4),
                    "mean_s": round(sum(v) / len(v), 4)}
                for k, v in self.stages.items() if v}
