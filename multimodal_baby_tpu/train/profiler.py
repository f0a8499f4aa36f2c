"""Profiling and step-timing observability.

The reference has no tracing/profiling at all (SURVEY.md section 5.1 —
torchinfo imported but never called); this subsystem is new capability:

- ``StepTimer``: wall-clock per-step timing with warmup exclusion and
  throughput accounting (honest on tunneled TPUs: synchronizes via
  block_until_ready before reading the clock).
- ``trace``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of device execution.
- ``log_compile_time``: measures (re)compilation cost of a jitted fn.
- ``device_memory_stats``: live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional

import jax
import numpy as np


class StepTimer:
    """Accumulates per-step wall times; report() gives p50/p90/mean and
    items/sec."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._n_seen = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None):
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._t0
        self._n_seen += 1
        if self._n_seen > self.warmup:
            self.times.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self, sync_on_result: bool = False):
        self.start()
        out = {}
        yield out
        self.stop(out.get("sync"))

    def report(self, items_per_step: Optional[int] = None
               ) -> Dict[str, float]:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        rep = {
            "steps_timed": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p90_s": float(np.percentile(t, 90)),
            "total_s": float(t.sum()),
        }
        if items_per_step:
            rep["items_per_sec"] = items_per_step / rep["mean_s"]
        return rep


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def log_compile_time(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Time trace+compile vs steady-state execution of a jitted fn."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    execute_s = time.perf_counter() - t0
    return {"first_call_s": compile_s, "steady_state_s": execute_s,
            "compile_overhead_s": compile_s - execute_s}


def device_memory_stats() -> List[Dict[str, float]]:
    """Per-device HBM usage (bytes), where the backend exposes it."""
    stats = []
    for d in jax.devices():
        try:
            m = d.memory_stats()
            stats.append({
                "device": str(d),
                "bytes_in_use": m.get("bytes_in_use", 0),
                "peak_bytes_in_use": m.get("peak_bytes_in_use", 0),
                "bytes_limit": m.get("bytes_limit", 0),
            })
        except Exception:
            stats.append({"device": str(d)})
    return stats
