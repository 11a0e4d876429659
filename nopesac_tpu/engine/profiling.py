"""Tracing / profiling / debug hooks (aux subsystem, SURVEY.md section 5).

The reference has no profiling beyond d2's iteration timer and drops into pdb
on NaNs (camera_head.py:186-187 etc.). Here:
  * `trace(dir)` context manager captures a jax.profiler trace viewable in
    TensorBoard / Perfetto.
  * `StepTimer` records per-step wall time + running averages.
  * `nan_guard` enables jax debug_nans (functional replacement for the pdb
    traps) - or use `check_finite_tree` inside the loop for a soft guard
    that skips/logs instead of stopping (SURVEY.md: "NaN guard that
    skips/logs instead of hanging").
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/TPU profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_guard(enabled: bool = True):
    """Hard NaN checking (recompiles with checks; debug only)."""
    if not enabled:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_finite_tree(tree, name: str = "metrics") -> bool:
    """Soft NaN guard: True if every leaf is finite; logs offenders."""
    ok = True
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            ok = False
            logger.warning("non-finite value in %s at %s", name,
                           "/".join(str(p) for p in path))
    return ok


class StepTimer:
    """Per-step timing with EMA + ETA, like d2's CommonMetricPrinter."""

    def __init__(self, ema: float = 0.05):
        self.ema = ema
        self.avg: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self) -> Dict[str, float]:
        now = time.perf_counter()
        out = {}
        if self._last is not None:
            dt = now - self._last
            self.avg = dt if self.avg is None else (1 - self.ema) * self.avg + self.ema * dt
            out = {"step_time": dt, "step_time_avg": self.avg}
        self._last = now
        return out

    def eta(self, steps_left: int) -> float:
        return (self.avg or 0.0) * steps_left


def device_memory_stats() -> Dict[str, float]:
    """Best-effort per-device memory stats (bytes)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            if s:
                out[str(d)] = {
                    "bytes_in_use": s.get("bytes_in_use", 0),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use", 0),
                }
        except Exception:
            pass
    return out
