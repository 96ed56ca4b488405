"""Tracing / profiling / numerical sanitizers (SURVEY.md §5.1-5.2).

Reference equivalents:
- TRACE_VRAM peak-memory monitor (utils/common.py:235-280) ->
  ``MemoryPeakMonitor`` reading jax device memory stats per phase.
- tiled-VAE NaN watchdog (tilevae.py:62-69) -> ``assert_finite`` /
  ``enable_nan_debugging``.
- no timeline tracer in the reference -> ``profile_trace`` wraps
  jax.profiler for TensorBoard timelines.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax

TRACE_MEM = bool(int(os.environ.get("DIFFBIR_TPU_TRACE_MEM", "0")))


def device_memory_stats(device=None) -> dict:
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return stats or {}


@contextlib.contextmanager
def MemoryPeakMonitor(desc: str, enabled: Optional[bool] = None):
    """Print per-phase peak device memory (TRACE_VRAM equivalent)."""
    enabled = TRACE_MEM if enabled is None else enabled
    if not enabled:
        yield
        return
    t0 = time.time()
    before = device_memory_stats().get("peak_bytes_in_use", 0)
    yield
    after = device_memory_stats().get("peak_bytes_in_use", 0)
    dt = time.time() - t0
    # PJRT exposes no per-phase peak reset: `peak` is the process-global
    # high-water mark; `peak delta` > 0 means THIS phase raised it
    print(f"[mem] {desc}: global peak {after / 2**30:.2f} GiB "
          f"(peak delta {(after - before) / 2**30:+.2f} GiB, {dt:.2f}s)")


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler timeline trace (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def assert_finite(x: jax.Array, name: str = "tensor") -> jax.Array:
    """Host-side NaN watchdog for eager/debug paths."""
    import numpy as np

    arr = np.asarray(x)
    if not np.all(np.isfinite(arr)):
        raise FloatingPointError(f"non-finite values in {name}")
    return x


def enable_nan_debugging() -> None:
    """Trap NaNs inside jitted programs (jax_debug_nans)."""
    jax.config.update("jax_debug_nans", True)
