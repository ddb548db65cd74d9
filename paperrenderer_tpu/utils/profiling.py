"""Device profiling helpers — the TPU upgrade over the reference's CPU-only
timers (SURVEY §5: "No GPU timestamps, no chrome-trace export").

``trace`` wraps jax.profiler and writes a TensorBoard/Perfetto trace;
``device_time`` measures steady-state device time of a jitted callable.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/paperrenderer_trace"):
    """Capture a device trace viewable in Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_time(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Steady-state seconds per call of ``fn(*args)`` (blocks on the result)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
