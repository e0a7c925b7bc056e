"""Profiling / timing harness (SURVEY.md §5: the reference has only
wall-clock prints; the TPU-native upgrade is jax.profiler traces plus a
block_until_ready timing helper)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard / Perfetto."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, warmup: int = 2, iters: int = 10,
          label: Optional[str] = None) -> float:
    """Mean wall-time (ms) of a device function with proper synchronization."""
    import jax
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / iters * 1e3
    if label:
        print(f"[timed] {label}: {ms:.3f} ms")
    return ms


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler traces (TraceAnnotation)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
