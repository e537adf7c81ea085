"""Profiling hooks: jax.profiler traces + simple block timers.

The reference has no tracing/profiling at all (SURVEY.md §5). Wrap any
region in :func:`trace` to capture a TensorBoard-viewable XLA trace, or use
:func:`timed` for quick wall-clock numbers with device sync.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name: str, sync_on=None, log_fn=print):
    """Wall-clock a block; blocks on ``sync_on`` (array/pytree) if given."""
    t0 = time.perf_counter()
    yield
    if sync_on is not None:
        jax.block_until_ready(sync_on)
    log_fn(f"[timed] {name}: {time.perf_counter() - t0:.4f}s")
