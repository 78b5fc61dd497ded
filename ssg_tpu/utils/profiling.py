"""Profiling / tracing harness.

The reference has no profiler (SURVEY.md §5 tracing row) — only
AverageMeter prints. This module is the TPU rebuild's observability layer:
``trace`` wraps ``jax.profiler`` (view in TensorBoard / Perfetto),
``wallclock`` is the block-until-ready timing harness behind the
BASELINE.json metrics, and ``device_memory_stats`` snapshots HBM usage.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str, *, create_perfetto_link: bool = False):
    """Capture a device trace for the enclosed block.

    Usage::
        with profiling.trace('/tmp/ssg-trace'):
            step(state, batch).block_until_ready()
    """
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _block(tree) -> None:
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def wallclock(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 1,
    **kwargs,
) -> dict:
    """Time ``fn(*args, **kwargs)`` with proper device synchronization.

    Runs ``warmup`` untimed calls (compile + cache), then ``iters`` timed
    calls, blocking on every output leaf. Returns stats in seconds.
    """
    for _ in range(warmup):
        _block(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "mean_s": sum(times) / len(times),
        "min_s": times[0],
        "p50_s": times[len(times) // 2],
        "max_s": times[-1],
        "iters": iters,
    }


def device_memory_stats(device=None) -> dict:
    """Best-effort HBM usage snapshot ({} where the backend lacks stats)."""
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except (AttributeError, RuntimeError):
        return {}
    keep = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: stats[k] for k in keep if k in stats}
