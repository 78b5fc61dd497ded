"""Tests for the profiling harness (ssg_tpu/utils/profiling.py)."""

import jax.numpy as jnp

from ssg_tpu.utils import profiling


def test_wallclock_times_jitted_fn():
    import jax

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    stats = profiling.wallclock(f, x, iters=3, warmup=1)
    assert stats["iters"] == 3
    assert 0 <= stats["min_s"] <= stats["p50_s"] <= stats["max_s"]


def test_device_memory_stats_shape():
    stats = profiling.device_memory_stats()
    assert isinstance(stats, dict)  # may be {} on CPU backend


def test_trace_writes_logdir(tmp_path):
    import jax

    logdir = str(tmp_path / "trace")
    with profiling.trace(logdir):
        jax.jit(lambda x: x * 2)(jnp.ones((8,))).block_until_ready()
    import os

    assert os.path.isdir(logdir) and any(os.scandir(logdir))
