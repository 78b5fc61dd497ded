#!/usr/bin/env python
"""Tile-size sweep for the Pallas L1 kernel at bench scale (N=3368)."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ssg_tpu.ops.l1 import _l1_pallas, _l1_xla
from ssg_tpu.utils.cache import enable_compilation_cache

N = 3368


def main():
    enable_compilation_cache()
    k = jax.random.PRNGKey(0)
    # Sparse-ish rows like V: ~250 nonzeros of N.
    v = jax.random.uniform(k, (N, N))
    v = jnp.where(v > 250 / N, 0.0, v)
    v = v / jnp.maximum(v.sum(1, keepdims=True), 1e-30)
    v.block_until_ready()

    configs = [
        ("pallas 64x128x128", lambda: _l1_pallas(v, v, 64, 128, 128)),
        ("pallas 128x128x256", lambda: _l1_pallas(v, v, 128, 128, 256)),
        ("pallas 128x256x128", lambda: _l1_pallas(v, v, 128, 256, 128)),
        ("pallas 256x128x512", lambda: _l1_pallas(v, v, 256, 128, 512)),
        ("xla row-chunked", lambda: _l1_xla(v, v, 256)),
    ]
    for name, fn in configs:
        try:
            t0 = time.perf_counter()
            fn().block_until_ready()
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn().block_until_ready()
                times.append(time.perf_counter() - t0)
            print(f"{name:22s} {min(times) * 1e3:8.1f} ms  (compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:22s} FAILED: {type(e).__name__}: {str(e)[:80]}",
                  flush=True)


if __name__ == "__main__":
    main()
