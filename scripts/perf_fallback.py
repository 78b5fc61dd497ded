#!/usr/bin/env python
"""Fallback-penalty measurement (VERDICT r4 #5): force each fb_code class
at large N and record the steady-state multiple vs the fast path.

Round 4's own find (the coarse-only sample histogram silently losing the
fast path at N=24,576: 4.9 s -> 48 s) proved the downside is ~10x, so
BASELINE config-5 projections must state worst-case numbers. Knobs force
the capacity bits directly (each is checked EXACTLY, so a tiny cap
deterministically trips its bit):

  * band_cap=64   -> bit 1 (slot-group overflow)  => exact two-sweep eps
                     + dedicated adjacency sweep (full fallback)
  * support_cap=8 -> bit 8 (V-row support overflow) => same full fallback
  * eps_cap=1     -> bit 16 (region-pair overflow) => eps-only fallback
                     (adjacency fast path stays engaged)
  * band_cap=0    -> static escape hatch: fused path compiled out
                     (the pre-bound 3-sweep program)

Bits 2/4 (sample misled: k-th/eps outside the sampled region) cannot be
forced by a knob on well-behaved data, but they gate the SAME downgraded
program as bits 1/8, so the penalty classes here cover them. Labels must
be identical across every row (asserted).

Usage: perf_fallback.py [N=16384] [chunk=1024]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ssg_tpu.parallel import make_mesh
from ssg_tpu.parallel.streaming import streaming_cluster
from ssg_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    k = jax.random.PRNGKey(0)
    ids = max(n // 12, 2)
    centers = jax.random.normal(jax.random.fold_in(k, 1), (ids, 2048))
    assign = jax.random.randint(jax.random.fold_in(k, 2), (n,), 0, ids)
    feats = centers[assign] + 0.3 * jax.random.normal(
        jax.random.fold_in(k, 3), (n, 2048))
    feats = (feats / jnp.linalg.norm(feats, axis=1, keepdims=True)).astype(
        jnp.float32)
    feats.block_until_ready()
    mesh = make_mesh(1)
    base = dict(k1=20, k2=6, rho=1.6e-3, min_samples=4, chunk=chunk)

    configs = [
        ("fast path (default)", {}),
        ("bit 1: band_cap=64", {"band_cap": 64}),
        ("bit 8: support_cap=8", {"support_cap": 8}),
        ("bit 16: eps_cap=1", {"eps_cap": 1}),
        ("escape: band_cap=0", {"band_cap": 0}),
    ]
    ref_labels, t_fast = None, None
    print(f"N={n} chunk={chunk}", flush=True)
    for tag, kw in configs:
        diag = {}
        t0 = time.perf_counter()
        labels, nc, eps = streaming_cluster(feats, mesh, diag=diag,
                                            **base, **kw)
        labels = np.asarray(labels)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        labels2, nc2, eps2 = streaming_cluster(feats, mesh, **base, **kw)
        labels2 = np.asarray(labels2)
        dt = time.perf_counter() - t0
        if ref_labels is None:
            ref_labels, t_fast = labels, dt
        assert (labels == ref_labels).all(), f"{tag}: labels diverged"
        assert (labels2 == labels).all()
        print(f"{tag:24s} {dt:7.2f} s  ({dt / t_fast:5.2f}x)  "
              f"fb_code={diag['fallback_code']:3d}  clusters={int(nc)}  "
              f"eps={float(eps):.4f}  (first call {t_compile:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
