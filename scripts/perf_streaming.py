#!/usr/bin/env python
"""Streaming rerank+cluster at large N on the real TPU (single chip).

The dense chain needs ~6 fp32 N^2 buffers; the streaming path holds one
V stripe + bool state, so a single 16 GB chip clusters N it couldn't hold
densely. Usage: perf_streaming.py [N] [chunk] [band_cap] [trace_dir].

band_cap=0 forces the dedicated exact sweeps (the pre-bound 3-sweep
program) — the A/B partner of the bound-and-correct main sweep
(default -1 = auto-scaled cap, see streaming_cluster). With trace_dir
set, the steady-state run is captured with jax.profiler for per-phase
device-time attribution.
"""

import sys
import time

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
    band_cap = int(sys.argv[3]) if len(sys.argv) > 3 else -1
    band_cap = None if band_cap < 0 else band_cap  # -1 = auto-scale
    trace_dir = sys.argv[4] if len(sys.argv) > 4 else None
    k = jax.random.PRNGKey(0)
    ids = max(n // 12, 2)
    centers = jax.random.normal(jax.random.fold_in(k, 1), (ids, 2048))
    assign = jax.random.randint(jax.random.fold_in(k, 2), (n,), 0, ids)
    feats = centers[assign] + 0.3 * jax.random.normal(
        jax.random.fold_in(k, 3), (n, 2048))
    feats = (feats / jnp.linalg.norm(feats, axis=1, keepdims=True)).astype(
        jnp.float32)
    feats.block_until_ready()
    print(f"N={n} ids={ids} chunk={chunk} band_cap={band_cap}: "
          f"features staged", flush=True)

    # Timing discipline (ROADMAP "Measurement discipline"):
    # block_until_ready does not reliably block through the axon tunnel —
    # every timed region must end in a HOST READBACK of the result.
    import numpy as np

    mesh = make_mesh(1)
    kw = dict(k1=20, k2=6, rho=1.6e-3, min_samples=4, chunk=chunk,
              band_cap=band_cap)
    diag = {}
    t0 = time.perf_counter()
    labels, n_clusters, eps = streaming_cluster(feats, mesh, diag=diag, **kw)
    labels = np.asarray(labels)
    t_first = time.perf_counter() - t0
    print(f"first call (incl. compile) {t_first:.1f}s: "
          f"{int(n_clusters)} clusters, eps={float(eps):.4f}, "
          f"band_fallback={diag['band_fallback']} "
          f"fb_code={diag['fallback_code']} "
          f"dbscan_rounds={diag['dbscan_rounds']} "
          f"region_pairs={diag['region_tri_pairs']}", flush=True)
    print(f"cand: row_max={diag['cand_row_max']} "
          f"total={diag['cand_total']} "
          f"group_max={diag['cand_group_max']}", flush=True)

    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    labels, n_clusters, eps = streaming_cluster(feats, mesh, **kw)
    labels = np.asarray(labels)
    dt = time.perf_counter() - t0
    if trace_dir:
        jax.profiler.stop_trace()
        print(f"trace written to {trace_dir}", flush=True)
    print(f"steady state {dt:.2f}s ({int(n_clusters)} clusters)", flush=True)


if __name__ == "__main__":
    main()
