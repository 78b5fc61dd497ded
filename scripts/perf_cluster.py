#!/usr/bin/env python
"""Cluster-chain breakdown on the real TPU: re-rank / eps / DBSCAN at
Market-query scale (N=3368), same shapes as bench.py so compiles are cached."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ssg_tpu.api import cluster, re_ranking
from ssg_tpu.cluster import dbscan, select_eps
from ssg_tpu.utils.cache import enable_compilation_cache
from ssg_tpu.utils.profiling import wallclock

N, F = 3368, 2048


def main():
    enable_compilation_cache()
    k = jax.random.PRNGKey(0)
    # Clusterable features: 300 centers + noise, L2-normalized (as the model
    # emits); same (N, F) signature as bench's extracted embeddings.
    centers = jax.random.normal(jax.random.fold_in(k, 1), (300, F))
    assign = jax.random.randint(jax.random.fold_in(k, 2), (N,), 0, 300)
    feats = centers[assign] + 0.3 * jax.random.normal(jax.random.fold_in(k, 3), (N, F))
    feats = feats / jnp.linalg.norm(feats, axis=1, keepdims=True)
    feats.block_until_ready()

    t = wallclock(lambda: re_ranking(features=feats, k1=20, k2=6,
                                     lambda_value=0.1), iters=5)
    print(f"re_ranking      {t['p50_s'] * 1e3:8.1f} ms", flush=True)

    dist = re_ranking(features=feats, k1=20, k2=6, lambda_value=0.1)
    dist.block_until_ready()

    t = wallclock(lambda: select_eps(dist, rho=1.6e-3), iters=5)
    print(f"select_eps      {t['p50_s'] * 1e3:8.1f} ms", flush=True)

    eps = float(select_eps(dist, rho=1.6e-3))
    t = wallclock(lambda: dbscan(dist, eps=eps, min_samples=4), iters=5)
    print(f"dbscan          {t['p50_s'] * 1e3:8.1f} ms", flush=True)

    t = wallclock(lambda: cluster(dist, rho=1.6e-3), iters=5)
    print(f"cluster (eps+dbscan+host)  {t['p50_s'] * 1e3:8.1f} ms", flush=True)

    t = wallclock(
        lambda: cluster(re_ranking(features=feats, k1=20, k2=6,
                                   lambda_value=0.1), rho=1.6e-3),
        iters=5,
    )
    print(f"full chain      {t['p50_s'] * 1e3:8.1f} ms", flush=True)

    if "--trace" in sys.argv:
        # Per-stage device attribution of the fused bench graph
        # (api._analytics_impl named scopes: a_dist/a_rerank(rr_*)/a_eps/
        # a_dbscan), the bench.py cluster_seconds_3groups workload.
        import numpy as np

        from ssg_tpu.api import cluster_groups
        from ssg_tpu.utils import profiling
        from ssg_tpu.utils.traceview import report_by_scope

        logdir = "/tmp/ssg_cluster_trace"
        f3 = jnp.stack([feats, feats, feats])
        cluster_groups(f3, k1=20, k2=6, lambda_value=0.1, rho=1.6e-3)
        with profiling.trace(logdir):
            out = cluster_groups(f3, k1=20, k2=6, lambda_value=0.1,
                                 rho=1.6e-3)
            np.asarray(out[0])
        report_by_scope(logdir, r"a_dist|rr_\w+|a_eps|a_dbscan")


if __name__ == "__main__":
    main()
