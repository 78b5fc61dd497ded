#!/usr/bin/env python
"""Per-phase device attribution of streaming_rerank_eval (VERDICT r4 #4).

Verifies the interleaved-layout claim (the re-ranked sweep visits nq/N of
the stripe) against a real trace, and attributes the eval wall between the
fd computation (s_e_fd: dist GEMM + dense L1) and the rank statistics
(s_e_rank: argsort + order-gathers + cumsums) — plus the shared phases 1-2
(rank lists, V build, QE). Reuses perf_streaming_trace.report's
scope-aggregation (the regex there matches s_* scopes).

Usage: perf_rerank_eval_trace.py [nq] [ng] [chunk]
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from perf_streaming_trace import report  # noqa: E402 (same dir)
from ssg_tpu.parallel import make_mesh
from ssg_tpu.parallel.streaming import streaming_rerank_eval
from ssg_tpu.utils.cache import enable_compilation_cache
from ssg_tpu.utils import profiling

LOGDIR = "/tmp/ssg_rerank_eval_trace"


def main():
    enable_compilation_cache()
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 3368
    ng = int(sys.argv[2]) if len(sys.argv) > 2 else 15913
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    k = jax.random.PRNGKey(0)
    ids = max((nq + ng) // 24, 2)
    centers = jax.random.normal(jax.random.fold_in(k, 1), (ids, 2048))

    def split(n, salt):
        pid = jax.random.randint(jax.random.fold_in(k, salt), (n,), 0, ids)
        cam = jax.random.randint(jax.random.fold_in(k, salt + 1), (n,), 0, 6)
        f = centers[pid] + 0.3 * jax.random.normal(
            jax.random.fold_in(k, salt + 2), (n, 2048))
        f = (f / jnp.linalg.norm(f, axis=1, keepdims=True)).astype(jnp.float32)
        return f, np.asarray(pid), np.asarray(cam)

    qf, q_ids, q_cams = split(nq, 10)
    gf, g_ids, g_cams = split(ng, 20)
    mesh = make_mesh(1)
    kw = dict(k1=20, k2=6, chunk=chunk)
    mAP, cmc, nv = streaming_rerank_eval(qf, gf, mesh, q_ids, g_ids,
                                         q_cams, g_cams, **kw)
    print(f"warmed: mAP={mAP:.4f} rank1={cmc[0]:.4f} valid={nv}", flush=True)

    with profiling.trace(LOGDIR):
        mAP, cmc, nv = streaming_rerank_eval(qf, gf, mesh, q_ids, g_ids,
                                             q_cams, g_cams, **kw)
    print("trace captured", flush=True)
    report(LOGDIR, nq + ng, chunk, -1)


if __name__ == "__main__":
    main()
