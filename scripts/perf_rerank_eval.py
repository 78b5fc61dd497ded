#!/usr/bin/env python
"""MSMT17-scale test-time re-ranked evaluation on one chip.

Drives parallel/streaming.streaming_rerank_eval at N_q + N_g beyond what
the dense re-ranking path can hold (the dense path materializes several
(Q+G)^2 fp32/bool buffers). Usage: perf_rerank_eval.py [nq] [ng] [chunk].
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ssg_tpu.parallel import make_mesh
from ssg_tpu.parallel.streaming import streaming_rerank_eval
from ssg_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
    ng = int(sys.argv[2]) if len(sys.argv) > 2 else 36864
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    k = jax.random.PRNGKey(0)
    ids = max((nq + ng) // 24, 2)
    centers = jax.random.normal(jax.random.fold_in(k, 1), (ids, 2048))

    def split(n, salt):
        pid = jax.random.randint(jax.random.fold_in(k, salt), (n,), 0, ids)
        cam = jax.random.randint(jax.random.fold_in(k, salt + 1), (n,), 0, 6)
        f = centers[pid] + 0.3 * jax.random.normal(
            jax.random.fold_in(k, salt + 2), (n, 2048))
        f = (f / jnp.linalg.norm(f, axis=1, keepdims=True)).astype(jnp.float32)
        return f, pid, cam

    qf, q_ids, q_cams = split(nq, 10)
    gf, g_ids, g_cams = split(ng, 20)
    jax.block_until_ready((qf, gf))
    print(f"nq={nq} ng={ng} ids={ids}: features staged", flush=True)

    mesh = make_mesh(1)
    for tag in ("first (incl. compile)", "steady"):
        t0 = time.perf_counter()
        mAP, cmc, nv = streaming_rerank_eval(
            qf, gf, mesh, q_ids, g_ids, q_cams, g_cams,
            k1=20, k2=6, chunk=chunk,
        )
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt:.1f}s  mAP={mAP:.4f} rank1={cmc[0]:.4f} "
              f"valid={nv}/{nq}", flush=True)


if __name__ == "__main__":
    main()
