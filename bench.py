#!/usr/bin/env python
"""Benchmark: the BASELINE.json config-1 workload on real TPU.

Feature-extract (SSG ResNet-50, bf16) + k-reciprocal re-rank + auto-eps
DBSCAN at Market-1501 query-set scale (N=3368), end to end on device.
Prints ONE JSON line:

  {"metric": "...", "value": <seconds>, "unit": "s", "vs_baseline": <x>}

``vs_baseline`` is the speedup over the CPU oracle pipeline measured once in
this environment (BASELINE_MEASURED.json; the reference publishes no speed
numbers — SURVEY.md §6). Extra keys carry the submetrics.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

N = 3368
BATCH = 128
HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    # Persistent compilation cache: bench runs once per round; don't pay
    # recompiles for unchanged graphs.
    cache_dir = os.path.join(HERE, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from ssg_tpu import models
    from ssg_tpu.data import datasets
    from ssg_tpu.data.synthetic_device import DeviceRenderer

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)

    model = models.create("resnet50", num_features=0, num_parts=3,
                          dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 256, 128, 3), jnp.float32),
        train=False,
    )

    # Pre-render the synthetic image batch stream ON DEVICE (host data prep
    # is not the device metric; real deployments stream from the native
    # loader, and this environment's host->device path is tunnel-limited).
    ds = datasets.create("market1501", scale=0.45, seed=0)
    items = (ds.train + ds.query + ds.gallery)[:N]
    assert len(items) == N, f"synthetic dataset too small: {len(items)}"
    renderer = DeviceRenderer(ds)
    batches = [(imgs, mask) for imgs, _, _, mask in renderer.batches(items, BATCH)]
    jax.block_until_ready([im for im, _ in batches])

    # --- extract (one full warmup pass: forward + concat graphs must both
    # be live before the timed pass — graph/cache loads are not the metric) -
    from ssg_tpu.api import _forward_eval

    def extract_pass():
        chunks = [_forward_eval(model.apply, variables, imgs) for imgs, _ in batches]
        feats = jnp.concatenate(chunks, axis=1)
        feats.block_until_ready()
        return feats

    extract_pass()
    t0 = time.time()
    feats = extract_pass()
    extract_s = time.time() - t0
    keep = np.concatenate([m for _, m in batches])
    feats = feats[:, jnp.asarray(np.flatnonzero(keep))]

    # --- re-rank + eps + DBSCAN on device (3 part groups, one fused graph) -
    from ssg_tpu.api import cluster_groups

    _ = cluster_groups(feats, k1=20, k2=6, lambda_value=0.1, rho=1.6e-3)
    t0 = time.time()
    _, n_clusters, _ = cluster_groups(feats, k1=20, k2=6, lambda_value=0.1,
                                      rho=1.6e-3)
    cluster_s = time.time() - t0

    total_s = extract_s + cluster_s
    imgs_per_s = N / extract_s

    # --- large-N streaming submetric (best-effort: the headline metric
    # must survive the environment's intermittent device faults, so any
    # failure here only omits the key) -----------------------------------
    streaming_s = streaming_clusters = None
    try:
        from ssg_tpu.parallel import make_mesh
        from ssg_tpu.parallel.streaming import streaming_cluster

        ns = 16384
        k = jax.random.PRNGKey(0)
        ids = ns // 12
        centers = jax.random.normal(jax.random.fold_in(k, 1), (ids, 2048))
        assign = jax.random.randint(jax.random.fold_in(k, 2), (ns,), 0, ids)
        sf = centers[assign] + 0.3 * jax.random.normal(
            jax.random.fold_in(k, 3), (ns, 2048))
        sf = (sf / jnp.linalg.norm(sf, axis=1, keepdims=True)).astype(
            jnp.float32)
        mesh = make_mesh(1)
        skw = dict(k1=20, k2=6, rho=1.6e-3, min_samples=4, chunk=1024)
        lbl, nc, _ = streaming_cluster(sf, mesh, **skw)
        np.asarray(lbl)  # host readback = reliable completion barrier
        t0 = time.time()
        lbl, nc, _ = streaming_cluster(sf, mesh, **skw)
        np.asarray(lbl)
        streaming_s = round(time.time() - t0, 3)
        streaming_clusters = int(nc)
    except Exception as e:  # noqa: BLE001 — device faults must not kill bench
        print(f"streaming submetric skipped: {e}", file=sys.stderr)

    baseline_path = os.path.join(HERE, "BASELINE_MEASURED.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        # Oracle clusters ONE group; compare per-group cost.
        oracle_total = base["extract_seconds"] + 3 * (
            base["rerank_seconds"] + base["eps_dbscan_seconds"]
        )
        vs_baseline = oracle_total / total_s

    out = {
        "metric": "ssg_extract_rerank_dbscan_wallclock_market_query_3368",
        "value": round(total_s, 3),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 1) if vs_baseline else None,
        "extract_seconds": round(extract_s, 3),
        "extract_imgs_per_s": round(imgs_per_s, 1),
        "cluster_seconds_3groups": round(cluster_s, 3),
        "clusters": n_clusters,
        "device": str(dev),
    }
    if streaming_s is not None:
        out["streaming_n16384_seconds"] = streaming_s
        out["streaming_n16384_clusters"] = streaming_clusters
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
