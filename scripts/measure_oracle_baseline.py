#!/usr/bin/env python
"""Measure the CPU oracle pipeline once; cache results for bench.py.

The reference publishes no throughput numbers (BASELINE.md), so the speed
baseline is the CPU oracle stack in this environment (SURVEY.md §6):
torch-CPU ResNet-50 extraction (rate extrapolated from a few batches) and
the numpy k-reciprocal + sklearn DBSCAN clustering at Market-1501 query-set
scale (N=3368, the BASELINE.json config-1 shape).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import torch

N = 3368
FEAT_DIM = 2048

out_path = os.path.join(os.path.dirname(__file__), "..", "BASELINE_MEASURED.json")

# --- torch-CPU ResNet-50 extraction rate --------------------------------
from ssg_tpu.oracle.resnet_torch import torch_resnet50_ssg  # noqa: E402

model = torch_resnet50_ssg().eval()
x = torch.randn(16, 3, 256, 128)
with torch.no_grad():
    model(x)  # warmup
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        model(x)
    dt = time.time() - t0
extract_imgs_per_s = 16 * iters / dt
extract_seconds_n = N / extract_imgs_per_s
print(f"torch-CPU extract: {extract_imgs_per_s:.2f} imgs/s "
      f"-> {extract_seconds_n:.1f}s for N={N}")

# --- numpy re-ranking + sklearn DBSCAN at N=3368 -------------------------
from ssg_tpu.oracle import dbscan_np, re_ranking_np  # noqa: E402

rng = np.random.default_rng(0)
centers = rng.normal(size=(500, FEAT_DIM)).astype(np.float32) * 3
feats = (
    centers[rng.integers(0, 500, N)] + rng.normal(size=(N, FEAT_DIM)).astype(np.float32) * 0.5
).astype(np.float32)

t0 = time.time()
dist = re_ranking_np(features=feats, k1=20, k2=6, lambda_value=0.1)
rerank_seconds = time.time() - t0
print(f"numpy re_ranking N={N}: {rerank_seconds:.1f}s")

t0 = time.time()
labels, eps = dbscan_np(dist, rho=1.6e-3)
cluster_seconds = time.time() - t0
print(f"eps+DBSCAN N={N}: {cluster_seconds:.1f}s "
      f"({labels.max() + 1} clusters, eps={eps:.4f})")

result = {
    "host": "single-core CPU (this container); reference publishes no speed numbers",
    "n": N,
    "feat_dim": FEAT_DIM,
    "extract_imgs_per_s_torch_cpu": extract_imgs_per_s,
    "extract_seconds": extract_seconds_n,
    "rerank_seconds": rerank_seconds,
    "eps_dbscan_seconds": cluster_seconds,
    "total_extract_cluster_seconds": extract_seconds_n + rerank_seconds + cluster_seconds,
}
with open(os.path.abspath(out_path), "w") as f:
    json.dump(result, f, indent=2)
print(json.dumps(result))
