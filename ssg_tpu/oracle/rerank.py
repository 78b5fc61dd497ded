"""Numpy k-reciprocal re-ranking oracle.

Pins the algorithm of the reference's [reid/rerank.py] (expected path —
SURVEY.md §2 #10, §3.3): "Re-ranking Person Re-identification with
k-reciprocal Encoding", Zhong et al., CVPR 2017 (arXiv:1701.08398).

Reference behavior reproduced (SURVEY.md [HIGH] items):
  1. original_dist = squared Euclidean, column-max-normalized, transposed;
  2. per-row k-reciprocal neighbor sets R(i, k1) from argsort rank lists;
  3. candidate expansion: for each j in R(i,k1), union in R(j, round(k1/2))
     when |R(j, k1/2) ∩ R(i, k1)| > 2/3 |R(j, k1/2)|;
  4. Gaussian-weighted sparse encoding V[i] = softmax(-d) on the expanded set;
  5. local query expansion: V <- mean of V over the k2 nearest neighbors;
  6. Jaccard distance from min/max sums over inverted-index lists;
  7. final = lambda * original + (1 - lambda) * jaccard.

Deviation (documented): the canonical public implementation accumulates V and
the Jaccard matrix in float16; this oracle uses float32 throughout so that the
TPU kernels (which accumulate in fp32) can be tested to tight tolerances.
"""

from __future__ import annotations

import numpy as np

from ssg_tpu.oracle.distance import pairwise_distance_np


def _k_reciprocal_neigh(initial_rank: np.ndarray, i: int, k: int) -> np.ndarray:
    """Indices j such that j in topk(i) and i in topk(j) (k includes self)."""
    forward = initial_rank[i, : k + 1]
    backward = initial_rank[forward, : k + 1]
    fi = np.where(backward == i)[0]
    return forward[fi]


def re_ranking_np(
    features: np.ndarray | None = None,
    dist: np.ndarray | None = None,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.1,
) -> np.ndarray:
    """k-reciprocal re-ranked distance matrix (symmetric, N x N).

    Either ``features`` (N, D) or a precomputed Euclidean ``dist`` (N, N)
    must be given. Returns a float32 (N, N) matrix
    ``lambda * d_original + (1 - lambda) * d_jaccard``.
    """
    if dist is None:
        assert features is not None
        # Canonical code computes Euclidean then squares; we use the squared
        # distance directly (identical value, one fewer fp roundtrip).
        original_dist = pairwise_distance_np(features, squared=True)
    else:
        original_dist = np.power(np.asarray(dist, dtype=np.float32), 2)
    n = original_dist.shape[0]

    # Canonical preamble: normalize each column by its max, transpose.
    # Guard degenerate columns (all-identical features) against 0/0.
    col_max = np.maximum(np.max(original_dist, axis=0), np.float32(1e-12))
    original_dist = (original_dist / col_max).T

    initial_rank = np.argsort(original_dist, kind="stable").astype(np.int32)

    half = int(np.around(k1 / 2.0))
    recip = [_k_reciprocal_neigh(initial_rank, i, k1) for i in range(n)]
    recip_half = [_k_reciprocal_neigh(initial_rank, i, half) for i in range(n)]

    V = np.zeros((n, n), dtype=np.float32)
    for i in range(n):
        expansion = recip[i]
        for cand in recip[i]:
            cand_set = recip_half[cand]
            if len(np.intersect1d(cand_set, recip[i])) > (2.0 / 3.0) * len(cand_set):
                expansion = np.append(expansion, cand_set)
        expansion = np.unique(expansion)
        weight = np.exp(-original_dist[i, expansion])
        V[i, expansion] = weight / np.sum(weight)

    if k2 != 1:
        V_qe = np.zeros_like(V)
        for i in range(n):
            V_qe[i, :] = np.mean(V[initial_rank[i, :k2], :], axis=0)
        V = V_qe

    # Jaccard distance via inverted index over nonzero columns.
    inv_index = [np.where(V[:, j] != 0)[0] for j in range(n)]
    jaccard = np.zeros((n, n), dtype=np.float32)
    for i in range(n):
        temp_min = np.zeros((n,), dtype=np.float32)
        nz = np.where(V[i, :] != 0)[0]
        for j in nz:
            rows = inv_index[j]
            temp_min[rows] += np.minimum(V[i, j], V[rows, j])
        jaccard[i] = 1.0 - temp_min / (2.0 - temp_min)

    final = jaccard * (1 - lambda_value) + original_dist * lambda_value
    # Floating-point can push Jaccard a hair below 0 (temp_min rounding above
    # 1); downstream DBSCAN requires non-negative precomputed distances.
    np.maximum(final, 0.0, out=final)
    return final.astype(np.float32)
