"""Sanity tests for the CPU oracle stack itself (SURVEY.md §4.1).

The oracles define parity ground truth for every TPU kernel, so they get
their own consistency checks: distance vs direct computation, re-ranking
invariants, DBSCAN/eps behavior, CMC/mAP on a constructed case.
"""

import numpy as np
import pytest

from ssg_tpu.oracle import (
    cmc_np,
    dbscan_np,
    mean_ap_np,
    pairwise_distance_np,
    re_ranking_np,
    select_eps_np,
)


def test_pairwise_distance_matches_naive(rng):
    x = rng.normal(size=(37, 16)).astype(np.float32)
    y = rng.normal(size=(23, 16)).astype(np.float32)
    d = pairwise_distance_np(x, y)
    naive = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, naive, rtol=1e-4, atol=1e-4)


def test_pairwise_distance_symmetric_zero_diag(rng):
    x = rng.normal(size=(20, 8)).astype(np.float32)
    d = pairwise_distance_np(x)
    assert np.allclose(np.diag(d), 0.0, atol=1e-4)
    np.testing.assert_allclose(d, d.T, atol=1e-5)


def test_re_ranking_shrinks_intra_cluster_distance(rng):
    # Two well-separated blobs: re-ranked cross-blob distance should be ~1
    # (max Jaccard) and intra-blob much smaller.
    a = rng.normal(size=(30, 8)).astype(np.float32) * 0.05
    b = rng.normal(size=(30, 8)).astype(np.float32) * 0.05 + 10.0
    feats = np.concatenate([a, b], 0)
    d = re_ranking_np(features=feats, k1=10, k2=3, lambda_value=0.1)
    assert d.shape == (60, 60)
    intra = d[:30, :30][np.triu_indices(30, 1)].mean()
    cross = d[:30, 30:].mean()
    # Cross-blob pairs share no k-reciprocal neighbors -> Jaccard ~= 1.
    assert cross > 0.95
    assert cross > 1.3 * intra


def test_re_ranking_self_distance_smallest(rng):
    feats = rng.normal(size=(40, 16)).astype(np.float32)
    d = re_ranking_np(features=feats, k1=8, k2=3)
    # Self-distance must be the row minimum.
    assert (np.argmin(d + np.eye(40) * 0.0, axis=1) == np.arange(40)).mean() > 0.9


def test_select_eps_is_small_quantile(rng):
    d = pairwise_distance_np(rng.normal(size=(100, 8)).astype(np.float32))
    eps = select_eps_np(d, rho=0.05)
    tri = np.triu(d, 1)
    tri = tri[tri > 0]
    assert eps < np.median(tri)


def test_dbscan_two_blobs(rng):
    a = rng.normal(size=(25, 4)).astype(np.float32) * 0.05
    b = rng.normal(size=(25, 4)).astype(np.float32) * 0.05 + 5.0
    d = pairwise_distance_np(np.concatenate([a, b], 0), squared=False)
    labels, eps = dbscan_np(d, eps=1.0, min_samples=4)
    assert set(labels[:25]) == {0}
    assert set(labels[25:]) == {1}


def test_cmc_map_perfect_ranking():
    # 4 queries, 8 gallery; distmat puts the true match first for each query.
    q_ids = np.array([0, 1, 2, 3])
    g_ids = np.array([0, 1, 2, 3, 4, 5, 6, 7])
    q_cams = np.zeros(4, dtype=int)
    g_cams = np.ones(8, dtype=int)
    dist = np.ones((4, 8))
    for i in range(4):
        dist[i, i] = 0.0
    c = cmc_np(dist, q_ids, g_ids, q_cams, g_cams, topk=5)
    assert c[0] == 1.0
    assert mean_ap_np(dist, q_ids, g_ids, q_cams, g_cams) == pytest.approx(1.0)


def test_cmc_same_camera_filtered():
    # The only gallery match shares pid AND cam with the query -> filtered,
    # query becomes invalid -> next-best behavior: raise unless another valid.
    q_ids = np.array([0, 1])
    g_ids = np.array([0, 1, 2])
    q_cams = np.array([0, 0])
    g_cams = np.array([0, 1, 1])  # query 0's match is same-cam -> invalid
    dist = np.array([[0.0, 1.0, 2.0], [1.0, 0.0, 2.0]])
    c = cmc_np(dist, q_ids, g_ids, q_cams, g_cams, topk=3)
    # Only query 1 is valid, and its match ranks first.
    assert c[0] == 1.0
