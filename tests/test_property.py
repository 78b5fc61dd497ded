"""Property-based parity: randomized inputs against the CPU oracles
(SURVEY.md §4.1 made adversarial with Hypothesis).

Each property draws a random geometry (cluster count, spread, eps regime)
and requires EXACT agreement where the contract is exact (DBSCAN labels,
eps value within fp tolerance) and metric agreement for CMC/mAP.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from ssg_tpu.cluster import dbscan, select_eps
from ssg_tpu.evaluation_metrics import cmc, mean_ap
from ssg_tpu.oracle.ranking import cmc_np, mean_ap_np

try:
    from sklearn.cluster import DBSCAN as SkDBSCAN

    HAVE_SKLEARN = True
except ImportError:  # pragma: no cover
    HAVE_SKLEARN = False


def _random_distmat(seed, n, ids, spread):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(ids, 8))
    x = centers[rng.integers(0, ids, n)] + spread * rng.normal(size=(n, 8))
    d = np.sqrt(((x[:, None] - x[None, :]) ** 2).sum(-1)).astype(np.float32)
    np.fill_diagonal(d, 0.0)
    return (d + d.T) / 2  # exactly symmetric


@pytest.mark.skipif(not HAVE_SKLEARN, reason="sklearn unavailable")
@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(12, 80),
    ids=st.integers(2, 10),
    spread=st.floats(0.05, 1.0),
    min_samples=st.integers(2, 5),
    q=st.floats(0.02, 0.4),
)
def test_dbscan_matches_sklearn_exactly(seed, n, ids, spread, min_samples, q):
    d = _random_distmat(seed, n, ids, spread)
    tri = d[np.triu_indices(n, 1)]
    eps = float(np.quantile(tri, q))
    want = SkDBSCAN(eps=eps, min_samples=min_samples,
                    metric="precomputed").fit_predict(d)
    got, n_clusters = dbscan(jnp.asarray(d), eps, min_samples=min_samples)
    got = np.asarray(got)
    # sklearn labels clusters in discovery order — ours must match exactly,
    # not just up to permutation (cluster/dbscan.py docstring).
    np.testing.assert_array_equal(got, want)
    assert int(n_clusters) == len(set(want.tolist()) - {-1})


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(8, 60),
    rho=st.floats(1e-3, 0.3),
)
def test_select_eps_matches_numpy(seed, n, rho):
    d = _random_distmat(seed, n, 4, 0.5)
    got = float(select_eps(jnp.asarray(d), rho=rho))
    tri = d[np.triu_indices(n, 1)]
    tri = tri[tri != 0.0]
    k = max(int(np.round(rho * len(tri))), 1)
    want = float(np.sort(tri)[:k].mean())
    assert got == pytest.approx(want, rel=1e-5)


@settings(max_examples=10, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    q=st.integers(5, 25),
    g=st.integers(10, 60),
    ids=st.integers(2, 8),
    cams=st.integers(2, 4),
)
def test_ranking_metrics_match_oracle(seed, q, g, ids, cams):
    rng = np.random.default_rng(seed)
    qi = rng.integers(0, ids, q)
    gi = np.concatenate([np.arange(ids), rng.integers(0, ids, g - ids)])
    qc = rng.integers(0, cams, q)
    gc = rng.integers(0, cams, g)
    d = rng.uniform(0.1, 1.0, (q, g)).astype(np.float64)
    d -= 0.05 * (qi[:, None] == gi[None, :])
    d += rng.uniform(0, 1e-9, (q, g))  # break ties

    # Guarantee every query has a valid match (oracle raises otherwise).
    gi[0] = qi[0]
    gc[0] = (qc[0] + 1) % cams
    for i in range(q):
        if not np.any((gi == qi[i]) & ((gi != qi[i]) | (gc != qc[i]))):
            gi[i % g] = qi[i]
            gc[i % g] = (qc[i] + 1) % cams

    assert mean_ap(d, qi, gi, qc, gc) == pytest.approx(
        mean_ap_np(d, qi, gi, qc, gc), abs=1e-4)
    got = cmc(d, qi, gi, qc, gc, topk=20, first_match_break=True)
    want = cmc_np(d, qi, gi, qc, gc, topk=20, first_match_break=True)
    np.testing.assert_allclose(got, want, atol=1e-6)
