"""JAX CMC/mAP vs the numpy oracle (open-reid protocol)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ssg_tpu.ops.metrics import evaluate_rank
from ssg_tpu.oracle import cmc_np, mean_ap_np


def _random_protocol(rng, nq=40, ng=150, ids=25, cams=4):
    q_ids = rng.integers(0, ids, nq)
    g_ids = rng.integers(0, ids, ng)
    q_cams = rng.integers(0, cams, nq)
    g_cams = rng.integers(0, cams, ng)
    dist = rng.random((nq, ng)).astype(np.float64)  # distinct w.h.p.
    return dist, q_ids, g_ids, q_cams, g_cams


def test_map_cmc_match_oracle(rng):
    dist, q_ids, g_ids, q_cams, g_cams = _random_protocol(rng)
    res = evaluate_rank(
        jnp.asarray(dist), jnp.asarray(q_ids), jnp.asarray(g_ids),
        jnp.asarray(q_cams), jnp.asarray(g_cams),
    )
    ref_map = mean_ap_np(dist, q_ids, g_ids, q_cams, g_cams)
    ref_cmc = cmc_np(dist, q_ids, g_ids, q_cams, g_cams, topk=100)
    assert float(res["mAP"]) == pytest.approx(ref_map, abs=1e-5)
    np.testing.assert_allclose(np.asarray(res["cmc"]), ref_cmc, atol=1e-5)


def test_map_cmc_match_oracle_many_seeds():
    for seed in range(5):
        rng = np.random.default_rng(seed + 100)
        dist, q_ids, g_ids, q_cams, g_cams = _random_protocol(rng, nq=20, ng=60)
        res = evaluate_rank(
            jnp.asarray(dist), jnp.asarray(q_ids), jnp.asarray(g_ids),
            jnp.asarray(q_cams), jnp.asarray(g_cams),
        )
        ref_map = mean_ap_np(dist, q_ids, g_ids, q_cams, g_cams)
        ref_cmc = cmc_np(dist, q_ids, g_ids, q_cams, g_cams, topk=100)
        assert float(res["mAP"]) == pytest.approx(ref_map, abs=1e-5), seed
        np.testing.assert_allclose(np.asarray(res["cmc"]), ref_cmc, atol=1e-5)


def test_perfect_ranking():
    q_ids = np.arange(4)
    g_ids = np.arange(8)
    dist = np.ones((4, 8))
    for i in range(4):
        dist[i, i] = 0.0
    res = evaluate_rank(
        jnp.asarray(dist), jnp.asarray(q_ids), jnp.asarray(g_ids),
        jnp.zeros(4, jnp.int32), jnp.ones(8, jnp.int32),
    )
    assert float(res["mAP"]) == pytest.approx(1.0)
    assert float(res["cmc"][0]) == pytest.approx(1.0)


def test_evaluate_all_query_chunking_matches(rng):
    """Chunked evaluation must equal the single-call result exactly."""
    from ssg_tpu.api import evaluate_all

    q, g, ids, cams = 23, 57, 6, 3
    qi = rng.integers(0, ids, q)
    gi = np.concatenate([np.arange(ids), rng.integers(0, ids, g - ids)])
    qc = rng.integers(0, cams, q)
    gc = rng.integers(0, cams, g)
    d = rng.uniform(0.1, 1.0, (q, g))
    d -= 0.05 * (qi[:, None] == gi[None, :])
    query = [(f"q{i}", int(p), int(c)) for i, (p, c) in enumerate(zip(qi, qc))]
    gallery = [(f"g{i}", int(p), int(c)) for i, (p, c) in enumerate(zip(gi, gc))]

    full = evaluate_all(d, query, gallery)
    chunked = evaluate_all(d, query, gallery, query_chunk=7)
    assert chunked["mAP"] == pytest.approx(full["mAP"], abs=1e-6)
    np.testing.assert_allclose(chunked["cmc"], full["cmc"], atol=1e-6)
