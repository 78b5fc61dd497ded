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


# ---- sort-free rank stats (rank_stats_hits / rank_stats_auto) ----

def _stats_pair(dist, q_ids, g_ids, q_cams, g_cams, row_mask=None,
                col_mask=None, hit_cap=64):
    from ssg_tpu.ops.metrics import rank_stats_hits, rank_stats_masked
    args = [jnp.asarray(dist, jnp.float32), jnp.asarray(q_ids),
            jnp.asarray(g_ids), jnp.asarray(q_cams), jnp.asarray(g_cams)]
    masks = [None if row_mask is None else jnp.asarray(row_mask),
             None if col_mask is None else jnp.asarray(col_mask)]
    ref = rank_stats_masked(*args, *masks)
    got = rank_stats_hits(*args, *masks, hit_cap=hit_cap)
    return ref, got


def test_rank_stats_hits_matches_argsort_exactly():
    """Integer counts must agree bit-for-bit with the stable argsort path."""
    for seed in range(6):
        rng = np.random.default_rng(seed)
        dist, q_ids, g_ids, q_cams, g_cams = _random_protocol(
            rng, nq=48, ng=200, ids=20)
        ref, got = _stats_pair(dist, q_ids, g_ids, q_cams, g_cams)
        assert not bool(got[3]), "no overflow expected at ids=20/ng=200"
        # Per-hit quotients are identical fp32 values; the row-sum's
        # addition tree differs (H vs G terms) -> ulp-level AP delta only.
        assert float(got[0]) == pytest.approx(float(ref[0]), rel=1e-6)
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
        assert int(got[2]) == int(ref[2])


def test_rank_stats_hits_tie_heavy():
    """Quantized distances force value ties; the index tie-break must
    reproduce stable argsort order exactly."""
    rng = np.random.default_rng(7)
    q_ids = rng.integers(0, 8, 32)
    g_ids = rng.integers(0, 8, 120)
    q_cams = rng.integers(0, 3, 32)
    g_cams = rng.integers(0, 3, 120)
    dist = (rng.integers(0, 5, (32, 120)) / 4.0).astype(np.float32)
    ref, got = _stats_pair(dist, q_ids, g_ids, q_cams, g_cams)
    assert float(got[0]) == pytest.approx(float(ref[0]), rel=1e-6)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    assert int(got[2]) == int(ref[2])


def test_rank_stats_hits_masks_and_overflow():
    from ssg_tpu.ops.metrics import rank_stats_auto, rank_stats_masked
    rng = np.random.default_rng(11)
    nq, ng = 24, 160
    # 2 ids only -> ~80 relevant gallery entries per query: hit_cap=16
    # must overflow and rank_stats_auto must fall back, exactly.
    q_ids = rng.integers(0, 2, nq)
    g_ids = rng.integers(0, 2, ng)
    q_cams = rng.integers(0, 4, nq)
    g_cams = rng.integers(0, 4, ng)
    dist = rng.random((nq, ng)).astype(np.float32)
    row_mask = rng.random(nq) < 0.8
    col_mask = rng.random(ng) < 0.8
    ref, got = _stats_pair(dist, q_ids, g_ids, q_cams, g_cams,
                           row_mask, col_mask, hit_cap=16)
    assert bool(got[3]), "expected hit_cap overflow"
    auto = rank_stats_auto(
        jnp.asarray(dist), jnp.asarray(q_ids), jnp.asarray(g_ids),
        jnp.asarray(q_cams), jnp.asarray(g_cams), jnp.asarray(row_mask),
        jnp.asarray(col_mask), hit_cap=16)
    assert float(auto[0]) == float(ref[0])  # fallback IS the argsort path
    np.testing.assert_array_equal(np.asarray(auto[1]), np.asarray(ref[1]))
    assert int(auto[2]) == int(ref[2])
    # Same protocol without overflow (larger cap): fast path, same masks.
    ref2, got2 = _stats_pair(dist, q_ids, g_ids, q_cams, g_cams,
                             row_mask, col_mask, hit_cap=128)
    assert not bool(got2[3])
    assert float(got2[0]) == pytest.approx(float(ref2[0]), rel=1e-6)
    np.testing.assert_array_equal(np.asarray(got2[1]), np.asarray(ref2[1]))
    assert int(got2[2]) == int(ref2[2])


def test_rank_stats_hits_no_match_rows_and_inf():
    """Rows with zero relevant entries drop out; +inf distances still rank."""
    from ssg_tpu.ops.metrics import rank_stats_masked
    rng = np.random.default_rng(13)
    q_ids = np.array([0, 1, 99, 2])            # id 99 absent from gallery
    g_ids = rng.integers(0, 4, 60)
    q_cams = np.zeros(4, np.int64)
    g_cams = rng.integers(1, 3, 60)
    dist = rng.random((4, 60)).astype(np.float32)
    dist[1, g_ids == 1] = np.inf               # all of row 1's hits at +inf
    ref, got = _stats_pair(dist, q_ids, g_ids, q_cams, g_cams)
    assert float(got[0]) == pytest.approx(float(ref[0]), rel=1e-6)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    assert int(got[2]) == int(ref[2])
