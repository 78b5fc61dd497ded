"""Streaming sharded rerank+cluster (parallel/streaming.py) vs the
single-device dense chain — exact label agreement on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssg_tpu.api import cluster, re_ranking
from ssg_tpu.parallel import make_mesh
from ssg_tpu.parallel.streaming import streaming_cluster


def _feats(seed, n, ids, dim=24, spread=0.3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(ids, dim))
    x = centers[rng.integers(0, ids, n)] + spread * rng.normal(size=(n, dim))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return jnp.asarray(x, jnp.float32)


@pytest.mark.parametrize("n,chunk", [(96, 4), (130, 8), (416, 16)])
def test_streaming_matches_dense_chain(n, chunk):
    mesh = make_mesh(8)
    feats = _feats(3, n, 12)
    k1, k2, rho, ms = 8, 3, 0.02, 3

    dist = re_ranking(features=feats, k1=k1, k2=k2, lambda_value=0.1)
    want_labels, want_n, want_eps = cluster(dist, rho=rho, min_samples=ms)

    got_labels, got_n, got_eps = streaming_cluster(
        feats, mesh, k1=k1, k2=k2, lambda_value=0.1, rho=rho,
        min_samples=ms, chunk=chunk,
    )
    assert int(got_n) == want_n
    np.testing.assert_array_equal(np.asarray(got_labels), want_labels)
    assert float(got_eps) == pytest.approx(want_eps, rel=1e-4)
    assert want_n > 0  # the comparison is non-trivial


def test_streaming_column_blocked_v_matches():
    """col_blocks > 1 (the >1 GiB-stripe storage mode) must be label-exact
    vs both col_blocks=1 and the dense chain."""
    mesh = make_mesh(8)
    feats = _feats(7, 160, 14)
    kw = dict(k1=8, k2=3, lambda_value=0.1, rho=0.02, min_samples=3, chunk=8)

    dist = re_ranking(features=feats, k1=8, k2=3, lambda_value=0.1)
    want_labels, want_n, _ = cluster(dist, rho=0.02, min_samples=3)

    for blocks in (2, 4):
        labels, n_clusters, _ = streaming_cluster(
            feats, mesh, col_blocks=blocks, **kw)
        assert int(n_clusters) == want_n
        np.testing.assert_array_equal(np.asarray(labels), want_labels)
    assert want_n > 0


def test_streaming_band_fast_path_engages_and_matches():
    """The fine-sweep adjacency emission (no dedicated 3rd sweep) must
    actually engage on clustered data AND stay label-exact vs the dense
    chain; forcing band_cap=1 exercises the fallback resweep, which must
    give identical labels (VERDICT r2 next #2)."""
    mesh = make_mesh(8)
    feats = _feats(9, 256, 16)
    kw = dict(k1=8, k2=3, lambda_value=0.1, rho=0.02, min_samples=3, chunk=8)

    dist = re_ranking(features=feats, k1=8, k2=3, lambda_value=0.1)
    want_labels, want_n, _ = cluster(dist, rho=0.02, min_samples=3)
    assert want_n > 0

    diag = {}
    labels, n_clusters, _ = streaming_cluster(feats, mesh, diag=diag, **kw)
    assert diag["band_fallback"] is False  # fast path engaged
    assert int(n_clusters) == want_n
    np.testing.assert_array_equal(np.asarray(labels), want_labels)

    diag = {}
    labels, n_clusters, _ = streaming_cluster(
        feats, mesh, band_cap=0, diag=diag, **kw)
    assert diag["band_fallback"] is True  # fallback exercised
    assert int(n_clusters) == want_n
    np.testing.assert_array_equal(np.asarray(labels), want_labels)


def test_streaming_band_emission_exact_on_ties():
    """Duplicated points (tied distances, fp-degenerate eps regime): the
    fused band emission must produce EXACTLY the adjacency of the dedicated
    sweep — labels/eps identical to the band_cap=0 forced-resweep run.
    (Dense-vs-streaming label parity is out of scope on mass-tied data:
    the two chains' top-k tie-breaking legitimately diverges there; the
    tie-free parity matrix lives in the tests above.)"""
    base = _feats(13, 24, 4)
    feats = jnp.asarray(np.repeat(np.asarray(base), 4, axis=0))  # 96 rows
    mesh = make_mesh(8)
    kw = dict(k1=6, k2=2, lambda_value=0.1, rho=0.05, min_samples=3, chunk=4)

    want_labels, want_n, want_eps = streaming_cluster(
        feats, mesh, band_cap=0, **kw)  # dedicated adjacency sweep
    labels, n_clusters, eps = streaming_cluster(feats, mesh, **kw)
    assert int(n_clusters) == int(want_n)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(want_labels))
    assert float(eps) == float(want_eps)


def test_streaming_tiny_k_clamp():
    mesh = make_mesh(8)
    feats = _feats(5, 40, 5)
    labels, n_clusters, eps = streaming_cluster(
        feats, mesh, k1=64, k2=10, rho=0.05, min_samples=2, chunk=8
    )
    assert labels.shape == (40,)
    assert int(n_clusters) >= 1


def test_streaming_rerank_eval_matches_dense_eval():
    """streaming_rerank_eval == evaluating the dense re-ranked (Q, G) block
    (VERDICT r1 missing #3: MSMT17-scale test-time re-ranking)."""
    from ssg_tpu.ops.metrics import evaluate_rank
    from ssg_tpu.parallel.streaming import streaming_rerank_eval

    mesh = make_mesh(8)
    rng = np.random.default_rng(11)
    ids = 10
    centers = rng.normal(size=(ids, 24))
    def make(n):
        pid = rng.integers(0, ids, n)
        cam = rng.integers(0, 4, n)
        x = centers[pid] + 0.25 * rng.normal(size=(n, 24))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        return jnp.asarray(x, jnp.float32), pid, cam
    qf, q_ids, q_cams = make(60)
    gf, g_ids, g_cams = make(140)

    full = re_ranking(features=jnp.concatenate([qf, gf]), k1=8, k2=3,
                      lambda_value=0.1)
    want = evaluate_rank(full[:60, 60:], jnp.asarray(q_ids),
                         jnp.asarray(g_ids), jnp.asarray(q_cams),
                         jnp.asarray(g_cams))

    got_map, got_cmc, nv = streaming_rerank_eval(
        qf, gf, mesh, q_ids, g_ids, q_cams, g_cams,
        k1=8, k2=3, lambda_value=0.1, chunk=8,
    )
    assert nv > 0
    assert got_map == pytest.approx(float(want["mAP"]), abs=1e-5)
    np.testing.assert_allclose(got_cmc, np.asarray(want["cmc"]), atol=1e-6)
