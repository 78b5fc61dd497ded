"""Kernel-level parity tests vs the CPU oracles (SURVEY.md §4.1).

Runs on the virtual CPU mesh backend; Pallas kernels run in interpret mode
there, so the same code paths are exercised that run compiled on TPU.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ssg_tpu.cluster import dbscan, select_eps
from ssg_tpu.ops import batch_hard_triplet_loss, pairwise_distance, re_ranking
from ssg_tpu.ops.l1 import l1_distance
from ssg_tpu.oracle import (
    dbscan_np,
    pairwise_distance_np,
    re_ranking_np,
    select_eps_np,
)


@pytest.fixture
def feats(rng):
    # Clustered features: 12 ids x 10 instances + noise, 32-dim.
    centers = rng.normal(size=(12, 32)) * 3.0
    pts = centers[np.repeat(np.arange(12), 10)] + rng.normal(size=(120, 32)) * 0.4
    scatter = rng.normal(size=(20, 32)) * 6.0
    return np.concatenate([pts, scatter], 0).astype(np.float32)


def test_pairwise_distance_xla_vs_oracle(rng):
    x = rng.normal(size=(57, 40)).astype(np.float32)
    y = rng.normal(size=(33, 40)).astype(np.float32)
    d = np.asarray(pairwise_distance(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(d, pairwise_distance_np(x, y), rtol=1e-4, atol=1e-4)


def test_pairwise_distance_pallas_vs_oracle(rng):
    x = rng.normal(size=(130, 70)).astype(np.float32)  # forces padding
    d = np.asarray(pairwise_distance(jnp.asarray(x), impl="pallas"))
    np.testing.assert_allclose(d, pairwise_distance_np(x), rtol=1e-4, atol=1e-4)


def test_l1_pallas_and_xla_vs_naive(rng):
    x = rng.normal(size=(70, 150)).astype(np.float32)
    naive = np.abs(x[:, None, :] - x[None, :, :]).sum(-1)
    for impl in ("xla", "pallas"):
        d = np.asarray(l1_distance(jnp.asarray(x), impl=impl))
        np.testing.assert_allclose(d, naive, rtol=1e-4, atol=1e-4)


def test_select_eps_exact_parity(feats):
    d = pairwise_distance_np(feats, squared=False)
    for rho in (1.6e-3, 0.016, 0.1):
        ours = float(select_eps(jnp.asarray(d), rho=rho))
        ref = select_eps_np(d, rho=rho)
        assert ours == pytest.approx(ref, rel=1e-6), rho


def test_dbscan_exact_label_parity(feats):
    d = pairwise_distance_np(feats, squared=False)
    for eps_scale in (0.5, 1.0, 2.0):
        eps = select_eps_np(d, rho=0.02) * eps_scale
        ref, _ = dbscan_np(d, eps=eps, min_samples=4)
        ours, n_clusters = dbscan(jnp.asarray(d), eps, min_samples=4)
        ours = np.asarray(ours)
        # Identical ids, not just permutation-equivalent (sklearn order).
        np.testing.assert_array_equal(ours, ref)
        assert int(n_clusters) == ref.max() + 1


def test_dbscan_min_samples_semantics():
    # 3 points pairwise within eps; with min_samples=4 all are noise
    # (self-inclusive counting: degree 3 < 4).
    d = np.zeros((3, 3), np.float32) + 0.1
    np.fill_diagonal(d, 0.0)
    labels, n = dbscan(jnp.asarray(d), 0.2, min_samples=4)
    assert int(n) == 0 and (np.asarray(labels) == -1).all()
    labels, n = dbscan(jnp.asarray(d), 0.2, min_samples=3)
    assert int(n) == 1 and (np.asarray(labels) == 0).all()


def test_dbscan_border_assignment_matches_sklearn():
    # A border point equidistant-adjacent to two clusters must take the
    # cluster discovered first (lower min core index) — construct it.
    # Points 0-3: cluster A (chain); 5-8: cluster B; point 4: border of both.
    n = 9
    big = 10.0
    d = np.full((n, n), big, np.float32)
    np.fill_diagonal(d, 0.0)

    def link(i, j, v=1.0):
        d[i, j] = d[j, i] = v

    for grp in ([0, 1, 2, 3], [5, 6, 7, 8]):
        for i in grp:
            for j in grp:
                if i != j:
                    link(i, j)
    link(3, 4)  # border to A
    link(5, 4)  # border to B
    ref, _ = dbscan_np(d, eps=1.5, min_samples=4)
    ours, _ = dbscan(jnp.asarray(d), 1.5, min_samples=4)
    np.testing.assert_array_equal(np.asarray(ours), ref)
    assert ref[4] == ref[0]  # border joined cluster A (discovered first)


def test_re_ranking_parity_features(feats):
    ref = re_ranking_np(features=feats, k1=20, k2=6, lambda_value=0.1)
    ours = np.asarray(re_ranking(features=jnp.asarray(feats), k1=20, k2=6,
                                 lambda_value=0.1))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-5)


def test_re_ranking_parity_various_k(rng):
    f = rng.normal(size=(80, 16)).astype(np.float32)
    for k1, k2, lam in [(10, 3, 0.3), (8, 1, 0.1), (25, 6, 0.2)]:
        ref = re_ranking_np(features=f, k1=k1, k2=k2, lambda_value=lam)
        ours = np.asarray(
            re_ranking(features=jnp.asarray(f), k1=k1, k2=k2, lambda_value=lam)
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-5)


def test_rerank_then_dbscan_label_parity(feats):
    """The BASELINE.json contract: pseudo-labels agree with the CPU reference
    end-to-end on fixed seeds."""
    ref_dist = re_ranking_np(features=feats, k1=20, k2=6, lambda_value=0.1)
    ref_labels, ref_eps = dbscan_np(ref_dist, rho=0.02)
    our_dist = re_ranking(features=jnp.asarray(feats), k1=20, k2=6, lambda_value=0.1)
    our_eps = select_eps(our_dist, rho=0.02)
    our_labels, _ = dbscan(our_dist, our_eps, min_samples=4)
    assert float(our_eps) == pytest.approx(ref_eps, rel=1e-4)
    np.testing.assert_array_equal(np.asarray(our_labels), ref_labels)


def test_batch_hard_triplet_vs_naive_torch(rng):
    # Oracle: naive O(B^2) torch batch-hard (SURVEY.md §4.1).
    b, dim = 32, 16
    emb = rng.normal(size=(b, dim)).astype(np.float32)
    labels = np.repeat(np.arange(8), 4).astype(np.int32)
    margin = 0.3

    t = torch.tensor(emb)
    td = torch.cdist(t, t).clamp(min=1e-6)
    tl = torch.tensor(labels)
    pos = tl[:, None] == tl[None, :]
    d_ap = torch.where(pos, td, torch.tensor(-1e9)).max(1).values
    d_an = torch.where(~pos, td, torch.tensor(1e9)).min(1).values
    ref_loss = torch.clamp(d_ap - d_an + margin, min=0).mean().item()

    loss, prec = batch_hard_triplet_loss(jnp.asarray(emb), jnp.asarray(labels), margin)
    assert float(loss) == pytest.approx(ref_loss, rel=1e-4)
    assert 0.0 <= float(prec) <= 1.0


def test_triplet_gradient_flows(rng):
    import jax

    emb = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    labels = jnp.asarray(np.repeat(np.arange(4), 4))
    g = jax.grad(lambda e: batch_hard_triplet_loss(e, labels)[0])(emb)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0


def test_triplet_masks_noise_labels(rng):
    """Rows with label -1 are excluded as anchors and as pos/neg of others;
    with no noise the loss equals the unmasked value."""
    from ssg_tpu.ops.triplet import batch_hard_triplet_loss

    x = jnp.asarray(rng.normal(size=(12, 16)).astype(np.float32))
    y = np.repeat(np.arange(3), 4).astype(np.int32)
    base_loss, base_prec = batch_hard_triplet_loss(x, jnp.asarray(y), 0.3)

    # Mark one full identity as noise: result must equal the loss computed
    # on the remaining rows alone.
    y_noise = y.copy()
    y_noise[y == 2] = -1
    masked_loss, _ = batch_hard_triplet_loss(x, jnp.asarray(y_noise), 0.3)
    sub_loss, _ = batch_hard_triplet_loss(x[:8], jnp.asarray(y[:8]), 0.3)
    assert float(masked_loss) == pytest.approx(float(sub_loss), rel=1e-5)
    assert float(masked_loss) != pytest.approx(float(base_loss), rel=1e-3)

    # All-noise labels: zero loss, no NaNs.
    all_noise, prec = batch_hard_triplet_loss(
        x, jnp.asarray(np.full(12, -1, np.int32)), 0.3)
    assert float(all_noise) == 0.0 and np.isfinite(float(prec))
