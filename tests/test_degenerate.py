"""Degenerate-input robustness (the verify-skill flows): identical features
(all-tied distances), k1/k2 exceeding N, single-point datasets."""

import numpy as np

import jax.numpy as jnp

from ssg_tpu.api import cluster, re_ranking


def test_k1_larger_than_n_clamps():
    f = jnp.asarray(np.random.default_rng(0).normal(size=(12, 8)),
                    jnp.float32)
    d = re_ranking(features=f, k1=20, k2=6)  # k1+1 > N
    assert d.shape == (12, 12)
    assert np.isfinite(np.asarray(d)).all()


def test_identical_features_form_one_cluster():
    """All-zero distances: every point is mutually adjacent; sklearn would
    produce a single cluster for any eps >= 0."""
    f = jnp.ones((12, 8), jnp.float32)
    d = re_ranking(features=f, k1=5, k2=3)
    assert np.isfinite(np.asarray(d)).all()
    labels, n, _ = cluster(d, rho=0.1, min_samples=2)
    assert n == 1
    assert (labels == 0).all()


def test_tiny_n():
    f = jnp.asarray(np.random.default_rng(1).normal(size=(3, 4)), jnp.float32)
    d = re_ranking(features=f, k1=20, k2=6)
    assert d.shape == (3, 3) and np.isfinite(np.asarray(d)).all()
