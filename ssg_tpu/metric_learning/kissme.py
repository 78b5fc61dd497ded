"""KISSME metric learning (Koestinger et al., CVPR 2012), JAX-native.

The reference's DistanceMetric offers 'kissme' via the `metric_learn`
package ([reid/metric_learning/kissme.py], SURVEY.md §2 #14 — [MED present,
LOW used]; SSG itself uses plain Euclidean + re-ranking). KISSME learns a
Mahalanobis matrix M = Sigma_similar^-1 - Sigma_dissimilar^-1 from pairwise
difference covariances; distances are then (x-y)^T M (x-y).

TPU-shaped: pair sampling is index arithmetic on host, both covariances are
single GEMMs on device, and ``transform`` maps features through L where
M_psd = L L^T (eigen-clip to the PSD cone) so downstream distance kernels
stay plain Euclidean GEMMs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _pairs(y: np.ndarray, rng: np.random.Generator, max_pairs: int):
    """Similar pairs: all within-class combinations (capped); dissimilar:
    an equal number of random cross-class pairs."""
    sim = []
    for c in np.unique(y):
        idx = np.flatnonzero(y == c)
        if len(idx) < 2:
            continue
        a, b = np.meshgrid(idx, idx)
        m = a < b
        sim.append(np.stack([a[m], b[m]], 1))
    if not sim:
        raise ValueError("KISSME needs at least one class with >= 2 samples")
    sim = np.concatenate(sim, 0)
    if len(sim) > max_pairs:
        sim = sim[rng.choice(len(sim), max_pairs, replace=False)]
    n = len(sim)
    dis = np.empty((0, 2), np.int64)
    while len(dis) < n:
        cand = rng.integers(0, len(y), size=(2 * n, 2))
        cand = cand[y[cand[:, 0]] != y[cand[:, 1]]]
        dis = np.concatenate([dis, cand], 0)
    return sim, dis[:n]


class KISSME:
    def __init__(self, max_pairs: int = 50_000, eps: float = 1e-6, seed: int = 0):
        self.max_pairs = max_pairs
        self.eps = eps
        self.seed = seed
        self.M_ = None
        self.L_ = None

    def fit(self, X, y):
        X = jnp.asarray(X, jnp.float32)
        y = np.asarray(y)
        sim, dis = _pairs(y, np.random.default_rng(self.seed), self.max_pairs)

        def diff_cov(pairs):
            d = X[pairs[:, 0]] - X[pairs[:, 1]]
            c = jnp.dot(d.T, d, preferred_element_type=jnp.float32) / len(pairs)
            return c + self.eps * jnp.eye(X.shape[1], dtype=jnp.float32)

        M = jnp.linalg.inv(diff_cov(sim)) - jnp.linalg.inv(diff_cov(dis))
        # Project to the PSD cone so M = L L^T exists and transform() is a
        # plain linear map (eigen-clip, standard KISSME post-processing).
        w, V = jnp.linalg.eigh(M)
        w = jnp.maximum(w, 0.0)
        self.M_ = (V * w) @ V.T
        self.L_ = V * jnp.sqrt(w)
        return self

    def transform(self, X):
        if self.L_ is None:
            raise RuntimeError("KISSME.fit must run before transform")
        return jnp.dot(jnp.asarray(X, jnp.float32), self.L_,
                       preferred_element_type=jnp.float32)

    def distance(self, X, Y=None):
        """Mahalanobis distances under the learned (PSD-projected) M."""
        a = self.transform(X)
        b = a if Y is None else self.transform(Y)
        sq = (
            jnp.sum(a * a, 1, keepdims=True)
            + jnp.sum(b * b, 1, keepdims=True).T
            - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        )
        return jnp.maximum(sq, 0.0)
