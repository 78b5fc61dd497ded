"""Fixed-seed pseudo-label golden test (SURVEY.md §4.4).

The golden file pins the full device chain (k-reciprocal re-ranking ->
auto-eps -> DBSCAN) on fixed synthetic features. Any semantic drift in the
kernels — top-k tie handling, eps bit-search, DBSCAN discovery order —
flips labels here before it can silently change training behavior.

Regenerate (only after an INTENDED semantic change) with the snippet in
git history that created tests/golden/pseudo_labels_seed42.npz.
"""

import os

import numpy as np

import jax.numpy as jnp

from ssg_tpu.api import cluster, re_ranking

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "pseudo_labels_seed42.npz")


def test_pseudo_labels_match_golden():
    g = np.load(GOLDEN)
    dist = re_ranking(features=jnp.asarray(g["feats"]), k1=10, k2=4,
                      lambda_value=0.1)
    labels, n, eps = cluster(dist, rho=0.02, min_samples=3)
    assert n == int(g["n_clusters"])
    np.testing.assert_array_equal(labels, g["labels"])
    # eps is fp-sensitive across backends; labels above are the hard check.
    assert abs(eps - float(g["eps"])) < 1e-4 * max(float(g["eps"]), 1e-9)
