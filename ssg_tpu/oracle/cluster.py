"""sklearn DBSCAN + SSG eps auto-selection oracle.

Pins the clustering step inlined in the reference's [selftraining.py]
(expected path — SURVEY.md §3.1): per feature group,

  tri = upper-triangle nonzero values of the re-ranked distance matrix
  eps = mean of the smallest round(rho * len(tri)) values   (rho ~ 1.6e-3)
  labels = DBSCAN(eps, min_samples=4, metric='precomputed').fit_predict(dist)

Noise points get label -1; cluster ids are assigned by sklearn in discovery
order (order of the lowest-index core point of each component), which the
on-device DBSCAN in ``ssg_tpu.cluster.dbscan`` reproduces exactly.
"""

from __future__ import annotations

import numpy as np
from sklearn.cluster import DBSCAN


def select_eps_np(dist: np.ndarray, rho: float = 1.6e-3) -> float:
    """SSG's eps rule: mean of the smallest rho-fraction of off-diagonal
    nonzero upper-triangle distances."""
    dist = np.asarray(dist)
    tri = np.triu(dist, 1)
    tri = tri[np.nonzero(tri)]
    tri = np.sort(tri, axis=None)
    top_num = int(np.round(rho * tri.size))
    return float(tri[:top_num].mean())


def dbscan_np(
    dist: np.ndarray,
    eps: float | None = None,
    min_samples: int = 4,
    rho: float = 1.6e-3,
) -> tuple[np.ndarray, float]:
    """DBSCAN on a precomputed distance matrix; returns (labels, eps)."""
    dist = np.asarray(dist, dtype=np.float64)
    if eps is None:
        eps = select_eps_np(dist, rho)
    labels = DBSCAN(eps=eps, min_samples=min_samples, metric="precomputed").fit_predict(
        dist
    )
    return labels.astype(np.int32), float(eps)
