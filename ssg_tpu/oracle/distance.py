"""Numpy pairwise-distance oracle.

Mirrors the reference's ``pairwise_distance`` in [reid/evaluators.py]
(expected path — SURVEY.md §2 #6): expanded squared-Euclidean via GEMM,
``d(x, y) = |x|^2 + |y|^2 - 2 x·y``.
"""

from __future__ import annotations

import numpy as np


def pairwise_distance_np(
    x: np.ndarray, y: np.ndarray | None = None, squared: bool = True
) -> np.ndarray:
    """All-pairs (squared) Euclidean distance.

    Args:
      x: (N, D) float array.
      y: (M, D) float array; defaults to ``x`` (symmetric case used by SSG's
         clustering step).
      squared: if False, return the Euclidean distance (sqrt of clamped
         squared distance).

    Returns:
      (N, M) float32 distance matrix.
    """
    x = np.asarray(x, dtype=np.float32)
    y = x if y is None else np.asarray(y, dtype=np.float32)
    x2 = (x * x).sum(axis=1, keepdims=True)  # (N, 1)
    y2 = (y * y).sum(axis=1, keepdims=True).T  # (1, M)
    d = x2 + y2 - 2.0 * (x @ y.T)
    np.maximum(d, 0.0, out=d)
    if not squared:
        np.sqrt(d, out=d)
    return d.astype(np.float32)
