"""DistanceMetric — the open-reid metric shim.

Mirrors the reference's [reid/dist_metric.py] (SURVEY.md §2 #14): wraps a
metric-learning algorithm ('euclidean' or 'kissme'), trains it on features
extracted from a labeled loader, and transforms features before distance
computation. SSG itself runs with 'euclidean' (plain L2 + re-ranking); the
kissme path is kept for surface parity.
"""

from __future__ import annotations

import numpy as np

from ssg_tpu.metric_learning import get_metric


class DistanceMetric:
    def __init__(self, algorithm: str = "euclidean", *args, **kwargs):
        self.algorithm = algorithm
        self.metric = get_metric(algorithm, *args, **kwargs)

    def train(self, model, variables, preprocessor):
        """Extract features from a labeled preprocessor stream and fit.

        Reference shape: ``DistanceMetric.train(model, data_loader)``; here
        the flax split (model, variables) replaces the torch module and the
        whole-body branch (index 0) feeds the metric.
        """
        if self.algorithm == "euclidean":
            return self
        from ssg_tpu.api import extract_features

        feats, pids, _, _ = extract_features(model, variables, preprocessor)
        self.metric.fit(np.asarray(feats[0]), pids)
        return self

    def transform(self, X):
        return self.metric.transform(X)
