"""CPU oracle implementations (numpy / scikit-learn / torch-CPU).

The reference repo (SHI-Labs/Self-Similarity-Grouping) mount was empty, so
these oracles pin down the *published algorithms* the reference implements
(SURVEY.md §3): k-reciprocal re-ranking (Zhong et al., CVPR 2017,
arXiv:1701.08398), sklearn DBSCAN with SSG's eps auto-selection rule, and the
expected-path behaviors of [reid/rerank.py], [reid/evaluators.py],
[reid/evaluation_metrics/ranking.py].

Every TPU kernel in ``ssg_tpu.ops`` / ``ssg_tpu.cluster`` has a parity test
against these oracles (SURVEY.md §4).
"""

from ssg_tpu.oracle.distance import pairwise_distance_np
from ssg_tpu.oracle.rerank import re_ranking_np
from ssg_tpu.oracle.cluster import dbscan_np, select_eps_np
from ssg_tpu.oracle.ranking import cmc_np, mean_ap_np
