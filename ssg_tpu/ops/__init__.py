"""TPU compute kernels (XLA + Pallas).

TPU-native replacements for the reference's third-party native compute
(SURVEY.md §2, bottom rows): the all-pairs distance matrix, k-reciprocal
re-ranking, batch-hard triplet mining, and ranking metrics — all as fused
XLA graphs or tiled Pallas kernels instead of numpy/Cython host loops.
"""

from ssg_tpu.ops.distance import pairwise_distance
from ssg_tpu.ops.rerank import re_ranking
from ssg_tpu.ops.triplet import batch_hard_triplet_loss
