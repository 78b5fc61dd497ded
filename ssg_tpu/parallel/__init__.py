"""Multi-chip scale-out over a jax.sharding.Mesh.

The reference's only parallelism is single-process ``nn.DataParallel``
(SURVEY.md §2 parallelism row). The TPU rebuild replaces it with
single-controller SPMD over the ICI mesh:

  * data-parallel extract/train via sharding annotations (dp.py);
  * the N x N analytics (distance, eps, DBSCAN, k-reciprocal) row-sharded
    across chips with ring collectives (sharded.py, rerank.py) — the scale
    axis that makes MSMT17's 126k-image matrix fit (SURVEY.md §5
    long-context row: 126k^2 fp32 = 63 GB > one chip's HBM; /8 = 8 GB).

All paths are testable on the virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``, SURVEY.md §4.3).
"""

from ssg_tpu.parallel.dp import replicate, shard_batch
from ssg_tpu.parallel.mesh import make_mesh
from ssg_tpu.parallel.multihost import global_put, initialize as initialize_multihost
from ssg_tpu.parallel.sharded import (
    sharded_dbscan,
    sharded_pairwise_distance,
    sharded_select_eps,
)
from ssg_tpu.parallel.rerank import sharded_re_ranking
from ssg_tpu.parallel.streaming import (streaming_cluster,
                                        streaming_cluster_groups,
                                        streaming_rerank_eval)
