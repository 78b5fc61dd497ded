"""Data-parallel placement helpers.

The reference's ``nn.DataParallel(model).cuda()`` (SURVEY.md §2 parallelism
row) becomes sharding annotations: replicate the params, shard the batch on
the mesh's data axis, and jit does the rest (XLA inserts the gradient
all-reduce). These helpers are the whole surface — there is no wrapper
module because SPMD needs none.

Both helpers delegate to ``multihost.global_put``: on a single-process mesh
that is a plain ``device_put``; on a process-spanning (DCN) mesh each
process contributes only its addressable shards, so DP extraction and
fine-tuning run multi-host with no further changes (every process computes
the identical host batch deterministically and ships its slice).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ssg_tpu.parallel.multihost import global_put


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place array leaves with the leading dim sharded over ``axis``."""
    return jax.tree.map(lambda x: global_put(mesh, x, P(axis)), tree)


def replicate(mesh: Mesh, tree):
    """Place array leaves fully replicated over the mesh (params/state)."""
    return jax.tree.map(lambda x: global_put(mesh, x, P()), tree)
