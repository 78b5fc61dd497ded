"""Data-parallel placement helpers.

The reference's ``nn.DataParallel(model).cuda()`` (SURVEY.md §2 parallelism
row) becomes sharding annotations: replicate the params, shard the batch on
the mesh's data axis, and jit does the rest (XLA inserts the gradient
all-reduce). These helpers are the whole surface — there is no wrapper
module because SPMD needs none.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place array leaves with the leading dim sharded over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    """Place array leaves fully replicated over the mesh (params/state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
