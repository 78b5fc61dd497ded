"""Multi-host (DCN) mesh support.

The reference is strictly single-node (SURVEY.md §2 comm-backend row:
``nn.DataParallel`` only). The TPU rebuild's scale driver is BASELINE
config 5 (MSMT17, 126k images): the streaming pipeline's own HBM math
(parallel/streaming.py header) needs >= 16 chips, i.e. multiple v5e-8
hosts joined over DCN. JAX's multi-controller model makes this almost
free: after ``jax.distributed.initialize`` every process sees ALL devices
through ``jax.devices()``, so ``make_mesh()`` already builds the global
mesh and the shard_map collectives ride ICI within a host and DCN across
hosts. What remains — and lives here — is data placement: a host numpy
array cannot be auto-committed to devices another process owns, so global
inputs are assembled shard-by-shard from each process's addressable slice
(``global_put``).

Multi-host coverage: every product path places through ``global_put`` —
the clustering pipelines (``streaming_cluster``, ``streaming_rerank_eval``)
directly, and data-parallel extraction / fine-tuning via ``parallel.dp``'s
``shard_batch``/``replicate``, which delegate here. The full SSG loop
(extract -> cluster -> fine-tune) therefore spans processes end-to-end;
tests/test_multihost.py runs one complete iteration on a 2-process x
4-device cluster and asserts exact parity with the single-process mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Join the multi-process JAX runtime (idempotent).

    On Cloud TPU pods call with no arguments (auto-discovery from the TPU
    environment). For explicit clusters (including multi-process CPU tests)
    pass ``coordinator`` ("host:port"), ``num_processes`` and
    ``process_id``. Must run before the first backend touch.
    """
    if jax.distributed.is_initialized():
        return  # already initialized (idempotent)
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
        if local_device_ids is not None:
            kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def is_multiprocess(mesh: Mesh) -> bool:
    """True when ``mesh`` spans devices of more than one process."""
    procs = {d.process_index for d in mesh.devices.flat}
    return len(procs) > 1


def global_put(mesh: Mesh, arr, spec: P):
    """Place ``arr`` (identical host copy on every process) on ``mesh`` with
    ``spec``. Single-process: a plain device_put. Multi-process: each
    process contributes only its addressable shards
    (jax.make_array_from_callback), producing one global jax.Array —
    the multi-host replacement for jit's automatic input commitment.
    A global jax.Array input (e.g. device-resident features flowing from
    sharded extraction into clustering) is resharded in-program instead:
    a jitted identity with out_shardings, the SPMD reshard.
    """
    sharding = NamedSharding(mesh, spec)
    if not is_multiprocess(mesh):
        return jax.device_put(arr, sharding)
    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        return jax.jit(lambda x: x, out_shardings=sharding)(arr)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )
