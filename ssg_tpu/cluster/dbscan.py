"""On-device DBSCAN over a precomputed distance matrix.

TPU-native replacement for ``sklearn.cluster.DBSCAN(metric='precomputed')``
as used by the reference's clustering step ([selftraining.py], SURVEY.md
§3.1c). Produces *identical* labels to sklearn — not just up to permutation —
which makes the BASELINE.json fixed-seed pseudo-label parity checkable
exactly. Why identical is possible:

  * sklearn core points: |{j : d(i,j) <= eps}| >= min_samples (self included);
  * clusters are connected components of the core-core eps-graph, discovered
    by scanning i = 0..N-1 and BFS-ing from each unlabeled core point — so
    cluster ids are assigned in ascending order of each component's minimal
    core index;
  * a border point is labeled by the first BFS that reaches it, i.e. by the
    adjacent core component with the smallest minimal core index.

All three rules are order-free closed forms, computed here with fixed-shape
masked matrix ops: min-label propagation with path halving (pointer jumping)
converges in O(log N) rounds of O(N^2) work — no data-dependent Python, one
XLA graph, and the propagation matrix op is VPU/HBM-bandwidth bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("min_samples",))
def dbscan(
    dist: jax.Array, eps: jax.Array | float, min_samples: int = 4
) -> tuple[jax.Array, jax.Array]:
    """DBSCAN labels from a precomputed (N, N) distance matrix.

    Args:
      dist: (N, N) non-negative distances (need not be perfectly symmetric;
        the eps-graph is symmetrized with OR, matching sklearn's
        radius_neighbors on a dense matrix... sklearn treats the matrix
        row-wise; we symmetrize to be safe for fp asymmetry).
      eps: neighborhood radius (closed ball, d <= eps — sklearn semantics).
      min_samples: core-point threshold, self included.

    Returns:
      (labels, num_clusters): labels is (N,) int32 with -1 for noise and
      cluster ids 0..C-1 in sklearn discovery order.
    """
    n = dist.shape[0]
    big = jnp.int32(n)
    adj = dist <= eps
    adj = adj | adj.T
    core = jnp.sum(adj, axis=1) >= min_samples

    idx = jnp.arange(n, dtype=jnp.int32)
    adj_core = adj & core[None, :] & core[:, None]

    # Connected components by transitive-closure squaring: each round
    # doubles the reachable path length with ONE boolean GEMM on the MXU
    # (0/1 bf16 operands, fp32 accumulation — nonzero-ness is exact), so
    # convergence takes ceil(log2(diameter)) rounds instead of a
    # diameter-length chain of latency-bound min-propagation steps.
    reach0 = adj_core | (jnp.eye(n, dtype=bool) & core[:, None])

    def body(state):
        reach, _ = state
        r16 = reach.astype(jnp.bfloat16)
        new = reach | (
            jnp.dot(r16, r16, preferred_element_type=jnp.float32) > 0.0
        )
        return new, jnp.any(new != reach)

    reach, _ = jax.lax.while_loop(
        lambda s: s[1], body, (reach0, jnp.bool_(True))
    )

    # Core label = smallest index in the component (sklearn discovery order).
    labels = jnp.where(
        core, jnp.min(jnp.where(reach, idx[None, :], big), axis=1), big
    )

    # Border points: nearest (by discovery order) adjacent core component.
    core_neigh_label = jnp.min(
        jnp.where(adj & core[None, :], labels[None, :], big), axis=1
    )
    raw = jnp.where(core, labels, core_neigh_label)  # big -> noise

    # Renumber roots to 0..C-1 in ascending-root order (= discovery order).
    is_root = core & (labels == idx)
    csum = jnp.cumsum(is_root.astype(jnp.int32))
    root_rank = csum - 1  # rank of each root index
    out = jnp.where(raw < big, jnp.take(root_rank, jnp.where(raw < big, raw, 0)), -1)
    return out.astype(jnp.int32), jnp.sum(is_root, dtype=jnp.int32)
