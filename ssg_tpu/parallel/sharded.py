"""Row-sharded distance / eps / DBSCAN over the device mesh.

Sharded rebuilds of ssg_tpu.ops.distance and ssg_tpu.cluster for matrices
that exceed one chip's HBM (BASELINE.json config 5: MSMT17's 126k x 126k).
Numerics match the single-device versions (same formulas, fp32), validated
on the virtual CPU mesh (tests/test_parallel.py).

Conventions: N is padded to a multiple of the mesh size inside each wrapper;
padded rows/cols are masked out of every decision (never out of GEMMs —
masking happens on counts, top-k scores, and labels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssg_tpu.cluster.eps import _kth_smallest_bits
from ssg_tpu.ops._compat import round_up


def _pad_rows(x: np.ndarray | jax.Array, mult: int, value=0.0):
    n = x.shape[0]
    npad = round_up(n, mult)
    if npad == n:
        return jnp.asarray(x)
    pad = jnp.full((npad - n, *x.shape[1:]), value, dtype=x.dtype)
    return jnp.concatenate([jnp.asarray(x), pad], axis=0)


def _pad_square(d: jax.Array, mult: int, value):
    """Pad an (N, N) matrix to (npad, npad), npad = round_up(N, mult)."""
    n = d.shape[0]
    npad = round_up(n, mult)
    if npad == n:
        return jnp.asarray(d)
    out = jnp.full((npad, npad), value, dtype=d.dtype)
    return out.at[:n, :n].set(d)


def _global_rows(r: int, axis: str = "data"):
    """Global row indices of this device's stripe, shape (r, 1)."""
    me = jax.lax.axis_index(axis)
    return me * r + jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)


def sharded_pairwise_distance(
    features: jax.Array, mesh: Mesh, squared: bool = True
) -> jax.Array:
    """(N, N) squared-Euclidean distance, row-sharded over the mesh.

    Features are all-gathered (N x D is small next to N x N); each device
    computes its row stripe on its own MXU. Returns a global jax.Array laid
    out row-sharded — downstream sharded consumers keep it in place.
    """
    p = mesh.shape["data"]
    n = features.shape[0]
    f = _pad_rows(features.astype(jnp.float32), p)

    def stripe(f_local):
        f_all = jax.lax.all_gather(f_local, "data", tiled=True)
        x2 = jnp.sum(f_local * f_local, axis=1, keepdims=True)
        y2 = jnp.sum(f_all * f_all, axis=1, keepdims=True).T
        d = x2 + y2 - 2.0 * jnp.dot(
            f_local, f_all.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d = jnp.maximum(d, 0.0)
        return d if squared else jnp.sqrt(d)

    out = jax.jit(
        jax.shard_map(
            stripe, mesh=mesh, in_specs=P("data", None),
            out_specs=P("data", None),
        )
    )(f)
    return out[:n, :n]


def sharded_select_eps(dist: jax.Array, mesh: Mesh, rho: float = 1.6e-3) -> jax.Array:
    """Sharded twin of cluster.select_eps: same value, only psum'd counts
    touch the (row-sharded) matrix."""
    p = mesh.shape["data"]
    n = dist.shape[0]
    d = _pad_rows(dist.astype(jnp.float32), p)

    def impl(d_local):
        r = d_local.shape[0]
        rows = _global_rows(r)
        cols = jax.lax.broadcasted_iota(jnp.int32, (r, d_local.shape[1]), 1)
        valid = (cols > rows) & (cols < n) & (rows < n) & (d_local != 0.0)

        m = jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), "data")
        k = jnp.maximum(jnp.round(rho * m.astype(jnp.float32)).astype(jnp.int32), 1)

        bits = jax.lax.bitcast_convert_type(d_local, jnp.int32)

        def psum_count(x_bits, v, thresh):
            return jax.lax.psum(
                jnp.sum((v & (x_bits <= thresh)).astype(jnp.int32)), "data"
            )

        def body(_, lo_hi):
            lo, hi = lo_hi
            mid = lo + (hi - lo) // 2
            cnt = psum_count(bits, valid, mid)
            take_low = cnt >= k
            return jnp.where(take_low, lo, mid + 1), jnp.where(take_low, mid, hi)

        lo, hi = jnp.int32(0), jnp.int32(0x7F7FFFFF)
        _, kth_bits = jax.lax.fori_loop(0, 31, body, (lo, hi))
        kth = jax.lax.bitcast_convert_type(kth_bits, jnp.float32)

        below = valid & (d_local < kth)
        cnt_below = jax.lax.psum(jnp.sum(below.astype(jnp.int32)), "data")
        sum_below = jax.lax.psum(jnp.sum(jnp.where(below, d_local, 0.0)), "data")
        total = sum_below + (k - cnt_below).astype(jnp.float32) * kth
        return total / k.astype(jnp.float32)

    return jax.jit(
        jax.shard_map(impl, mesh=mesh, in_specs=P("data", None), out_specs=P())
    )(d)


def sharded_dbscan(
    dist: jax.Array,
    eps: jax.Array | float,
    mesh: Mesh,
    min_samples: int = 4,
) -> tuple[jax.Array, jax.Array]:
    """Distributed DBSCAN: identical labels to cluster.dbscan / sklearn.

    The adjacency stripe stays sharded; the (N,) label vector is replicated
    (tiny) and refreshed by one all_gather per propagation round, with a
    psum'd convergence flag (SURVEY.md §5 comm-backend row).
    """
    p = mesh.shape["data"]
    n = dist.shape[0]
    d = _pad_square(dist.astype(jnp.float32), p, value=jnp.inf)
    npad = d.shape[0]
    big = jnp.int32(npad)

    def impl(d_local, eps_val):
        r = d_local.shape[0]
        rows = _global_rows(r)
        cols = jax.lax.broadcasted_iota(jnp.int32, (r, npad), 1)
        in_range = (rows < n) & (cols < n)

        adj = (d_local <= eps_val) & in_range
        # Symmetrize (single-device twin ORs with the transpose).
        from ssg_tpu.parallel.ring import stripe_transpose

        adj = adj | stripe_transpose(adj)
        degree = jnp.sum(adj.astype(jnp.int32), axis=1)
        core_local = degree >= min_samples  # (r,)
        core = jax.lax.all_gather(core_local, "data", tiled=True)  # (npad,)

        gidx = rows[:, 0]
        labels_local = jnp.where(core_local, gidx, big)
        labels = jax.lax.all_gather(labels_local, "data", tiled=True)

        adj_core = adj & core_local[:, None] & core[None, :]

        def propagate(labels):
            neigh = jnp.where(adj_core, labels[None, :], big)
            new_local = jnp.minimum(labels[gidx], jnp.min(neigh, axis=1))
            new = jax.lax.all_gather(new_local, "data", tiled=True)
            # Path halving (replicated, cheap).
            hop = jnp.where(new < big, new, 0)
            return jnp.where(new < big, jnp.minimum(new, jnp.take(new, hop)), new)

        def cond(state):
            return state[1]

        def body(state):
            labels, _ = state
            new = propagate(labels)
            return new, jnp.any(new != labels)

        # Initial flag must carry the same varying-over-mesh type as the
        # all_gather'd labels (shard_map's varying-axes typing).
        start = jax.lax.pcast(jnp.bool_(True), ("data",), to="varying")
        labels, _ = jax.lax.while_loop(cond, body, (labels, start))

        # Border points (replicated finish, identical on every device).
        core_neigh_local = jnp.min(
            jnp.where(adj & core[None, :], labels[None, :], big), axis=1
        )
        core_neigh = jax.lax.all_gather(core_neigh_local, "data", tiled=True)
        raw = jnp.where(core, labels, core_neigh)

        idx = jnp.arange(npad, dtype=jnp.int32)
        is_root = core & (labels == idx)
        root_rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1
        out = jnp.where(
            raw < big, jnp.take(root_rank, jnp.where(raw < big, raw, 0)), -1
        )
        return out.astype(jnp.int32), jnp.sum(is_root.astype(jnp.int32))

    # check_vma=False: outputs are value-replicated (built from all_gathers)
    # but carry varying types the static replication checker can't infer.
    labels, n_clusters = jax.jit(
        jax.shard_map(
            impl, mesh=mesh, in_specs=(P("data", None), P()),
            out_specs=(P(), P()), check_vma=False,
        )
    )(d, jnp.float32(eps))
    return labels[:n], n_clusters
