"""Ring primitives over a 1-D mesh (shard_map building blocks).

Everything here operates on row *stripes*: device p of P holds rows
``p*r:(p+1)*r`` of a global (N, N) or (N, D) array. Three primitives cover
all of SSG's sharded analytics (the scaling-book recipe: rotate shards over
ICI, compute local tiles — structurally the ring-attention KV rotation,
SURVEY.md §5 long-context row):

  * ``stripe_transpose`` — row stripe of A -> row stripe of A^T, one
    all_to_all (the (N/P)^2-block exchange).
  * ``ring_pairwise`` — acc[i, j] = fn(A_i, B_j) for all global j, rotating
    B stripes with ppermute; fn computes an (r_a, r_b) tile per visit
    (used for GEMM-shaped overlap counts and the L1/Jaccard min-sum).
  * ``ring_contract`` — A_stripe @ B for B row-sharded along the
    contraction axis (used for set-union expansion and query expansion).

Static P (mesh size) lets these unroll in Python so XLA overlaps each
ppermute with the next tile's compute.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _shift_perm(p: int):
    return [(i, (i + 1) % p) for i in range(p)]


def stripe_transpose(x_local: jax.Array, axis: str = "data") -> jax.Array:
    """Row stripe (r, N) of A  ->  row stripe (r, N) of A^T."""
    # all_to_all sends column-block k of my stripe to device k; I receive
    # every device's block of my columns, concatenated along rows ->
    # (N, r) = A[:, my_cols]; transpose = my row stripe of A^T.
    full_cols = jax.lax.all_to_all(
        x_local, axis, split_axis=1, concat_axis=0, tiled=True
    )
    return full_cols.T


def stripe_transpose_packed(x_local: jax.Array, axis: str = "data") -> jax.Array:
    """Bit-packed row stripe (r, N//8) of boolean A -> packed stripe of A^T.

    all_to_all cannot exchange at bit granularity, so the transpose walks
    the ring: each step unpacks only the (r, r) block destined for this
    device, transposes it, and repacks — peak bool transient is one r x r
    block, never the full stripe. Requires r % 8 == 0.
    """
    from ssg_tpu.ops.bits import pack_bits, unpack_bits

    p = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    r = x_local.shape[0]
    rb = r // 8
    acc = jnp.zeros((r, p * rb), jnp.uint8)
    block = x_local
    for s in range(p):
        owner = (me - s) % p
        # Owner's rows x my columns, as packed bytes.
        sub = jax.lax.dynamic_slice(block, (0, me * rb), (r, rb))
        t = pack_bits(unpack_bits(sub, r).T)  # (r_mine, r_owner//8)
        acc = jax.lax.dynamic_update_slice(acc, t, (0, owner * rb))
        if s + 1 < p:
            block = jax.lax.ppermute(block, axis, _shift_perm(p))
    return acc


def ring_pairwise(
    a_local: jax.Array,
    b_local: jax.Array,
    pair_fn: Callable[[jax.Array, jax.Array], jax.Array],
    axis: str = "data",
) -> jax.Array:
    """acc (r_a, N) with acc[:, owner_cols] = pair_fn(a_local, B_owner)."""
    p = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    r = b_local.shape[0]
    acc = jnp.zeros((a_local.shape[0], p * r), jnp.float32)
    block = b_local
    for s in range(p):
        owner = (me - s) % p
        tile = pair_fn(a_local, block).astype(jnp.float32)  # (r_a, r)
        acc = jax.lax.dynamic_update_slice(acc, tile, (0, owner * r))
        if s + 1 < p:
            block = jax.lax.ppermute(block, axis, _shift_perm(p))
    return acc


def ring_gather_sum(
    idx: jax.Array, b_local: jax.Array, axis: str = "data"
) -> jax.Array:
    """out[i] = sum_t B[idx[i, t]] for B row-sharded as (r, M) stripes.

    The one-hot-GEMM formulation (membership (b, N) @ B via ring_contract)
    pays b*N*M fp32 MACs per device for what is a k-row gather-sum
    (k = idx.shape[1], e.g. the k2 ~ 6 of query expansion) — ~N/k fewer
    FLOPs this way. Rows of idx must be distinct per row (top-k output);
    accumulation order is t-ascending within each visit, visits in ring
    order — deterministic and independent of column blocking.
    """
    p = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    r = b_local.shape[0]
    acc = jnp.zeros((idx.shape[0], b_local.shape[1]), jnp.float32)
    block = b_local
    for s in range(p):
        owner = (me - s) % p
        loc = idx - owner * r
        hit = (loc >= 0) & (loc < r)
        # One (b, M) gather per list slot: the (b, k, M) form would
        # materialize a multi-hundred-MB transient at production chunks.
        for t in range(idx.shape[1]):
            g = jnp.take(block, jnp.clip(loc[:, t], 0, r - 1), axis=0)
            acc = acc + jnp.where(hit[:, t, None], g, 0.0)
        if s + 1 < p:
            block = jax.lax.ppermute(block, axis, _shift_perm(p))
    return acc


def ring_contract(
    a_local: jax.Array,
    b_local: jax.Array,
    axis: str = "data",
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """A_stripe (r_a, N) @ B (N, M) with B row-sharded as (r, M) stripes.

    ``precision`` defaults to HIGHEST for real-valued contractions (query
    expansion over V). Pass ``None`` for 0/1 mask GEMMs: the products are
    exact in bf16 and the fp32 accumulation keeps counts exact, while
    HIGHEST would force XLA off the native-bf16 MXU path (measured 6x on
    the streaming expansion GEMM at N=16,384).
    """
    p = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    r = b_local.shape[0]
    acc = jnp.zeros((a_local.shape[0], b_local.shape[1]), jnp.float32)
    block = b_local
    for s in range(p):
        owner = (me - s) % p
        a_cols = jax.lax.dynamic_slice(
            a_local, (0, owner * r), (a_local.shape[0], r)
        )
        acc = acc + jnp.dot(
            a_cols,
            block,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        if s + 1 < p:
            block = jax.lax.ppermute(block, axis, _shift_perm(p))
    return acc
