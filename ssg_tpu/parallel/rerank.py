"""Mesh-sharded k-reciprocal re-ranking.

The (N, N) matrices of ops/rerank.py (original distance, rank masks, V,
Jaccard) are row-sharded over the mesh; cross-row steps become ring
collectives (parallel/ring.py):

  reciprocity R = M ∧ Mᵀ          -> stripe_transpose  (all_to_all)
  overlap |R(i) ∩ Rh(c)|          -> ring_pairwise with an MXU tile GEMM
  expansion (Q @ Rh), QE (A2 @ V) -> ring_contract (contraction sharded)
  Jaccard L1 min-sum              -> ring_pairwise with the L1 tile kernel

Everything is one shard_map'd SPMD program per call; per-device HBM is
O(N^2 / P), which is what makes MSMT17 (126k: 63 GB fp32 full matrix ->
8 GB/chip on v5e-8) feasible (BASELINE.json config 5).

Numerics match ops.re_ranking (fp32, HIGHEST matmul precision); the
column-max normalization exploits the symmetry of the squared-Euclidean
matrix to avoid a global transpose of the distance stripe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ssg_tpu.ops._compat import on_tpu, round_up
from ssg_tpu.ops.l1 import _l1_pallas, _l1_xla
from ssg_tpu.ops.topk import exact_min_k
from ssg_tpu.parallel.ring import ring_contract, ring_pairwise, stripe_transpose
from ssg_tpu.parallel.sharded import _global_rows, _pad_rows


def _membership_stripe(indices: jax.Array, npad: int) -> jax.Array:
    """(r, k) per-row index lists -> (r, npad) boolean mask."""
    r = indices.shape[0]
    rows = jnp.arange(r, dtype=jnp.int32)[:, None]
    mask = jnp.zeros((r, npad), dtype=bool)
    return mask.at[rows, indices].set(True)


def sharded_re_ranking(
    features: jax.Array,
    mesh: Mesh,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.1,
) -> jax.Array:
    """Row-sharded twin of ops.re_ranking(features=...). Returns the (N, N)
    re-ranked distance, row-sharded over the mesh."""
    p = mesh.shape["data"]
    n = features.shape[0]
    f = _pad_rows(features.astype(jnp.float32), p)
    npad = f.shape[0]
    k1 = min(int(k1), n - 1)  # k lists can't exceed N (tiny-input clamp)
    k2 = min(int(k2), n - 1)
    half = int(round(k1 / 2.0))
    use_pallas_l1 = on_tpu()

    def impl(f_local):
        r = f_local.shape[0]
        rows = _global_rows(r)  # (r, 1) global row ids
        row_valid = rows[:, 0] < n  # (r,)
        col_valid = (
            jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1)[0] < n
        )  # (npad,)

        # --- original squared-Euclidean stripe -------------------------
        f_all = jax.lax.all_gather(f_local, "data", tiled=True)
        x2 = jnp.sum(f_local * f_local, axis=1, keepdims=True)
        y2 = jnp.sum(f_all * f_all, axis=1, keepdims=True).T
        d = jnp.maximum(
            x2 + y2 - 2.0 * jnp.dot(
                f_local, f_all.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ),
            0.0,
        )

        # Column-max normalize + transpose. d is symmetric, so the
        # transposed-normalized stripe is a row rescale:
        # ((D/colmax).T)[i, :] = D[i, :] / colmax[i].
        col_max_local = jnp.max(
            jnp.where(row_valid[:, None], d, -jnp.inf), axis=0
        )  # (npad,) max over my valid rows
        col_max = jnp.maximum(jax.lax.pmax(col_max_local, "data"), 1e-12)
        row_scale = jnp.take(col_max, rows[:, 0])  # colmax at my global rows
        orig = d / row_scale[:, None]

        # --- rank-list membership masks --------------------------------
        # exact_min_k returns SORTED neighbors, so the k1/2 and k2 lists
        # are prefix slices — one selection pass instead of three (and on
        # TPU the blocked prefilter instead of a full-width sort).
        score = jnp.where(col_valid[None, :], orig, jnp.inf)
        _, nn1 = exact_min_k(score, k1 + 1)
        nnh = nn1[:, : half + 1]
        valid2d = row_valid[:, None] & col_valid[None, :]
        m1 = _membership_stripe(nn1, npad) & valid2d
        mh = _membership_stripe(nnh, npad) & valid2d

        r_mask = m1 & stripe_transpose(m1)  # k-reciprocal sets (stripe)
        rh_mask = mh & stripe_transpose(mh)
        # bf16 mask stripes: 0/1 values, fp32 accumulation — counts exact,
        # MXU at native bf16 rate, and half the per-chip HBM for the two
        # biggest stripes (matters for the O(N^2/P) memory envelope).
        rf = r_mask.astype(jnp.bfloat16)
        rhf = rh_mask.astype(jnp.bfloat16)

        # --- 2/3-overlap candidate expansion ----------------------------
        def gemm_tile(a, b):  # overlap[i, c] = sum_k a[i,k] b[c,k]
            return jnp.dot(a, b.T, preferred_element_type=jnp.float32)

        overlap = ring_pairwise(rf, rhf, gemm_tile)  # (r, npad)
        sz_local = jnp.sum(rh_mask.astype(jnp.float32), axis=1)
        sz = jax.lax.all_gather(sz_local, "data", tiled=True)  # (npad,)
        qualify = r_mask & (overlap > (2.0 / 3.0) * sz[None, :])
        expanded = r_mask | (
            ring_contract(qualify.astype(jnp.bfloat16), rhf,
                          precision=None) > 0.0
        )

        # --- Gaussian-weighted encoding + query expansion ---------------
        w = jnp.where(expanded, jnp.exp(-orig), 0.0)
        v = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-30)
        if k2 != 1:
            nn2 = nn1[:, :k2] if k2 <= k1 + 1 else exact_min_k(score, k2)[1]
            a2 = (_membership_stripe(nn2, npad) & valid2d).astype(jnp.float32)
            v = ring_contract(a2, v) / float(k2)

        # --- Jaccard via the L1 min-sum identity -------------------------
        def l1_tile(a, b):
            if use_pallas_l1:
                return _l1_pallas(a, b)
            return _l1_xla(a, b)

        l1 = ring_pairwise(v, v, l1_tile)  # (r, npad)
        s_local = jnp.sum(v, axis=1)
        s_all = jax.lax.all_gather(s_local, "data", tiled=True)
        min_sum = 0.5 * (s_local[:, None] + s_all[None, :] - l1)
        jaccard = 1.0 - min_sum / (2.0 - min_sum)

        final = jaccard * (1.0 - lambda_value) + orig * lambda_value
        return jnp.maximum(final, 0.0)

    out = jax.jit(
        jax.shard_map(
            impl, mesh=mesh, in_specs=P("data", None), out_specs=P("data", None)
        )
    )(f)
    return out[:n, :n]
