"""Compacted-support min-sum: the exact Jaccard overlap for screened pairs.

The streaming pipeline's dominant cost was the dense fp32 L1 sweep over the
V encoding (ops/l1.py; fd = lam*orig + (1-lam)*(1 - ms/(2-ms)) with
ms = sum_k min(V_i[k], V_j[k]) — SURVEY.md §3.3). Measured on real extracted
features (N=8192, docs/streaming_profile.md): V rows carry only ~54 nonzeros
(p99 85, max 110) out of N, and only ~16 pairs/row have fd at or below the
eps region — yet the dense sweep pays N per pair on the VPU.

This module provides the two halves of the bound-and-correct replacement:

  * ``minsum_upper`` — an MXU-friendly UPPER bound on ms (hence a LOWER
    bound on fd): ms <= sum_{k in supp(V_i)} V_j[k] = B_i . V_j, one bf16
    mask-GEMM per tile, inflated for bf16/accumulation rounding so the
    bound stays sound in floating point (property-tested).
  * ``compact_rows`` / ``sparse_minsum`` — exact ms for the few pairs the
    bound cannot prune: V rows compacted to (idx, val) lists of static
    width S; ms is the sum of min(val_i, val_j) over matching indices,
    an S x S compare-select on the VPU (S ~ 128 vs N ~ 16k dense work).
    Zero-valued slots are harmless on spurious index matches
    (min(0, x) = 0), so rows with support < S are exact by construction;
    rows with support > S must be detected by the caller (count nonzeros)
    and routed to the dense fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssg_tpu.ops.topk import exact_max_k

# Inflation for the bf16 mask-GEMM bound: operand rounding is <= 2^-9
# relative (round-to-nearest bf16), fp32 accumulation over N terms adds
# ~log2(N) * 2^-24; (1 + 2^-8) multiplicative + 1e-6 absolute covers both
# with margin (verified against exact fp32 min-sum on real features).
_INFLATE_REL = 1.0 + 2.0 ** -8
_INFLATE_ABS = 1e-6
# Cap ms_ub strictly below 2 so jac_lb = 1 - ms/(2-ms) stays finite; true
# ms <= min(sum V_i, sum V_j) ~ 1, so capped pairs are near-duplicates that
# remain candidates regardless.
_MS_CAP = 1.8


def support_mask(v: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """0/1 support indicator of V rows (exact in bf16)."""
    return (v > 0.0).astype(dtype)


def minsum_upper(g: jax.Array) -> jax.Array:
    """Sound fp upper bound on ms from the raw mask-GEMM ``g = B_i . V_j``."""
    return jnp.minimum(g * _INFLATE_REL + _INFLATE_ABS, _MS_CAP)


def fd_lower(ms_ub: jax.Array, orig: jax.Array, lambda_value: float):
    """Lower bound on the re-ranked distance from an upper bound on ms.

    jac = 1 - ms/(2-ms) is decreasing in ms, so ms_ub gives jac_lb. The
    clamp is applied at the fd level ONLY — clamping jac_lb at 0 is
    unsound because the true jaccard can be slightly negative in fp
    (min_sum > 1 by an ulp), and the pipeline clamps final distances,
    not jaccards.
    """
    jac_lb = 1.0 - ms_ub / (2.0 - ms_ub)
    return jnp.maximum(jac_lb * (1.0 - lambda_value) + orig * lambda_value,
                       0.0)


def compact_rows(v: jax.Array, s_cap: int):
    """(b, n) fp32 -> (idx (b, s), val (b, s)): each row's s largest values.

    Captures every nonzero when the row support fits s_cap; the caller must
    check ``(v > 0).sum(axis=1) > s_cap`` and fall back when any row
    overflows (the dropped smallest values would under-count ms).
    """
    s = min(int(s_cap), v.shape[1])
    val, idx = exact_max_k(v, s)
    return idx, val


def sparse_minsum(ci: jax.Array, cv: jax.Array, cj: jax.Array,
                  vj: jax.Array, qblock: int = 4) -> jax.Array:
    """Exact ms[i, q] = sum_k min(V_i[k], V_(j_iq)[k]) from compacted rows.

    ci, cv: (b, S) — row i's support indices/values.
    cj, vj: (b, Q, S) — for each of Q candidate columns per row, that
    column's compacted row (gathered from the all-gathered (N, S) tables).

    Indices within a compacted row are distinct, so each (t, u) index match
    is unique; zero-valued pad slots contribute min(0, x) = 0 on any match.
    Blocked over Q to bound the (b, qb, S, S) broadcast transient (XLA fuses
    the compare/min/sum into the reduction; the block keeps the worst case
    bounded if it ever materializes).
    """
    b, s = ci.shape
    q = cj.shape[1]
    qb = max(min(qblock, q), 1)
    while q % qb:
        qb -= 1

    def block(args):
        cjb, vjb = args  # (b, qb, S)
        match = ci[:, None, :, None] == cjb[:, :, None, :]
        mn = jnp.minimum(cv[:, None, :, None], vjb[:, :, None, :])
        return jnp.sum(jnp.where(match, mn, 0.0), axis=(2, 3))

    cjr = jnp.moveaxis(cj.reshape(b, q // qb, qb, s), 1, 0)
    vjr = jnp.moveaxis(vj.reshape(b, q // qb, qb, s), 1, 0)
    out = jax.lax.map(block, (cjr, vjr))  # (q//qb, b, qb)
    return jnp.moveaxis(out, 0, 1).reshape(b, q)


def sparse_minsum_pairs(ci: jax.Array, cv: jax.Array, cj: jax.Array,
                        vj: jax.Array, qblock: int = 4) -> jax.Array:
    """``sparse_minsum`` where the ROW side also varies per slot.

    All four operands are (b, Q, S): slot q of batch row i pairs row table
    (ci[i,q], cv[i,q]) against column table (cj[i,q], vj[i,q]) — the layout
    after cross-row slot compaction (streaming's grouped main sweep), where
    a "batch row" carries slots belonging to different matrix rows. Same
    semantics per slot as ``sparse_minsum``: distinct indices within each
    table, zero-valued pad slots are inert on spurious matches.
    """
    b, q, s = ci.shape
    qb = max(min(qblock, q), 1)
    while q % qb:
        qb -= 1

    def block(args):
        cib, cvb, cjb, vjb = args  # (b, qb, S)
        match = cib[:, :, :, None] == cjb[:, :, None, :]
        mn = jnp.minimum(cvb[:, :, :, None], vjb[:, :, None, :])
        return jnp.sum(jnp.where(match, mn, 0.0), axis=(2, 3))

    def rs(x):
        return jnp.moveaxis(x.reshape(b, q // qb, qb, s), 1, 0)

    out = jax.lax.map(block, (rs(ci), rs(cv), rs(cj), rs(vj)))
    return jnp.moveaxis(out, 0, 1).reshape(b, q)
