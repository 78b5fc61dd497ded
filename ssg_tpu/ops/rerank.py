"""k-reciprocal re-ranking as fixed-shape TPU matrix ops.

TPU-native rebuild of the reference's [reid/rerank.py] (SURVEY.md §2 #10,
§3.3; Zhong et al. CVPR 2017, arXiv:1701.08398). The reference is a Python
loop over N with dynamic-size neighbor sets; that shape-dynamism is the whole
porting difficulty (SURVEY.md §7 hard part a). This implementation re-expresses
every step as fixed-shape masked matrix algebra, so the entire re-ranking is
ONE jitted XLA graph with its heavy ops on the MXU:

  rank lists       -> lax.top_k (ties broken toward lower index, matching
                      numpy stable argsort on distinct distances)
  reciprocity      -> boolean mask intersection  R = M ∧ Mᵀ
  2/3-overlap      -> |R(i) ∩ Rh(c)| = (R Rhᵀ)[i,c]      (GEMM, MXU)
  set-union expand -> (Q Rh)[i,k] > 0                     (GEMM, MXU)
  query expansion  -> one-hot(topk2) @ V / k2             (GEMM, MXU)
  Jaccard min-sum  -> (S_i + S_j - ||V_i - V_j||_1) / 2   (tiled Pallas L1)

Parity: equals ssg_tpu.oracle.re_ranking_np to fp tolerance on distinct
distances (ties in distances can legitimately reorder neighbor sets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ssg_tpu.ops.distance import pairwise_distance
from ssg_tpu.ops.l1 import l1_distance
from ssg_tpu.ops.topk import exact_min_k


def _membership(indices: jax.Array, n: int) -> jax.Array:
    """(N, k) index lists -> (N, N) boolean membership mask."""
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    mask = jnp.zeros((n, n), dtype=bool)
    return mask.at[rows, indices].set(True)


@functools.partial(
    jax.jit, static_argnames=("k1", "k2", "lambda_value", "l1_impl")
)
def _re_ranking_impl(
    original_dist: jax.Array,
    k1: int,
    k2: int,
    lambda_value: float,
    l1_impl: str,
) -> jax.Array:
    n = original_dist.shape[0]

    # Canonical preamble: column-max normalize, transpose (oracle parity).
    col_max = jnp.maximum(jnp.max(original_dist, axis=0), 1e-12)
    orig = (original_dist / col_max).T

    # Rank-list membership masks. exact_min_k (ops/topk.py) is the
    # TPU-native exact top-k (block-min prefilter + two narrow partial
    # reductions instead of a full sort — the sorts were ~25% of this
    # graph's device time). It returns SORTED neighbors, so the k1/2 list
    # is a prefix slice of the k1 list — one top-k pass instead of two
    # (round 2; same trick in parallel/streaming phase 1).
    half = int(round(k1 / 2.0))
    with jax.named_scope("rr_topk"):
        _, nn1 = exact_min_k(orig, k1 + 1)
    nnh = nn1[:, : half + 1]
    with jax.named_scope("rr_masks"):
        m1 = _membership(nn1, n)
        mh = _membership(nnh, n)

        r = m1 & m1.T  # k-reciprocal sets R(i, k1)
        rh = mh & mh.T  # R(i, k1/2)
        # bf16 mask GEMMs: inputs are 0/1 and accumulation is fp32, so the
        # counts (<= k1+1) are EXACT while the MXU runs at native bf16 rate.
        rf = r.astype(jnp.bfloat16)
        rhf = rh.astype(jnp.bfloat16)

        # Candidate expansion: |R(i) ∩ Rh(c)| > 2/3 |Rh(c)| for c in R(i).
        overlap = jnp.dot(rf, rhf.T, preferred_element_type=jnp.float32)
        sz = jnp.sum(rh.astype(jnp.float32), axis=1)
        qualify = r & (overlap > (2.0 / 3.0) * sz[None, :])
        expanded = r | (
            jnp.dot(qualify.astype(jnp.bfloat16), rhf,
                    preferred_element_type=jnp.float32)
            > 0.0
        )

        # Gaussian-weighted sparse encoding, row-normalized (guard: a row
        # whose reciprocal set is empty — possible under heavy distance
        # ties — must yield zeros, not NaNs).
        w = jnp.where(expanded, jnp.exp(-orig), 0.0)
        v = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-30)

    # Local query expansion over the k2 nearest neighbors (one-hot GEMM).
    # Measured on v5e at N=3368: the MXU GEMM beats a gather+mean of the k2
    # rows (TPU gathers are slow) despite the O(N^3) flop count.
    if k2 != 1:
        with jax.named_scope("rr_qe"):
            # k2 <= k1 in every reference config -> prefix of sorted nn1.
            nn2 = nn1[:, :k2] if k2 <= k1 + 1 else (
                exact_min_k(orig, k2)[1])
            a2 = _membership(nn2, n).astype(jnp.float32)
            # HIGHEST: V carries real values (not 0/1 counts like the
            # masks above), so default bf16 MXU passes would cost parity.
            v = (
                jnp.dot(
                    a2,
                    v,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                / float(k2)
            )

    # Jaccard via the L1 identity: sum_k min(a,b) = (S_a + S_b - |a-b|_1)/2.
    with jax.named_scope("rr_l1"):
        s = jnp.sum(v, axis=1)
        l1 = l1_distance(v, impl=l1_impl)
        min_sum = 0.5 * (s[:, None] + s[None, :] - l1)
        jaccard = 1.0 - min_sum / (2.0 - min_sum)

        final = jaccard * (1.0 - lambda_value) + orig * lambda_value
        return jnp.maximum(final, 0.0)


def re_ranking(
    features: jax.Array | None = None,
    dist: jax.Array | None = None,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.1,
    l1_impl: str = "auto",
) -> jax.Array:
    """k-reciprocal re-ranked (N, N) distance matrix, fp32 on device.

    Mirrors the reference surface ``re_ranking(features or dist, k1, k2,
    lambda_value)`` (SURVEY.md §1). Either ``features`` (N, D) or a
    precomputed Euclidean ``dist`` (N, N) must be given.
    """
    if dist is None:
        assert features is not None, "need features or dist"
        original = pairwise_distance(features, squared=True)
    else:
        original = jnp.square(dist.astype(jnp.float32))
    n = original.shape[0]
    # Clamp neighborhood sizes for tiny inputs (k lists can't exceed N).
    k1 = min(int(k1), n - 1)
    k2 = min(int(k2), n - 1)
    return _re_ranking_impl(original, k1, k2, float(lambda_value), l1_impl)
