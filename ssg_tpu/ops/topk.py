"""Exact min-k over wide rows, TPU-tuned via a block-min prefilter.

``jax.lax.approx_min_k(recall_target=1.0)`` is exact but its device cost
grows superlinearly with row width (chained-loop measurement, v5e,
(1024, W) fp32, k=278): W=2080 1.18 ms, 4160 1.67 ms, 8320 2.55 ms,
16640 10.8 ms. A per-8-column block min (~1.0 ms, bandwidth work) drops
the top-k width 8x; gathering the k selected blocks (k x 8 values) and
re-selecting costs 3.5 ms total at W=16640 — 3.1x faster. The streaming
pipeline pays this width three times per chunk sweep (rank lists, V
support compaction, candidate compaction — the round-3 trace's
"approx_top_k trio", 3 x 0.19 s at N=16,384), which makes this the
single biggest lever left after the bound-and-correct main sweep.

Exactness (no recall loss): if element x is among the k smallest of its
row, then at most k-1 elements — hence at most k-1 block mins — are
strictly smaller than x, and x's own block min is <= x, so x's block is
among the k smallest block mins (a block is displaced only by k strictly
smaller mins, impossible with fewer than k elements < x) and survives
stage 1. Stage 2 then selects exactly the k smallest of a superset that
contains all of them. Equality of the returned VALUE multiset with the
single-pass selection is property-tested on tie-heavy inputs
(tests/test_topk.py); the tie-broken INDEX choice may differ, but the
single pass's own tie choice is already arbitrary (measured on v5e:
approx_min_k does NOT break value ties by index), so callers must not
rely on it in either scheme.

The reference (SURVEY.md §3.3 [reid/rerank.py]) takes np.argsort rank
lists over the full N-wide rows on the host; this module is the
TPU-native replacement for that selection, shaped for the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssg_tpu.ops._compat import on_tpu

_BLK = 8


def _select(key: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Backend-native exact min-k on (possibly narrow) rows.

    TPU: approx_min_k's two-pass partial reduction (recall 1.0 = exact).
    CPU (the test mesh): lax.top_k — XLA:CPU lowers approx_min_k via
    reduce-window, measured 10x slower than its sort.
    """
    if on_tpu():
        return jax.lax.approx_min_k(key, k, recall_target=1.0)
    neg, idx = jax.lax.top_k(-key, k)
    return -neg, idx


def _blocked_min_k(key: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Block-min prefilter + two narrow selections; exact for any input.

    Requires the row width to be a multiple of _BLK and > k blocks.
    Backend-neutral (the inner selections dispatch via ``_select``), so
    the CPU test mesh exercises the same algorithm the TPU runs.
    """
    w = key.shape[-1]
    b = key.shape[:-1]
    nb = w // _BLK
    kb = key.reshape(*b, nb, _BLK)
    bm = jnp.min(kb, axis=-1)
    _, blk = _select(bm, k)  # (..., k) block indices
    g = jnp.take_along_axis(kb, blk[..., None], axis=-2)  # (..., k, _BLK)
    vals, flat = _select(g.reshape(*b, k * _BLK), k)
    q = flat // _BLK
    idx = jnp.take_along_axis(blk, q, axis=-1) * _BLK + (flat - q * _BLK)
    return vals, idx


def exact_min_k(key: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """(vals, idx) of each row's k smallest, ascending; exact multiset.

    Wide TPU rows take the blocked prefilter (see module doc); narrow
    rows, non-multiple-of-8 widths, and the CPU backend take one native
    selection pass. Rows with fewer than k finite entries return
    +inf-valued slots whose indices are in-range but arbitrary (the same
    contract approx_min_k gives).
    """
    w = key.shape[-1]
    k = min(int(k), w)
    if not on_tpu() or w % _BLK or w // _BLK <= k or w < 4096:
        return _select(key, k)
    return _blocked_min_k(key, k)


def exact_max_k(key: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """(vals, idx) of each row's k largest, descending; exact multiset."""
    vals, idx = exact_min_k(-key, k)
    return -vals, idx
