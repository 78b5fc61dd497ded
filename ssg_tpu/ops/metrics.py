"""Vectorized CMC / mAP on device.

Replaces the reference's per-query numpy loops in
[reid/evaluation_metrics/ranking.py] (SURVEY.md §2 #8, §3.5) with one jitted
graph: argsort once, then masked cumulative sums instead of per-query Python.
Protocol: market1501 (same-pid-same-cam gallery entries filtered per query;
CMC with first_match_break). Matches the numpy oracle exactly when distances
are distinct (ties can reorder argsort between implementations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def rank_stats_masked(
    distmat: jax.Array,
    query_ids: jax.Array,
    gallery_ids: jax.Array,
    query_cams: jax.Array,
    gallery_cams: jax.Array,
    row_mask: jax.Array | None = None,
    col_mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """rank_stats body with optional validity masks. Rows where ``row_mask``
    is False contribute nothing — lets the streaming rerank evaluator feed
    fixed-size row chunks that mix query and padding rows. Columns where
    ``col_mask`` is False are excluded from the valid sublist entirely
    (exactly like the protocol's junk filtering) — lets the evaluator feed
    full stripe rows whose columns interleave gallery, query and padding
    entries, regardless of the distances in the masked columns.
    Traceable (no jit wrapper): usable inside shard_map."""
    order = jnp.argsort(distmat, axis=1)  # ascending distance
    g_ids = gallery_ids[order]  # (Qc, G)
    g_cams = gallery_cams[order]

    matches = g_ids == query_ids[:, None]
    valid = (g_ids != query_ids[:, None]) | (g_cams != query_cams[:, None])
    if col_mask is not None:
        valid = valid & col_mask[order]
    rel = matches & valid

    # Rank of each gallery position within the valid sublist (1-indexed).
    rank_in_valid = jnp.cumsum(valid.astype(jnp.float32), axis=1)

    # AP: mean over hits of precision-at-hit.
    cum_rel = jnp.cumsum(rel.astype(jnp.float32), axis=1)
    prec_at = jnp.where(rel, cum_rel / jnp.maximum(rank_in_valid, 1.0), 0.0)
    num_rel = jnp.sum(rel, axis=1)
    has_match = num_rel > 0
    if row_mask is not None:
        has_match = has_match & row_mask
    ap = jnp.sum(prec_at, axis=1) / jnp.maximum(num_rel, 1)
    ap_sum = jnp.sum(jnp.where(has_match, ap, 0.0))

    # CMC (first_match_break): rank of the first hit in the valid sublist.
    big = jnp.float32(distmat.shape[1] + 1)
    first_hit = jnp.min(jnp.where(rel, rank_in_valid, big), axis=1)  # 1-indexed
    topk = 100
    ks = jnp.arange(1, topk + 1, dtype=jnp.float32)
    hits = (first_hit[:, None] <= ks[None, :]) & has_match[:, None]
    cmc_sum = jnp.sum(hits.astype(jnp.float32), axis=0)

    return ap_sum, cmc_sum, jnp.sum(has_match)


@jax.jit
def rank_stats(
    distmat: jax.Array,
    query_ids: jax.Array,
    gallery_ids: jax.Array,
    query_cams: jax.Array,
    gallery_cams: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-query-chunk sufficient statistics: (ap_sum, cmc_hit_sum (topk,),
    n_valid_queries). Chunks over the query axis combine by addition —
    the basis for evaluating galleries whose full (Q, G) argsort buffers
    would exceed the device's 2 GiB single-buffer limit (MSMT17 scale)."""
    return rank_stats_masked(
        distmat, query_ids, gallery_ids, query_cams, gallery_cams
    )


def evaluate_rank(
    distmat: jax.Array,
    query_ids: jax.Array,
    gallery_ids: jax.Array,
    query_cams: jax.Array,
    gallery_cams: jax.Array,
) -> dict[str, jax.Array]:
    """Returns {'mAP': scalar, 'cmc': (topk,) curve} — market1501 protocol.

    CMC/AP are computed over each query's *valid* gallery sublist (entries
    sharing both pid and cam with the query are excluded, open-reid rule);
    queries with no valid match are dropped from both averages.
    """
    ap_sum, cmc_sum, n_valid = rank_stats(
        distmat, query_ids, gallery_ids, query_cams, gallery_cams
    )
    n = jnp.maximum(n_valid, 1)
    return {"mAP": ap_sum / n, "cmc": cmc_sum / n}
