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


def rank_stats_hits(
    distmat: jax.Array,
    query_ids: jax.Array,
    gallery_ids: jax.Array,
    query_cams: jax.Array,
    gallery_cams: jax.Array,
    row_mask: jax.Array | None = None,
    col_mask: jax.Array | None = None,
    hit_cap: int = 64,
    hblock: int = 8,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sort-free ``rank_stats_masked``: compare-count ranks of the hits.

    The argsort formulation sorts every (row, G) pair and gathers three
    (row, G) companions through the order — on TPU the sort is bitonic
    (~log² G passes) and the gathers serialize at ~9 ns/element, which at
    MSMT17 scale (G ≈ 43k) costs ~5.6 s per 512-row chunk, 20× the actual
    distance work (docs/streaming_profile.md). But the protocol statistics
    need only each RELEVANT column's rank: AP is Σ_hits prec@hit / num_rel
    and CMC needs the first hit's rank — and a hit's rank in the valid
    sublist is a masked COUNT, not a sort:

        rank(h) = #{j valid : d_j < d_h or (d_j = d_h and j < h)} + 1

    (the tie term reproduces stable-argsort order bit-for-bit). So:
    compact the ≤ hit_cap relevant columns per row (one exact_min_k),
    then one blocked (rows, hblock, G) compare-reduce per hit block on
    the VPU — O(G·H) fused bool work instead of O(G log² G) sort passes.

    Returns (ap_sum, cmc_sum, n_valid, overflow). ``overflow`` is True
    when some unmasked row has more than hit_cap relevant columns — the
    compaction would then drop hits, so the caller must use the argsort
    path for the chunk (``rank_stats_auto`` wires exactly that condition;
    re-id protocols carry ≲30 same-id gallery entries per query, so 64
    covers real datasets with margin). When overflow is False: CMC counts
    and n_valid equal ``rank_stats_masked`` bit-for-bit (integer counts),
    and every per-hit precision quotient sees the same fp32 integer
    operands — only the AP row-sum's addition tree differs (H terms here
    vs G mostly-zero terms there), an ulp-level fp32 difference.
    """
    b, g = distmat.shape
    matches = gallery_ids[None, :] == query_ids[:, None]
    valid = (gallery_ids[None, :] != query_ids[:, None]) | (
        gallery_cams[None, :] != query_cams[:, None])
    if col_mask is not None:
        valid = valid & col_mask[None, :]
    rel = matches & valid
    num_rel = jnp.sum(rel, axis=1, dtype=jnp.int32)
    live = num_rel > 0
    if row_mask is not None:
        live = live & row_mask
    h = min(int(hit_cap), g)
    overflow = jnp.any(jnp.where(live, num_rel, 0) > h)

    from ssg_tpu.ops.topk import exact_min_k

    col = jnp.arange(g, dtype=jnp.int32)
    # Compact hits by COLUMN INDEX, not by distance value: masking
    # non-relevant columns to +inf would collide with legitimately +inf
    # hit distances (the min-k can't tell sentinel from data and may pick
    # a non-relevant column). A rel-masked iota has no value plateaus —
    # every relevant column is captured by construction (g < 2^24, exact
    # in fp32). Hit order is column order, not distance order; each hit's
    # rank is an independent masked count, so order never matters.
    big = jnp.float32(jnp.inf)
    _, jh = exact_min_k(jnp.where(rel, col.astype(jnp.float32), big), h)
    vh = jnp.take_along_axis(distmat, jh, axis=1)  # (b, h) hit distances
    # Slot liveness by count: exact_min_k pads short rows with +inf-valued
    # slots at ARBITRARY in-range indices, so jh/vh are garbage there —
    # in-range (safe to gather/compare) but masked out of every reduction.
    relh = jnp.arange(h, dtype=jnp.int32)[None, :] < num_rel[:, None]
    hb = max(min(int(hblock), h), 1)
    while h % hb:
        hb -= 1

    def block(args):
        vb, jb = args  # (b, hb)
        cmp = (distmat[:, None, :] < vb[:, :, None]) | (
            (distmat[:, None, :] == vb[:, :, None])
            & (col[None, None, :] < jb[:, :, None]))
        rank0 = jnp.sum(cmp & valid[:, None, :], axis=2, dtype=jnp.int32)
        crel0 = jnp.sum(cmp & rel[:, None, :], axis=2, dtype=jnp.int32)
        return rank0, crel0

    def rs(x):
        return jnp.moveaxis(x.reshape(b, h // hb, hb), 1, 0)

    rank0, crel0 = jax.lax.map(block, (rs(vh), rs(jh)))  # (h/hb, b, hb)
    rank = jnp.moveaxis(rank0, 0, 1).reshape(b, h).astype(jnp.float32) + 1.0
    crel = jnp.moveaxis(crel0, 0, 1).reshape(b, h).astype(jnp.float32) + 1.0

    ap = jnp.sum(jnp.where(relh, crel / rank, 0.0), axis=1) \
        / jnp.maximum(num_rel, 1)
    ap_sum = jnp.sum(jnp.where(live, ap, 0.0))

    first_hit = jnp.min(jnp.where(relh, rank, jnp.float32(g + 1)), axis=1)
    ks = jnp.arange(1, 101, dtype=jnp.float32)
    hits = (first_hit[:, None] <= ks[None, :]) & live[:, None]
    cmc_sum = jnp.sum(hits.astype(jnp.float32), axis=0)
    return ap_sum, cmc_sum, jnp.sum(live), overflow


def rank_stats_auto(
    distmat: jax.Array,
    query_ids: jax.Array,
    gallery_ids: jax.Array,
    query_cams: jax.Array,
    gallery_cams: jax.Array,
    row_mask: jax.Array | None = None,
    col_mask: jax.Array | None = None,
    hit_cap: int = 64,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """``rank_stats_hits`` with an exact argsort fallback on hit overflow.

    Traceable under shard_map (the cond bodies are collective-free, so a
    per-shard predicate cannot desynchronize the mesh). Matches
    ``rank_stats_masked`` on every input: CMC/n_valid bit-for-bit, AP to
    summation-order ulps (see ``rank_stats_hits``).
    """
    a, cm, v, ovf = rank_stats_hits(
        distmat, query_ids, gallery_ids, query_cams, gallery_cams,
        row_mask, col_mask, hit_cap=hit_cap)
    return jax.lax.cond(
        ovf,
        lambda: rank_stats_masked(distmat, query_ids, gallery_ids,
                                  query_cams, gallery_cams,
                                  row_mask, col_mask),
        lambda: (a, cm, v),
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
