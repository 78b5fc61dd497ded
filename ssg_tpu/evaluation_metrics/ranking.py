"""CMC / mAP with the reference's full flag surface, computed on device.

Mirrors [reid/evaluation_metrics/ranking.py] (SURVEY.md §2 #8): ``cmc(...,
separate_camera_set, single_gallery_shot, first_match_break, topk)`` and
``mean_ap(...)``. The reference loops over queries in numpy; here one jitted
graph does argsort + masked cumulative sums for every query at once
(first_match_break), a flat scatter-add histogram (allshots), or — for the
randomized cuhk03 ``single_gallery_shot`` protocol — counter-based
per-identity sampling via group-argmin over random priorities
(_cmc_sgs_device), all 10 repeats vmapped in one graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_TOPK_PAD = 100  # compile one kernel; slice to the requested topk on host


@functools.partial(
    jax.jit, static_argnames=("separate_camera_set", "first_match_break", "pad"))
def _cmc_device(
    distmat,
    query_ids,
    gallery_ids,
    query_cams,
    gallery_cams,
    *,
    separate_camera_set: bool,
    first_match_break: bool,
    pad: int = _TOPK_PAD,
):
    order = jnp.argsort(distmat, axis=1)
    g_ids = gallery_ids[order]
    g_cams = gallery_cams[order]

    matches = g_ids == query_ids[:, None]
    valid = (g_ids != query_ids[:, None]) | (g_cams != query_cams[:, None])
    if separate_camera_set:
        valid &= g_cams != query_cams[:, None]
    rel = matches & valid

    rank_in_valid = jnp.cumsum(valid.astype(jnp.float32), axis=1)  # 1-indexed
    cum_rel = jnp.cumsum(rel.astype(jnp.float32), axis=1)
    num_rel = jnp.sum(rel, axis=1)
    has_match = num_rel > 0
    n_valid_q = jnp.maximum(jnp.sum(has_match), 1)

    if first_match_break:
        big = jnp.float32(distmat.shape[1] + 1)
        first_hit = jnp.min(jnp.where(rel, rank_in_valid, big), axis=1)
        ks = jnp.arange(1, pad + 1, dtype=jnp.float32)
        hits = (first_hit[:, None] <= ks[None, :]) & has_match[:, None]
        curve = jnp.sum(hits.astype(jnp.float32), axis=0) / n_valid_q
    else:
        # Allshots: the j-th hit of a query lands in bin (rank-1)-(j-1) with
        # weight 1/num_rel; histogram by flat scatter-add, then cumsum.
        bins = (rank_in_valid - cum_rel).astype(jnp.int32)  # 0-indexed bin
        bins = jnp.where(rel & (bins < pad), bins, pad)
        w = jnp.where(rel, 1.0 / jnp.maximum(num_rel, 1)[:, None], 0.0)
        hist = jnp.zeros((pad + 1,), jnp.float32).at[bins.ravel()].add(w.ravel())
        curve = jnp.cumsum(hist[:pad]) / n_valid_q
    return curve, jnp.sum(has_match)


@functools.partial(
    jax.jit, static_argnames=("separate_camera_set", "repeats", "pad"))
def _cmc_sgs_device(
    distmat,
    query_ids,
    gallery_ids,
    query_cams,
    gallery_cams,
    gallery_codes,  # dense [0, n_ids) remap of gallery_ids (host-side)
    key,
    *,
    separate_camera_set: bool,
    repeats: int,
    pad: int = _TOPK_PAD,
):
    """cuhk03 single-gallery-shot protocol, fully on device.

    Per repeat: sample ONE valid gallery instance per gallery identity
    (uniform within the group — realized as a per-group argmin over iid
    random priorities, ties broken by sorted position via a second
    group-min), then score the single sampled match's rank within the
    sampled subsequence. Sampling keeps exactly one instance per id, so
    each repeat's *delta* curve is the same step function whether scored
    allshots or first_match_break; only the cross-repeat normalization
    differs (the oracle adds 1/repeats per repeat for allshots but a full
    1 under first_match_break — ``cmc()`` applies that scaling).
    """
    q, g = distmat.shape
    order = jnp.argsort(distmat, axis=1)
    g_ids = gallery_ids[order]
    g_cams = gallery_cams[order]
    codes = gallery_codes[order]  # (Q, G) dense ids in sorted order

    matches = g_ids == query_ids[:, None]
    valid = (g_ids != query_ids[:, None]) | (g_cams != query_cams[:, None])
    if separate_camera_set:
        valid &= g_cams != query_cams[:, None]
    has_match = jnp.any(matches & valid, axis=1)
    n_valid_q = jnp.maximum(jnp.sum(has_match), 1)

    rows = jnp.arange(q)[:, None]
    cols = jnp.broadcast_to(jnp.arange(g)[None, :], (q, g))
    big_u = jnp.uint32(0xFFFFFFFF)
    ks = jnp.arange(1, pad + 1, dtype=jnp.float32)

    def one_repeat(key_r):
        u = jax.random.bits(key_r, (q, g), jnp.uint32)
        u = jnp.where(valid, u, big_u)
        # Group-min of u per (query, gallery id), then min position among
        # the elements attaining it — a deterministic uniform pick.
        table_u = jnp.full((q, g), big_u).at[rows, codes].min(u)
        at_min = valid & (u == table_u[rows, codes])
        pos = jnp.where(at_min, cols, g)
        table_p = jnp.full((q, g), g).at[rows, codes].min(pos)
        sampled = at_min & (cols == table_p[rows, codes])

        rank = jnp.cumsum(sampled.astype(jnp.float32), axis=1)
        big = jnp.float32(g + 1)
        first_hit = jnp.min(jnp.where(matches & sampled, rank, big), axis=1)
        hits = (first_hit[:, None] <= ks[None, :]) & has_match[:, None]
        return jnp.sum(hits.astype(jnp.float32), axis=0)

    curves = jax.vmap(one_repeat)(jax.random.split(key, repeats))
    return jnp.mean(curves, axis=0) / n_valid_q, jnp.sum(has_match)


def cmc(
    distmat,
    query_ids,
    gallery_ids,
    query_cams,
    gallery_cams,
    topk: int = 100,
    separate_camera_set: bool = False,
    single_gallery_shot: bool = False,
    first_match_break: bool = False,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """CMC curve (length ``topk``). Reference defaults: allshots; market1501
    protocol = ``first_match_break=True``; cuhk03 = ``separate_camera_set``
    + ``single_gallery_shot`` (randomized — pass ``rng`` to pin the seed;
    device sampling is counter-based, statistically equivalent to the
    reference's numpy draw, not draw-for-draw identical). The oracle quirk
    that ``single_gallery_shot + first_match_break`` accumulates a full +1
    per repeat (curve sums toward ``repeats``, not 1) is reproduced."""
    # Round the compiled pad up in blocks of _TOPK_PAD so arbitrary topk is
    # accepted (oracle-compatible) without a recompile per distinct value.
    pad = max(_TOPK_PAD, -(-int(topk) // _TOPK_PAD) * _TOPK_PAD)
    if single_gallery_shot:
        repeats = 10
        g_ids = np.asarray(gallery_ids)
        _, codes = np.unique(g_ids, return_inverse=True)
        seed = int((rng or np.random.default_rng(0)).integers(2**31))
        curve, n_valid = _cmc_sgs_device(
            jnp.asarray(distmat),
            jnp.asarray(query_ids), jnp.asarray(g_ids),
            jnp.asarray(query_cams), jnp.asarray(gallery_cams),
            jnp.asarray(codes.astype(np.int32)),
            jax.random.PRNGKey(seed),
            separate_camera_set=separate_camera_set, repeats=repeats, pad=pad,
        )
        if int(n_valid) == 0:
            raise RuntimeError("No valid query")
        curve = np.asarray(curve)[:topk]
        # Oracle semantics: allshots-sgs adds 1/repeats per repeat (mean);
        # first_match_break adds a full 1 per repeat (sum over repeats).
        return curve * repeats if first_match_break else curve
    curve, n_valid = _cmc_device(
        jnp.asarray(distmat),
        jnp.asarray(query_ids), jnp.asarray(gallery_ids),
        jnp.asarray(query_cams), jnp.asarray(gallery_cams),
        separate_camera_set=separate_camera_set,
        first_match_break=first_match_break,
        pad=pad,
    )
    if int(n_valid) == 0:
        raise RuntimeError("No valid query")
    return np.asarray(curve)[:topk]


@jax.jit
def _mean_ap_device(distmat, query_ids, gallery_ids, query_cams, gallery_cams):
    order = jnp.argsort(distmat, axis=1)
    g_ids = gallery_ids[order]
    g_cams = gallery_cams[order]
    matches = g_ids == query_ids[:, None]
    valid = (g_ids != query_ids[:, None]) | (g_cams != query_cams[:, None])
    rel = matches & valid
    rank_in_valid = jnp.cumsum(valid.astype(jnp.float32), axis=1)
    cum_rel = jnp.cumsum(rel.astype(jnp.float32), axis=1)
    prec_at = jnp.where(rel, cum_rel / jnp.maximum(rank_in_valid, 1.0), 0.0)
    num_rel = jnp.sum(rel, axis=1)
    has_match = num_rel > 0
    ap = jnp.sum(prec_at, axis=1) / jnp.maximum(num_rel, 1)
    n_valid_q = jnp.maximum(jnp.sum(has_match), 1)
    return jnp.sum(jnp.where(has_match, ap, 0.0)) / n_valid_q, jnp.sum(has_match)


def mean_ap(distmat, query_ids, gallery_ids, query_cams, gallery_cams) -> float:
    """mAP over valid queries (open-reid rule: same-pid-same-cam gallery
    entries excluded; queries with no remaining match dropped)."""
    val, n_valid = _mean_ap_device(
        jnp.asarray(distmat),
        jnp.asarray(query_ids), jnp.asarray(gallery_ids),
        jnp.asarray(query_cams), jnp.asarray(gallery_cams),
    )
    if int(n_valid) == 0:
        raise RuntimeError("No valid query")
    return float(val)
