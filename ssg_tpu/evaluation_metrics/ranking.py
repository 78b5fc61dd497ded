"""CMC / mAP with the reference's full flag surface, computed on device.

Mirrors [reid/evaluation_metrics/ranking.py] (SURVEY.md §2 #8): ``cmc(...,
separate_camera_set, single_gallery_shot, first_match_break, topk)`` and
``mean_ap(...)``. The reference loops over queries in numpy; here one jitted
graph does argsort + masked cumulative sums for every query at once
(first_match_break) or a flat scatter-add histogram (allshots). The one
protocol that is inherently random — ``single_gallery_shot`` (cuhk03:
sample one gallery image per identity, repeat 10x) — stays in numpy via
the pinned oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ssg_tpu.oracle.ranking import cmc_np

_TOPK_PAD = 100  # compile one kernel; slice to the requested topk on host


@functools.partial(jax.jit, static_argnames=("separate_camera_set", "first_match_break"))
def _cmc_device(
    distmat,
    query_ids,
    gallery_ids,
    query_cams,
    gallery_cams,
    *,
    separate_camera_set: bool,
    first_match_break: bool,
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
        ks = jnp.arange(1, _TOPK_PAD + 1, dtype=jnp.float32)
        hits = (first_hit[:, None] <= ks[None, :]) & has_match[:, None]
        curve = jnp.sum(hits.astype(jnp.float32), axis=0) / n_valid_q
    else:
        # Allshots: the j-th hit of a query lands in bin (rank-1)-(j-1) with
        # weight 1/num_rel; histogram by flat scatter-add, then cumsum.
        bins = (rank_in_valid - cum_rel).astype(jnp.int32)  # 0-indexed bin
        bins = jnp.where(rel & (bins < _TOPK_PAD), bins, _TOPK_PAD)
        w = jnp.where(rel, 1.0 / jnp.maximum(num_rel, 1)[:, None], 0.0)
        hist = jnp.zeros((_TOPK_PAD + 1,), jnp.float32).at[bins.ravel()].add(w.ravel())
        curve = jnp.cumsum(hist[:_TOPK_PAD]) / n_valid_q
    return curve, jnp.sum(has_match)


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
) -> np.ndarray:
    """CMC curve (length ``topk``). Reference defaults: allshots; market1501
    protocol = ``first_match_break=True``."""
    if single_gallery_shot:
        return cmc_np(
            np.asarray(distmat), np.asarray(query_ids), np.asarray(gallery_ids),
            np.asarray(query_cams), np.asarray(gallery_cams), topk=topk,
            separate_camera_set=separate_camera_set, single_gallery_shot=True,
            first_match_break=first_match_break,
        )
    if topk > _TOPK_PAD:
        raise ValueError(f"topk={topk} exceeds the compiled pad {_TOPK_PAD}")
    curve, n_valid = _cmc_device(
        jnp.asarray(distmat),
        jnp.asarray(query_ids), jnp.asarray(gallery_ids),
        jnp.asarray(query_cams), jnp.asarray(gallery_cams),
        separate_camera_set=separate_camera_set,
        first_match_break=first_match_break,
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
