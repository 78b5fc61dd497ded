"""Numpy CMC / mAP oracle (open-reid evaluation protocol).

Pins the reference's [reid/evaluation_metrics/ranking.py] (expected path —
SURVEY.md §2 #8): per-query loop that masks gallery entries sharing both the
query's person id and camera id, computes AP via sklearn's
``average_precision_score`` and CMC with the market1501 protocol
(``first_match_break=True``).
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import average_precision_score


def _valid_mask(indices_i, q_id, q_cam, gallery_ids, gallery_cams):
    return (gallery_ids[indices_i] != q_id) | (gallery_cams[indices_i] != q_cam)


def mean_ap_np(
    distmat: np.ndarray,
    query_ids: np.ndarray,
    gallery_ids: np.ndarray,
    query_cams: np.ndarray,
    gallery_cams: np.ndarray,
) -> float:
    distmat = np.asarray(distmat)
    query_ids = np.asarray(query_ids)
    gallery_ids = np.asarray(gallery_ids)
    query_cams = np.asarray(query_cams)
    gallery_cams = np.asarray(gallery_cams)
    m, _ = distmat.shape
    indices = np.argsort(distmat, axis=1)
    matches = gallery_ids[indices] == query_ids[:, np.newaxis]
    aps = []
    for i in range(m):
        valid = _valid_mask(indices[i], query_ids[i], query_cams[i], gallery_ids, gallery_cams)
        y_true = matches[i, valid]
        y_score = -distmat[i][indices[i]][valid]
        if not np.any(y_true):
            continue
        aps.append(average_precision_score(y_true, y_score))
    if not aps:
        raise RuntimeError("No valid query")
    return float(np.mean(aps))


def cmc_np(
    distmat: np.ndarray,
    query_ids: np.ndarray,
    gallery_ids: np.ndarray,
    query_cams: np.ndarray,
    gallery_cams: np.ndarray,
    topk: int = 100,
    separate_camera_set: bool = False,
    single_gallery_shot: bool = False,
    first_match_break: bool = True,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """CMC curve; market1501 protocol = first_match_break=True (default)."""
    distmat = np.asarray(distmat)
    query_ids = np.asarray(query_ids)
    gallery_ids = np.asarray(gallery_ids)
    query_cams = np.asarray(query_cams)
    gallery_cams = np.asarray(gallery_cams)
    if rng is None:
        rng = np.random.default_rng(0)
    m, _ = distmat.shape
    indices = np.argsort(distmat, axis=1)
    matches = gallery_ids[indices] == query_ids[:, np.newaxis]
    ret = np.zeros(topk)
    num_valid_queries = 0
    for i in range(m):
        valid = _valid_mask(indices[i], query_ids[i], query_cams[i], gallery_ids, gallery_cams)
        if separate_camera_set:
            valid &= gallery_cams[indices[i]] != query_cams[i]
        if not np.any(matches[i, valid]):
            continue
        if single_gallery_shot:
            repeat = 10
            gids = gallery_ids[indices[i][valid]]
            inds = np.where(valid)[0]
            ids_dict = {}
            for j, x in zip(inds, gids):
                ids_dict.setdefault(x, []).append(j)
        else:
            repeat = 1
        for _ in range(repeat):
            if single_gallery_shot:
                # One gallery instance per id (cuhk03 protocol).
                sampled = valid & np.zeros_like(valid)
                for js in ids_dict.values():
                    sampled[js[rng.integers(len(js))]] = True
                index = np.nonzero(matches[i, sampled])[0]
            else:
                index = np.nonzero(matches[i, valid])[0]
            delta = 1.0 / (len(index) * repeat)
            for j, k in enumerate(index):
                if k - j >= topk:
                    break
                if first_match_break:
                    ret[k - j] += 1
                    break
                ret[k - j] += delta
        num_valid_queries += 1
    if num_valid_queries == 0:
        raise RuntimeError("No valid query")
    return ret.cumsum() / num_valid_queries
