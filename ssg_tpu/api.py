"""Public API — mirrors the reference surface (BASELINE.json north-star):

  ``extract_features`` / ``re_ranking`` / ``cluster`` / ``train``

plus the reference's evaluator objects ([reid/evaluators.py], SURVEY.md §1).
Everything heavy runs on device; hosts see uint8 batches in and
numpy labels/metrics out.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ssg_tpu.cluster import dbscan as _dbscan
from ssg_tpu.cluster import select_eps as _select_eps
from ssg_tpu.data import transforms
from ssg_tpu.data.preprocessor import Preprocessor
from ssg_tpu.ops.distance import pairwise_distance
from ssg_tpu.ops.metrics import evaluate_rank
from ssg_tpu.ops.rerank import re_ranking  # re-export: reference surface
from ssg_tpu.train.trainer import Trainer, make_train_step  # re-export

__all__ = [
    "extract_features",
    "re_ranking",
    "cluster",
    "cluster_groups",
    "train",
    "pairwise_distance",
    "evaluate_all",
    "Evaluator",
]


@functools.partial(jax.jit, static_argnames=("apply_fn",))
def _forward_eval(apply_fn, variables, images_u8):
    x = transforms.test_transform(images_u8)
    out = apply_fn(variables, x, train=False)
    return out["embeddings"]  # (num_parts, B, F) L2-normalized


def extract_features(model, variables, preprocessor: Preprocessor, print_freq: int = 50,
                     mesh=None):
    """Multi-branch feature extraction with one jitted forward per batch.

    Rebuild of [reid/evaluators.py] ``extract_features`` + [reid/
    feature_extraction/cnn.py] (SURVEY.md §3.2): the reference decodes with
    PIL workers, forwards through DataParallel and fills a python dict with
    CPU tensors; here batches stay uint8 host->device, normalization fuses
    into conv1, and features accumulate on device.

    ``mesh``: optional jax.sharding.Mesh — each batch is sharded over the
    mesh's data axis and the params replicated (the DataParallel equivalent;
    batch_size must divide by the mesh size).

    Returns (features, pids, cams, fnames): features is a (num_parts, N, F)
    jnp array (stays in HBM), pids/cams are numpy, fnames a list.
    """
    place = lambda x: jnp.asarray(x)  # noqa: E731
    if mesh is not None:
        from ssg_tpu.parallel import replicate, shard_batch

        variables = replicate(mesh, variables)
        # Host batches go straight to shard_batch (NOT via jnp.asarray,
        # which would commit them to the local default device first and
        # break multi-process placement — dp.py routes through global_put).
        place = lambda x: shard_batch(mesh, x)  # noqa: E731
    chunks, pids, cams, masks = [], [], [], []
    for i, (images, p, c, mask) in enumerate(preprocessor):
        emb = _forward_eval(model.apply, variables, place(images))
        chunks.append(emb)
        pids.append(p)
        cams.append(c)
        masks.append(mask)
        if (i + 1) % print_freq == 0:
            print(f"Extract Features: [{i + 1}/{len(preprocessor)}]")
    keep = np.concatenate(masks)
    idx = np.flatnonzero(keep)
    if isinstance(chunks[0], jax.Array) and not chunks[0].is_fully_addressable:
        # Multi-host mesh: the per-batch embeddings are process-spanning
        # global arrays; concat + padding-row removal must run as one SPMD
        # program (eager ops would mix global and local operands).
        feats = jax.jit(
            lambda *cs: jnp.take(jnp.concatenate(cs, axis=1),
                                 jnp.asarray(idx), axis=1)
        )(*chunks)
    else:
        feats = jnp.concatenate(chunks, axis=1)  # (num_parts, N_padded, F)
        feats = feats[:, jnp.asarray(idx)]
    return (
        feats,
        np.concatenate(pids)[keep],
        np.concatenate(cams)[keep],
        [f for f, m in zip(preprocessor.fnames, keep) if m],
    )


def cluster(
    dist: jax.Array,
    eps: float | None = None,
    min_samples: int = 4,
    rho: float = 1.6e-3,
) -> tuple[np.ndarray, int, float]:
    """DBSCAN with SSG auto-eps, fully on device (SURVEY.md §3.1).

    Returns (labels, num_clusters, eps); labels match sklearn exactly.
    """
    d = jnp.asarray(dist)
    eps_val = _select_eps(d, rho=rho) if eps is None else jnp.float32(eps)
    labels, n = _dbscan(d, eps_val, min_samples=min_samples)
    return np.asarray(labels), int(n), float(eps_val)


@functools.partial(
    jax.jit,
    static_argnames=("k1", "k2", "lambda_value", "min_samples", "l1_impl"),
)
def _analytics_impl(feats, rho, k1, k2, lambda_value, min_samples, l1_impl):
    """Fused per-group analytics: re-rank -> eps -> DBSCAN for every feature
    group in ONE graph (static unroll over the group axis). One dispatch and
    one host sync per SSG iteration instead of ~9 — dispatch/sync round-trips
    through the device transport otherwise dominate the clustering step."""
    from ssg_tpu.ops.rerank import _re_ranking_impl

    labels, counts, epss = [], [], []
    for g in range(feats.shape[0]):
        # named_scope per stage: device-trace attribution groups op time
        # by these prefixes (scripts/perf_cluster.py --trace).
        with jax.named_scope("a_dist"):
            original = pairwise_distance(feats[g], squared=True)
        with jax.named_scope("a_rerank"):
            dist = _re_ranking_impl(original, k1, k2, lambda_value, l1_impl)
        with jax.named_scope("a_eps"):
            eps_g = _select_eps(dist, rho=rho)
        with jax.named_scope("a_dbscan"):
            labels_g, n_g = _dbscan(dist, eps_g, min_samples=min_samples)
        labels.append(labels_g)
        counts.append(n_g)
        epss.append(eps_g)
    return jnp.stack(labels), jnp.stack(counts), jnp.stack(epss)


def cluster_groups(
    feats: jax.Array,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.1,
    rho: float = 1.6e-3,
    min_samples: int = 4,
    l1_impl: str = "auto",
):
    """The full SSG per-iteration analytics block for all feature groups.

    Args:
      feats: (num_parts, N, F) embeddings (extract_features output).

    Returns (labels (num_parts, N) np.int32, n_clusters list, eps list) —
    per group, identical to re_ranking + cluster called separately.
    """
    labels, counts, epss = _analytics_impl(
        jnp.asarray(feats), jnp.float32(rho), int(k1), int(k2),
        float(lambda_value), int(min_samples), l1_impl,
    )
    return (
        np.asarray(labels),
        [int(c) for c in np.asarray(counts)],
        [float(e) for e in np.asarray(epss)],
    )


def evaluate_all(distmat, query, gallery, logger=None,
                 query_chunk: int | None = None):
    """CMC rank-1/5/10 + mAP with the market1501 protocol (SURVEY.md §3.5).

    ``query``/``gallery`` are (fname, pid, camid) triplet lists.
    ``query_chunk``: process queries in chunks of this size (auto-enabled
    when the full (Q, G) argsort buffers would approach the device's 2 GiB
    single-buffer limit — MSMT17-scale galleries).
    """
    from ssg_tpu.ops.metrics import rank_stats

    q_ids = jnp.asarray([p for _, p, _ in query])
    g_ids = jnp.asarray([p for _, p, _ in gallery])
    q_cams = jnp.asarray([c for _, _, c in query])
    g_cams = jnp.asarray([c for _, _, c in gallery])
    nq, ng = distmat.shape
    if query_chunk is None:
        # Keep per-chunk (Qc, G) fp32/int32 buffers under ~1 GiB.
        query_chunk = nq if nq * ng * 4 <= 2**30 else max(2**30 // (ng * 4), 1)
    if query_chunk >= nq:
        res = evaluate_rank(jnp.asarray(distmat), q_ids, g_ids, q_cams, g_cams)
        mAP = float(res["mAP"])
        cmc = np.asarray(res["cmc"])
    else:
        # Chunk slicing happens on the INPUT (host numpy or device array)
        # so the full matrix is never a single device buffer.
        ap_sum, cmc_sum, n_valid = 0.0, 0.0, 0
        for s in range(0, nq, query_chunk):
            e = min(s + query_chunk, nq)
            a, c, v = rank_stats(jnp.asarray(distmat[s:e]), q_ids[s:e],
                                 g_ids, q_cams[s:e], g_cams)
            ap_sum += float(a)
            cmc_sum = cmc_sum + np.asarray(c)
            n_valid += int(v)
        n = max(n_valid, 1)
        mAP = ap_sum / n
        cmc = cmc_sum / n
    return _report(mAP, cmc, logger)


def _report(mAP, cmc, logger=None):
    print(f"Mean AP: {mAP:.1%}")
    print("CMC Scores")
    for k in (1, 5, 10):
        print(f"  top-{k:<4}{cmc[k - 1]:.1%}")
    if logger is not None:
        logger.metric(kind="eval", mAP=mAP, rank1=float(cmc[0]),
                      rank5=float(cmc[4]), rank10=float(cmc[9]))
    return {"mAP": mAP, "cmc": cmc}


class Evaluator:
    """Reference-shaped evaluator: extract query+gallery features, distance,
    metrics ([reid/evaluators.py] ``Evaluator.evaluate``, SURVEY.md §3.5).

    ``part`` selects which embedding branch ranks the gallery; 'concat'
    concatenates all branches (the SSG eval choice for multi-part models).
    """

    def __init__(self, model, variables, batch_size: int = 64,
                 part: str = "concat", mesh=None):
        self.model = model
        self.variables = variables
        if mesh is not None and batch_size % mesh.size:
            # Sharded extraction needs the (padded) batch to split evenly.
            batch_size = -(-batch_size // mesh.size) * mesh.size
        self.batch_size = batch_size
        self.part = part
        self.mesh = mesh  # route large/rerank eval over a device mesh

    def _feats(self, dataset, items):
        pre = Preprocessor(dataset, items=items, batch_size=self.batch_size)
        feats, _, _, _ = extract_features(self.model, self.variables, pre,
                                          mesh=self.mesh)
        if self.part == "concat":
            f = jnp.concatenate(list(feats), axis=1)
            return f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)
        return feats[("whole", "up", "down").index(self.part)]

    def evaluate(self, dataset, query=None, gallery=None, rerank: bool = False,
                 logger=None):
        query = dataset.query if query is None else query
        gallery = dataset.gallery if gallery is None else gallery
        qf = self._feats(dataset, query)
        gf = self._feats(dataset, gallery)
        nq, ng = qf.shape[0], gf.shape[0]
        if rerank and (self.mesh is not None or (nq + ng) ** 2 * 4 > 2**30):
            # MSMT17-scale test-time re-ranking: the dense path would
            # materialize several (Q+G)^2 fp32/bool buffers; route through
            # the streaming V-stripe pipeline, which reduces re-ranked
            # query rows directly into CMC/mAP statistics (VERDICT r1 #3).
            from ssg_tpu.parallel import make_mesh, streaming_rerank_eval

            mesh = self.mesh if self.mesh is not None else make_mesh()
            mAP, cmc, _ = streaming_rerank_eval(
                qf, gf, mesh,
                q_ids=[p for _, p, _ in query],
                g_ids=[p for _, p, _ in gallery],
                q_cams=[c for _, _, c in query],
                g_cams=[c for _, _, c in gallery],
            )
            return _report(mAP, cmc, logger)
        if rerank:
            allf = jnp.concatenate([qf, gf], axis=0)
            full = re_ranking(features=allf)
            distmat = full[:nq, nq:]
        elif nq * ng * 4 > 2**30:
            # MSMT17-scale galleries: never materialize the (Q, G) matrix as
            # one device buffer — distances chunk-by-chunk into host memory,
            # metrics chunk below (2 GiB single-buffer limit).
            chunk = max(2**30 // (ng * 4), 1)
            distmat = np.concatenate(
                [np.asarray(pairwise_distance(qf[s:s + chunk], gf))
                 for s in range(0, nq, chunk)], axis=0,
            )
        else:
            distmat = pairwise_distance(qf, gf)
        return evaluate_all(distmat, query, gallery, logger=logger)


def train(*args, **kwargs):
    """The SSG self-training loop — see ssg_tpu.train.ssg_loop.run_ssg
    (imported lazily to keep api import light)."""
    from ssg_tpu.train.ssg_loop import run_ssg

    return run_ssg(*args, **kwargs)
