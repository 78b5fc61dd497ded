"""Streaming mesh-sharded k-reciprocal clustering for large N.

The dense sharded path (parallel/rerank.py) holds several O(N^2/P) stripes
at once; this pipeline holds ONE fp32 V stripe plus O(N^2/P) *bool/bit*
state, recomputing distance chunks from features on the fly — the
"every consumer streams tiles" discipline of SURVEY.md §7 hard part (d):

  phase 1  rank lists + column max:   chunked GEMM sweep, top-k per chunk;
           lists (N, k) are all-gathered (tiny) — after this, reciprocity
           for ANY pair is recomputable anywhere from the lists alone.
  phase 2  V stripe:                  per chunk, rebuild masks from lists,
           2/3-expansion via ring GEMMs against the rh bool stripe,
           Gaussian weights; then one ring pass for query expansion.
  phase 3  eps:                       two histogram sweeps over the final
           distance chunks (coarse 2^13 bins, then 2^13 bins inside the
           selected bin — the fine bin is narrower than one fp32 ulp, so
           the k-th smallest value is recovered EXACTLY; a third cheap
           sweep turns it into the reference's mean-of-k-smallest).
  phase 4  DBSCAN:                    adjacency stripe (final <= eps, bool)
           + distributed min-label propagation (sklearn-identical labels).

Per-chip HBM at N=126k, P=16: feats 1 GB + V fp32 4 GB + rh/r bool 2 GB +
adjacency bool 1 GB + chunk workspace — the MSMT17 config on a v5e-16;
P=8 covers N ≈ 64k. Compute per sweep is N^2/P-chunked ring work; the
Jaccard L1 runs 3 sweeps (eps x2 + adjacency).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ssg_tpu.ops._compat import on_tpu, round_up
from ssg_tpu.ops.l1 import _l1_pallas, _l1_xla
from ssg_tpu.parallel.ring import ring_contract, ring_pairwise
from ssg_tpu.parallel.sharded import _pad_rows

_BINS = 8192


def _member_chunk(lists_rows: jax.Array, npad: int) -> jax.Array:
    """(B, k) per-row index lists -> (B, npad) bool membership."""
    b = lists_rows.shape[0]
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    out = jnp.zeros((b, npad), dtype=bool)
    return out.at[rows, lists_rows].set(True)


def _recip_chunk(lists_all: jax.Array, row0: jax.Array, b: int, npad: int):
    """Reciprocal membership for rows [row0, row0+b): mask[i, j] =
    (j in lists[i]) & (i in lists[j]), built only from the (N, k) lists."""
    rows = row0 + jnp.arange(b, dtype=jnp.int32)
    mine = jax.lax.dynamic_slice(lists_all, (row0, 0), (b, lists_all.shape[1]))
    fwd = _member_chunk(mine, npad)  # j in lists[i]
    # i in lists[j]: compare every row's list against my global row ids.
    bwd = jnp.any(
        lists_all[None, :, :] == rows[:, None, None], axis=-1
    )  # (b, npad)
    return fwd & bwd


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k1", "k2", "lambda_value", "rho",
                     "min_samples", "chunk", "l1_impl"),
)
def _streaming_impl(f, n, mesh, k1, k2, lambda_value, rho, min_samples,
                    chunk, l1_impl):
    npad = f.shape[0]
    p = mesh.shape["data"]
    r = npad // p
    b = chunk
    half = int(round(k1 / 2.0))
    n_chunks = r // b

    l1_tile = _l1_pallas if l1_impl == "pallas" or (
        l1_impl == "auto" and on_tpu()) else _l1_xla

    def impl(f_local):
        me = jax.lax.axis_index("data")
        row0_global = me * r
        f_all = jax.lax.all_gather(f_local, "data", tiled=True)  # (npad, D)
        y2 = jnp.sum(f_all * f_all, axis=1)  # (npad,)
        col_valid = jnp.arange(npad, dtype=jnp.int32) < n

        def dist_chunk(c):
            """Squared-Euclidean distances of my chunk c rows vs all."""
            fc = jax.lax.dynamic_slice(f_local, (c * b, 0), (b, f.shape[1]))
            x2 = jnp.sum(fc * fc, axis=1, keepdims=True)
            d = x2 + y2[None, :] - 2.0 * jnp.dot(
                fc, f_all.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return jnp.maximum(d, 0.0)

        def row_ids(c):
            return row0_global + c * b + jnp.arange(b, dtype=jnp.int32)

        # ---- phase 1: rank lists + column max -------------------------
        def p1(c, carry):
            nn1, nnh, nn2, colmax = carry
            d = dist_chunk(c)
            score = jnp.where(col_valid[None, :], d, jnp.inf)
            _, i1 = jax.lax.approx_min_k(score, k1 + 1, recall_target=1.0)
            _, ih = jax.lax.approx_min_k(score, half + 1, recall_target=1.0)
            _, i2 = jax.lax.approx_min_k(score, k2, recall_target=1.0)
            nn1 = jax.lax.dynamic_update_slice(nn1, i1, (c * b, 0))
            nnh = jax.lax.dynamic_update_slice(nnh, ih, (c * b, 0))
            nn2 = jax.lax.dynamic_update_slice(nn2, i2, (c * b, 0))
            row_ok = row_ids(c) < n
            colmax = jnp.maximum(
                colmax, jnp.max(jnp.where(row_ok[:, None], d, -jnp.inf), 0)
            )
            return nn1, nnh, nn2, colmax

        nn1 = jnp.zeros((r, k1 + 1), jnp.int32)
        nnh = jnp.zeros((r, half + 1), jnp.int32)
        nn2 = jnp.zeros((r, k2), jnp.int32)
        colmax0 = jnp.full((npad,), -jnp.inf, jnp.float32)
        nn1, nnh, nn2, colmax_l = jax.lax.fori_loop(
            0, n_chunks, p1, (nn1, nnh, nn2, colmax0)
        )
        colmax = jnp.maximum(jax.lax.pmax(colmax_l, "data"), 1e-12)
        nn1_all = jax.lax.all_gather(nn1, "data", tiled=True)  # (npad, k1+1)
        nnh_all = jax.lax.all_gather(nnh, "data", tiled=True)

        # rh bool stripe (needed as the ring operand of the expansion GEMMs).
        def build_rh(c, acc):
            m = _recip_chunk(nnh_all, row0_global + c * b, b, npad)
            return jax.lax.dynamic_update_slice(acc, m, (c * b, 0))

        rh_stripe = jax.lax.fori_loop(
            0, n_chunks, build_rh, jnp.zeros((r, npad), bool)
        )
        row_valid = (row0_global + jnp.arange(r, dtype=jnp.int32)) < n
        rh_stripe = rh_stripe & row_valid[:, None] & col_valid[None, :]
        sz = jax.lax.all_gather(
            jnp.sum(rh_stripe.astype(jnp.float32), axis=1), "data", tiled=True
        )  # |Rh(c)| for all c

        # ---- phase 2: V stripe -----------------------------------------
        rhf = rh_stripe.astype(jnp.bfloat16)
        row_scale = jax.lax.dynamic_slice(colmax, (row0_global,), (r,))

        def build_v(c, v_acc):
            rows0 = c * b
            d = dist_chunk(c)
            orig = d / jax.lax.dynamic_slice(row_scale, (rows0,), (b,))[:, None]
            r_chunk = _recip_chunk(nn1_all, row0_global + rows0, b, npad)
            r_chunk = r_chunk & col_valid[None, :]
            overlap = ring_pairwise(
                r_chunk.astype(jnp.bfloat16), rhf,
                lambda a, bb: jnp.dot(a, bb.T, preferred_element_type=jnp.float32),
            )
            qualify = r_chunk & (overlap > (2.0 / 3.0) * sz[None, :])
            expanded = r_chunk | (
                ring_contract(qualify.astype(jnp.bfloat16), rhf) > 0.0
            )
            w = jnp.where(expanded, jnp.exp(-orig), 0.0)
            v = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-30)
            return jax.lax.dynamic_update_slice(v_acc, v, (rows0, 0))

        v_stripe = jax.lax.fori_loop(
            0, n_chunks, build_v, jnp.zeros((r, npad), jnp.float32)
        )

        # Query expansion: one ring pass per chunk against the V stripes.
        # (nn2 indices are k2-NN; a one-hot GEMM against row-sharded V.)
        def build_vqe(c, acc):
            rows0 = c * b
            i2 = jax.lax.dynamic_slice(nn2, (rows0, 0), (b, k2))
            a2 = _member_chunk(i2, npad).astype(jnp.float32)
            vq = ring_contract(a2, v_stripe) / float(k2)
            return jax.lax.dynamic_update_slice(acc, vq, (rows0, 0))

        if k2 != 1:
            v_stripe = jax.lax.fori_loop(
                0, n_chunks, build_vqe, jnp.zeros((r, npad), jnp.float32)
            )
        s_all = jax.lax.all_gather(
            jnp.sum(v_stripe, axis=1), "data", tiled=True
        )

        def final_chunk(c):
            """(b, npad) final re-ranked distances of my chunk c rows."""
            rows0 = c * b
            d = dist_chunk(c)
            orig = d / jax.lax.dynamic_slice(row_scale, (rows0,), (b,))[:, None]
            vc = jax.lax.dynamic_slice(v_stripe, (rows0, 0), (b, npad))
            l1 = ring_pairwise(vc, v_stripe, l1_tile)
            s_mine = jnp.sum(vc, axis=1)
            min_sum = 0.5 * (s_mine[:, None] + s_all[None, :] - l1)
            jaccard = 1.0 - min_sum / (2.0 - min_sum)
            return jnp.maximum(
                jaccard * (1.0 - lambda_value) + orig * lambda_value, 0.0
            )

        def chunk_valid(c):
            rows = row0_global + c * b + jnp.arange(b, dtype=jnp.int32)
            cols = jnp.arange(npad, dtype=jnp.int32)
            return (cols[None, :] > rows[:, None]) & (rows[:, None] < n) & \
                col_valid[None, :]

        import os as _os

        if _os.environ.get("SSG_STREAM_DEBUG_FINAL"):
            def dump(c, acc):
                return jax.lax.dynamic_update_slice(
                    acc, final_chunk(c), (c * b, 0)
                )

            final_stripe = jax.lax.fori_loop(
                0, n_chunks, dump, jnp.zeros((r, npad), jnp.float32)
            )
        else:
            final_stripe = jnp.zeros((1, 1), jnp.float32)

        # ---- phase 3: eps via two exact histogram sweeps ----------------
        # Bin classification must be IDENTICAL across sweeps (recomputing
        # `(fd - lo) / w` with different lo/w pairings drifts by an ulp and
        # loses the k-th value), so both sweeps classify with the same
        # integer-index expressions and the fine sweep carries per-bin
        # (count, sum, min) — the k-th smallest and the below-k mass then
        # come out in closed form, no third sweep.
        hi0 = jnp.float32(1.0 + lambda_value)  # jaccard <= 1, orig <= 1
        w0 = hi0 / _BINS

        def cidx(fd):
            return jnp.clip((fd / w0).astype(jnp.int32), 0, _BINS - 1)

        def sweep_coarse(c, carry):
            hist, total = carry
            fd = final_chunk(c)
            valid = chunk_valid(c) & (fd != 0.0)
            total += jnp.sum(valid.astype(jnp.int32))
            flat = jnp.where(valid, cidx(fd), _BINS).ravel()
            hist = hist.at[flat].add(1)
            return hist, total

        hist0, total = jax.lax.fori_loop(
            0, n_chunks, sweep_coarse,
            (jnp.zeros((_BINS + 1,), jnp.int32), jnp.int32(0)),
        )
        hist0 = jax.lax.psum(hist0[:_BINS], "data")
        total = jax.lax.psum(total, "data")
        k = jnp.maximum(
            jnp.round(rho * total.astype(jnp.float32)).astype(jnp.int32), 1
        )
        cum0 = jnp.cumsum(hist0)
        bin0 = jnp.searchsorted(cum0, k, side="left").astype(jnp.int32)
        lo1 = bin0.astype(jnp.float32) * w0
        w1 = w0 / _BINS

        def fidx(fd):
            return jnp.clip(((fd - lo1) / w1).astype(jnp.int32), 0, _BINS - 1)

        def sweep_fine(c, carry):
            cnt_lo, sum_lo, fhist, fsum, fmin = carry
            fd = final_chunk(c)
            valid = chunk_valid(c) & (fd != 0.0)
            ci = cidx(fd)
            below = valid & (ci < bin0)
            cnt_lo += jnp.sum(below.astype(jnp.int32))
            sum_lo += jnp.sum(jnp.where(below, fd, 0.0))
            inbin = valid & (ci == bin0)
            flat = jnp.where(inbin, fidx(fd), _BINS).ravel()
            fdr = fd.ravel()
            fhist = fhist.at[flat].add(1)
            fsum = fsum.at[flat].add(jnp.where(inbin.ravel(), fdr, 0.0))
            fmin = fmin.at[flat].min(jnp.where(inbin.ravel(), fdr, jnp.inf))
            return cnt_lo, sum_lo, fhist, fsum, fmin

        cnt_lo, sum_lo, fhist, fsum, fmin = jax.lax.fori_loop(
            0, n_chunks, sweep_fine,
            (jnp.int32(0), jnp.float32(0.0),
             jnp.zeros((_BINS + 1,), jnp.int32),
             jnp.zeros((_BINS + 1,), jnp.float32),
             jnp.full((_BINS + 1,), jnp.inf, jnp.float32)),
        )
        cnt_lo = jax.lax.psum(cnt_lo, "data")
        sum_lo = jax.lax.psum(sum_lo, "data")
        fhist = jax.lax.psum(fhist[:_BINS], "data")
        fsum = jax.lax.psum(fsum[:_BINS], "data")
        fmin = jax.lax.pmin(fmin[:_BINS], "data")

        cum1 = cnt_lo + jnp.cumsum(fhist)
        bin1 = jnp.searchsorted(cum1, k, side="left").astype(jnp.int32)
        # Everything strictly below the k-th bin, then the k-th bin's min is
        # the k-th smallest value (fine bins are narrower than one fp32 ulp
        # for values >= hi0/8; ties below that share one bin and the min is
        # still the correct k-th order statistic because the whole bin
        # collapses to values within an ulp).
        below_cnt = jnp.where(bin1 > 0, cum1[jnp.maximum(bin1 - 1, 0)], cnt_lo)
        below_sum = sum_lo + jnp.where(
            bin1 > 0, jnp.cumsum(fsum)[jnp.maximum(bin1 - 1, 0)], 0.0
        )
        kth = fmin[bin1]
        eps = (below_sum + (k - below_cnt).astype(jnp.float32) * kth) / \
            k.astype(jnp.float32)

        # ---- phase 4: adjacency stripe + distributed DBSCAN -------------
        def adj_body(c, acc):
            fd = final_chunk(c)
            rows = row0_global + c * b + jnp.arange(b, dtype=jnp.int32)
            ok = (rows[:, None] < n) & col_valid[None, :]
            return jax.lax.dynamic_update_slice(
                acc, (fd <= eps) & ok, (c * b, 0)
            )

        adj = jax.lax.fori_loop(
            0, n_chunks, adj_body, jnp.zeros((r, npad), bool)
        )
        from ssg_tpu.parallel.ring import stripe_transpose

        adj = adj | stripe_transpose(adj)
        big = jnp.int32(npad)
        degree = jnp.sum(adj.astype(jnp.int32), axis=1)
        core_local = degree >= min_samples
        core = jax.lax.all_gather(core_local, "data", tiled=True)
        gidx = row0_global + jnp.arange(r, dtype=jnp.int32)
        adj_core = adj & core_local[:, None] & core[None, :]
        labels = jax.lax.all_gather(
            jnp.where(core_local, gidx, big), "data", tiled=True
        )

        def propagate(labels):
            # Chunked neighbor-min: the masked (r, npad) int32 select would
            # be the largest transient of the whole pipeline at big N; a
            # (b, npad) rolling window keeps phase-4 memory at bool scale.
            def nmin(c, acc):
                a = jax.lax.dynamic_slice(adj_core, (c * b, 0), (b, npad))
                m = jnp.min(jnp.where(a, labels[None, :], big), axis=1)
                return jax.lax.dynamic_update_slice(acc, m, (c * b,))

            neigh_min = jax.lax.fori_loop(
                0, n_chunks, nmin, jnp.full((r,), big, jnp.int32)
            )
            new_local = jnp.minimum(labels[gidx], neigh_min)
            new = jax.lax.all_gather(new_local, "data", tiled=True)
            hop = jnp.where(new < big, new, 0)
            return jnp.where(new < big, jnp.minimum(new, jnp.take(new, hop)), new)

        start = jax.lax.pcast(jnp.bool_(True), ("data",), to="varying")

        def cond(state):
            return state[1]

        def body(state):
            labels, _ = state
            new = propagate(labels)
            return new, jnp.any(new != labels)

        labels, _ = jax.lax.while_loop(cond, body, (labels, start))

        def border_min(c, acc):
            a = jax.lax.dynamic_slice(adj, (c * b, 0), (b, npad))
            m = jnp.min(
                jnp.where(a & core[None, :], labels[None, :], big), axis=1
            )
            return jax.lax.dynamic_update_slice(acc, m, (c * b,))

        core_neigh_local = jax.lax.fori_loop(
            0, n_chunks, border_min, jnp.full((r,), big, jnp.int32)
        )
        core_neigh = jax.lax.all_gather(core_neigh_local, "data", tiled=True)
        raw = jnp.where(core, labels, core_neigh)
        idx = jnp.arange(npad, dtype=jnp.int32)
        is_root = core & (labels == idx)
        root_rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1
        out = jnp.where(
            raw < big, jnp.take(root_rank, jnp.where(raw < big, raw, 0)), -1
        )
        return (out.astype(jnp.int32), jnp.sum(is_root.astype(jnp.int32)),
                eps, final_stripe)

    import os as _os

    debug_final = bool(_os.environ.get("SSG_STREAM_DEBUG_FINAL"))
    labels, n_clusters, eps, final = jax.shard_map(
        impl, mesh=mesh, in_specs=P("data", None),
        out_specs=(P(), P(), P(), P("data", None) if debug_final else P()),
        check_vma=False,
    )(f)
    return labels, n_clusters, eps, final


def streaming_cluster(
    features: jax.Array,
    mesh: Mesh,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.1,
    rho: float = 1.6e-3,
    min_samples: int = 4,
    chunk: int = 512,
    l1_impl: str = "auto",
):
    """k-reciprocal re-rank + auto-eps DBSCAN without materializing the
    distance matrix: O(N^2/P) bool + ONE fp32 V stripe per chip.

    Returns (labels (N,) int32, n_clusters, eps) — matching
    re_ranking + cluster numerics (eps within fp32-histogram exactness).
    """
    p = mesh.shape["data"]
    n = features.shape[0]
    f = _pad_rows(features.astype(jnp.float32), p * chunk if n > p * chunk
                  else p)
    stripe_bytes = (f.shape[0] // p) * f.shape[0] * 4
    if stripe_bytes > 2**31:
        raise ValueError(
            f"V stripe would be {stripe_bytes / 2**30:.1f} GiB per chip — "
            f"over XLA's 2 GiB buffer limit (measured ceiling N~23k at "
            f"P=1). Use a mesh with P >= {stripe_bytes * p // 2**31 + 1} "
            f"devices for N={n}."
        )
    # Chunk must divide the per-device stripe; shrink for tiny inputs.
    r = f.shape[0] // p
    c = min(chunk, r)
    while r % c:
        c -= 1
    k1 = min(int(k1), n - 1)
    k2 = min(int(k2), n - 1)
    labels, n_clusters, eps, final = _streaming_impl(
        f, n, mesh, k1, k2, float(lambda_value), float(rho),
        int(min_samples), int(c), l1_impl,
    )
    import os

    if os.environ.get("SSG_STREAM_DEBUG_FINAL"):
        return labels[:n], n_clusters, eps, final[:n, :n]
    return labels[:n], n_clusters, eps
