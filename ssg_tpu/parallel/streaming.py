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
  phase 3  eps:                       ONE bound-and-correct main sweep —
           a sampled chunk estimates the eps region (r_lo, r_hi], then
           per chunk a bf16 mask-GEMM lower bound fd_lb <= fd (MXU,
           ops/minsum.py) prunes every pair with fd_lb > r_hi; the few
           per-row survivors are compacted (exact approx_min_k) and their
           EXACT distances recomputed from per-row compacted-V (idx, val)
           tables (S x S compare-select, S ~ 128, vs N-wide dense L1 on
           the VPU). The k-th value and eps then come out of the compacted
           view in closed form (two-level sub-ulp histogram); exact
           post-hoc checks (k-th inside region, no candidate/support
           overflow, eps inside region) gate a mesh-uniform fallback to
           dedicated exact sweeps.
  phase 4  DBSCAN:                    adjacency stripe (final <= eps, bit-
           packed) + distributed min-label propagation (sklearn-identical
           labels). On the fast path every adjacency pair is already a
           compacted candidate (fd <= eps <= r_hi), so the stripe is
           scattered straight from the slots — no adjacency sweep at all.

Per-chip HBM at N=126k, P=16: feats 1 GB + V fp32 4 GB (+ bf16 screen
copy 2 GB) + rh/r bool 2 GB + adjacency bool 1 GB + compacted V ~130 MB +
chunk workspace — the MSMT17 config on a v5e-16; P=8 covers N ≈ 64k.
Compute: the fast path runs ZERO dense fp32 L1 sweeps (one sampled chunk
excepted) — the N^2/P pair screen rides the MXU at bf16; the exact
fallbacks (degenerate/tied distributions, overflowed caps) still run the
dense Pallas L1 chunk sweeps.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ssg_tpu.ops._compat import on_tpu, round_up
from ssg_tpu.ops.l1 import _l1_pallas, _l1_xla
from ssg_tpu.ops.topk import exact_min_k
from ssg_tpu.parallel.ring import (ring_contract, ring_gather_sum,
                                   ring_pairwise)
_BINS = 8192
# Coarse bins for the phase-3 SAMPLE histogram: it only locates the eps
# region (exact checks verify it post hoc), and its noise floor is the
# sampling error (~±37*w0 measured), so 64*w0-wide bins lose nothing.
_BINS_S = _BINS // 64


def _group_geometry(b: int, cap: int) -> tuple[int, int]:
    """(g_rows, gcap) for the main sweep's grouped slot compaction.

    Per-row approx_min_k must budget ``cap`` for the WORST row (~0.017*N
    measured max candidates) while the mean is ~0.0025*N, so G=8 adjacent
    rows' slots re-compact into gcap = 2*cap — a 4x cut of the exact S x S
    correction with ~3.6x headroom over the measured group mean. Group
    overflow is an exact count check routed to the same fallback as
    per-row overflow. G shrinks to keep dividing the chunk; cap == 0 (the
    fused path statically disabled) degenerates to no grouping.
    """
    g_rows = 8 if b % 8 == 0 else (4 if b % 4 == 0 else (2 if b % 2 == 0
                                                         else 1))
    if cap == 0:
        return 1, 0
    return g_rows, min(2 * cap, g_rows * cap)


def _default_eps_cap(g_rows: int, gcap: int) -> int:
    """Default grouped eps-compaction width (slots per slot-row).

    Invariant (regression-tested): the per-MATRIX-row capacity
    ecap / g_rows must never fall below the pre-grouping, measured-safe
    per-row budget cap//8 — gcap//8 violated it 4x and silently sent eps
    to the two dense exact sweeps on realistic data (fb bit 16).
    """
    return min(max(64, round_up(gcap // 2, 64)), max(gcap, 1))


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


def _phases12(f_local, n, k1, k2, lambda_value, b, n_chunks, n_vblk, l1_tile,
              support_cap=0, valid_global=None):
    """Phases 1-2 (rank lists + V stripe), shared by the clustering and the
    evaluation pipelines. Runs inside shard_map over axis "data"; returns
    the ``final_chunk``/``chunk_valid`` closures (re-ranked distance rows of
    this shard, computed chunk-by-chunk) plus the shard's row geometry.

    With ``support_cap > 0`` a final element ``bound_ctx`` is non-None: the
    bound-and-correct machinery (ops/minsum.py) for the main sweep — V rows
    compacted to (idx, val) lists and all-gathered (tiny: N x S vs the N x N
    stripe), a hoisted bf16 V stripe for the MXU screening GEMM, and the
    ``bound_chunk``/``slot_fd`` closures. ``bound_ctx['sup_ovf']`` flags any
    V row whose support exceeds support_cap (compaction would under-count
    ms) — the caller must then take the exact-sweep fallback."""
    r = f_local.shape[0]
    half = int(round(k1 / 2.0))
    me = jax.lax.axis_index("data")
    row0_global = me * r
    f_all = jax.lax.all_gather(f_local, "data", tiled=True)  # (npad, D)
    npad = f_all.shape[0]
    cb = npad // n_vblk  # V/rh stripes stored as n_vblk column blocks so no
    # single buffer exceeds ~1 GiB (XLA's 2 GiB limit); every consumer
    # (L1, overlap, expansion, row sums) decomposes additively over columns.
    y2 = jnp.sum(f_all * f_all, axis=1)  # (npad,)
    # Row/column validity: the clustering path pads rows as a suffix
    # (prefix-valid); the interleaved eval layout scatters per-shard pad
    # rows through the stripe and passes an explicit (npad,) bool vector.
    col_valid = (jnp.arange(npad, dtype=jnp.int32) < n) \
        if valid_global is None else valid_global

    def dist_chunk(c):
        """Squared-Euclidean distances of my chunk c rows vs all.

        The optimization_barrier pins the GEMM on the MXU: without it,
        XLA's priority fusion swallows a dot whose consumers are all
        elementwise into a VPU kLoop fusion — measured 35 ms/chunk vs
        ~1 ms as a real dot at (1024, 2048) x (2048, 16384) — the same
        demotion hits every big GEMM in this pipeline whose result feeds
        only compares/selects (overlap, expansion, screen bound).
        """
        fc = jax.lax.dynamic_slice(f_local, (c * b, 0),
                                   (b, f_local.shape[1]))
        x2 = jnp.sum(fc * fc, axis=1, keepdims=True)
        prod = jax.lax.optimization_barrier(jnp.dot(
            fc, f_all.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ))
        d = x2 + y2[None, :] - 2.0 * prod
        return jnp.maximum(d, 0.0)

    def row_ids(c):
        return row0_global + c * b + jnp.arange(b, dtype=jnp.int32)

    # ---- phase 1: rank lists + column max -------------------------
    def p1(c, carry):
        nn1, nnh, nn2, colmax = carry
        d = dist_chunk(c)
        score = jnp.where(col_valid[None, :], d, jnp.inf)
        # exact_min_k returns SORTED neighbors, so the k1/2 and k2 lists
        # are prefix slices — one top-k pass per chunk instead of three
        # (k2 <= k1 in every reference config).
        _, i1 = exact_min_k(score, k1 + 1)
        ih = i1[:, : half + 1]
        i2 = i1[:, :k2] if k2 <= k1 + 1 else (
            exact_min_k(score, k2)[1])
        nn1 = jax.lax.dynamic_update_slice(nn1, i1, (c * b, 0))
        nnh = jax.lax.dynamic_update_slice(nnh, ih, (c * b, 0))
        nn2 = jax.lax.dynamic_update_slice(nn2, i2, (c * b, 0))
        row_ok = jnp.take(col_valid, row_ids(c))
        colmax = jnp.maximum(
            colmax, jnp.max(jnp.where(row_ok[:, None], d, -jnp.inf), 0)
        )
        return nn1, nnh, nn2, colmax

    nn1 = jnp.zeros((r, k1 + 1), jnp.int32)
    nnh = jnp.zeros((r, half + 1), jnp.int32)
    nn2 = jnp.zeros((r, k2), jnp.int32)
    colmax0 = jnp.full((npad,), -jnp.inf, jnp.float32)
    # named_scope per phase: the whole pipeline compiles to ONE program, so
    # device-trace attribution (scripts/perf_streaming_trace.py) groups op
    # time by these scope prefixes in the HLO metadata.
    with jax.named_scope("s_p1_ranklists"):
        nn1, nnh, nn2, colmax_l = jax.lax.fori_loop(
            0, n_chunks, p1, (nn1, nnh, nn2, colmax0)
        )
    colmax = jnp.maximum(jax.lax.pmax(colmax_l, "data"), 1e-12)
    nn1_all = jax.lax.all_gather(nn1, "data", tiled=True)  # (npad, k1+1)
    nnh_all = jax.lax.all_gather(nnh, "data", tiled=True)

    # rh bool stripe, stored in column blocks (the ring operand of the
    # expansion GEMMs; its per-block bf16 casts stay under the buffer
    # limit even at the single-chip ceiling).
    def blocks(x):
        return tuple(x[:, i * cb:(i + 1) * cb] for i in range(n_vblk))

    def build_rh(c, acc):
        m = _recip_chunk(nnh_all, row0_global + c * b, b, npad)
        return tuple(
            jax.lax.dynamic_update_slice(a, mb, (c * b, 0))
            for a, mb in zip(acc, blocks(m))
        )

    with jax.named_scope("s_p1_recip"):
        rh_blks = jax.lax.fori_loop(
            0, n_chunks, build_rh,
            tuple(jnp.zeros((r, cb), bool) for _ in range(n_vblk)),
        )
    row_valid = jnp.take(col_valid,
                         row0_global + jnp.arange(r, dtype=jnp.int32))
    rh_blks = tuple(
        blk & row_valid[:, None] & blocks(col_valid[None, :])[i]
        for i, blk in enumerate(rh_blks)
    )
    # |Rh(i)| straight from the (npad, half+1) lists: every member of
    # Rh(i) is an entry j of nnh[i] with i in nnh[j] — an 11x11 compare
    # per row. The former dense formulation (convert+reduce over the
    # (r, npad) bool rh stripe) was the largest unattributed op in the
    # round-3 device trace (0.21 s at N=16,384) for the same counts.
    rows_g = row0_global + jnp.arange(r, dtype=jnp.int32)
    with jax.named_scope("s_p1_rhsize"):
        # Counting matches directly assumes each nnh row holds DISTINCT
        # indices — true for the exact (recall_target=1.0) top-k above;
        # a future approx/backend change that could emit duplicates would
        # over-count vs the dense set-semantics mask this replaced.
        neigh_lists = jnp.take(nnh_all, nnh, axis=0)  # (r, half+1, half+1)
        recip_m = jnp.any(neigh_lists == rows_g[:, None, None], axis=-1)
        szl = jnp.sum(
            (recip_m & jnp.take(col_valid, nnh)).astype(jnp.float32), axis=1)
    sz = jax.lax.all_gather(
        jnp.where(row_valid, szl, 0.0), "data", tiled=True,
    )  # |Rh(c)| for all c

    # ---- phase 2: V stripe (column blocks) ---------------------------
    row_scale = jax.lax.dynamic_slice(colmax, (row0_global,), (r,))

    def gemm_t(a, bb):
        return jnp.dot(a, bb.T, preferred_element_type=jnp.float32)

    # bf16 rh stripe, hoisted ONCE: build_v's two mask GEMMs each cast the
    # full (r, npad) bool stripe per chunk visit (2 casts x n_chunks x
    # ~0.8 GB of convert traffic at N=16,384 ~ 30 ms); the bool blocks die
    # here, so peak HBM grows only by the bf16-vs-bool byte (stripe 2x).
    rhbf_blks = tuple(blk.astype(jnp.bfloat16) for blk in rh_blks)

    def build_v(c, v_acc):
        rows0 = c * b
        d = dist_chunk(c)
        orig = d / jax.lax.dynamic_slice(row_scale, (rows0,), (b,))[:, None]
        r_chunk = _recip_chunk(nn1_all, row0_global + rows0, b, npad)
        r_chunk = r_chunk & col_valid[None, :]
        r_chunk_blks = blocks(r_chunk)
        # overlap[i, c] = sum_k r[i,k] rh[c,k]: additive over col blocks.
        # optimization_barrier after each mask GEMM: their only consumers
        # are compares, and XLA otherwise demotes the dot into a VPU
        # kLoop fusion (see dist_chunk; measured 45 ms/chunk each here).
        overlap = jax.lax.optimization_barrier(sum(
            ring_pairwise(rb.astype(jnp.bfloat16), rhb, gemm_t)
            for rb, rhb in zip(r_chunk_blks, rhbf_blks)
        ))
        qualify = (r_chunk & (overlap > (2.0 / 3.0) * sz[None, :])).astype(
            jnp.bfloat16
        )
        # expansion[:, block] = qualify @ rh[:, block] per column block.
        expanded_blks = tuple(
            r_chunk_blks[i] | (jax.lax.optimization_barrier(
                ring_contract(qualify, rhb, precision=None)) > 0.0)
            for i, rhb in enumerate(rhbf_blks)
        )
        expanded = jnp.concatenate(expanded_blks, axis=1)
        w = jnp.where(expanded, jnp.exp(-orig), 0.0)
        v = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-30)
        return tuple(
            jax.lax.dynamic_update_slice(a, vb, (rows0, 0))
            for a, vb in zip(v_acc, blocks(v))
        )

    with jax.named_scope("s_p2_vstripe"):
        v_blks = jax.lax.fori_loop(
            0, n_chunks, build_v,
            tuple(jnp.zeros((r, cb), jnp.float32) for _ in range(n_vblk)),
        )

    # Query expansion: one ring pass per chunk against the V stripes.
    # (nn2 indices are k2-NN; a k2-row gather-sum from the row-sharded V —
    # the one-hot-GEMM formulation paid b*N*cb fp32 MACs per visit for the
    # same 6-row mean.)
    def build_vqe(c, acc):
        rows0 = c * b
        i2 = jax.lax.dynamic_slice(nn2, (rows0, 0), (b, k2))
        return tuple(
            jax.lax.dynamic_update_slice(
                a, ring_gather_sum(i2, vb) / float(k2), (rows0, 0)
            )
            for a, vb in zip(acc, v_blks)
        )

    if k2 != 1:
        with jax.named_scope("s_p2_qe"):
            v_blks = jax.lax.fori_loop(
                0, n_chunks, build_vqe,
                tuple(jnp.zeros((r, cb), jnp.float32) for _ in range(n_vblk)),
            )
    s_all = jax.lax.all_gather(
        sum(jnp.sum(vb, axis=1) for vb in v_blks), "data", tiled=True
    )

    def _finalize(fc, scale_rows, vc_blks):
        """Re-ranked distances of the given feature/V rows vs all columns.

        optimization_barrier as in dist_chunk: the dot's consumers are
        all elementwise, and XLA otherwise demotes it into a VPU kLoop
        fusion."""
        x2 = jnp.sum(fc * fc, axis=1, keepdims=True)
        prod = jax.lax.optimization_barrier(jnp.dot(
            fc, f_all.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ))
        d = jnp.maximum(x2 + y2[None, :] - 2.0 * prod, 0.0)
        orig = d / scale_rows[:, None]
        # ||V_i - V_j||_1 is additive over column blocks.
        l1 = sum(
            ring_pairwise(vcb, vb, l1_tile)
            for vcb, vb in zip(vc_blks, v_blks)
        )
        s_mine = sum(jnp.sum(vcb, axis=1) for vcb in vc_blks)
        min_sum = 0.5 * (s_mine[:, None] + s_all[None, :] - l1)
        jaccard = 1.0 - min_sum / (2.0 - min_sum)
        return jnp.maximum(
            jaccard * (1.0 - lambda_value) + orig * lambda_value, 0.0
        )

    def final_chunk(c):
        """(b, npad) final re-ranked distances of my chunk c rows."""
        rows0 = c * b
        return _finalize(
            jax.lax.dynamic_slice(f_local, (rows0, 0),
                                  (b, f_local.shape[1])),
            jax.lax.dynamic_slice(row_scale, (rows0,), (b,)),
            tuple(jax.lax.dynamic_slice(vb, (rows0, 0), (b, cb))
                  for vb in v_blks),
        )

    def final_rows(rows_local):
        """Gather variant of ``final_chunk`` for non-contiguous rows (the
        phase-3 sampler strides rows across the whole stripe — a contiguous
        chunk is a biased sample when inputs are identity-ordered)."""
        return _finalize(
            jnp.take(f_local, rows_local, axis=0),
            jnp.take(row_scale, rows_local),
            tuple(jnp.take(vb, rows_local, axis=0) for vb in v_blks),
        )

    def rows_valid(rows_global):
        cols = jnp.arange(npad, dtype=jnp.int32)
        return (cols[None, :] > rows_global[:, None]) & \
            jnp.take(col_valid, rows_global)[:, None] & col_valid[None, :]

    def chunk_valid(c):
        rows = row0_global + c * b + jnp.arange(b, dtype=jnp.int32)
        return rows_valid(rows)

    bound_ctx = None
    if support_cap > 0:
        from ssg_tpu.ops.minsum import (compact_rows, fd_lower, minsum_upper,
                                        sparse_minsum_pairs, support_mask)

        s_sup = min(int(support_cap), npad)
        # bf16 V stripe, hoisted once (the rotating operand of the
        # screening GEMM; casting per chunk visit would re-pay the cast
        # n_chunks times).
        vbf_blks = tuple(vb.astype(jnp.bfloat16) for vb in v_blks)

        def compact_body(c, carry):
            ci_acc, cv_acc, ovf = carry
            rows0 = c * b
            vrow = jnp.concatenate(
                [jax.lax.dynamic_slice(vb, (rows0, 0), (b, cb))
                 for vb in v_blks], axis=1)  # (b, npad)
            nz = jnp.sum((vrow > 0.0).astype(jnp.int32), axis=1)
            ovf = ovf | jnp.any(nz > s_sup)
            idx, val = compact_rows(vrow, s_sup)
            ci_acc = jax.lax.dynamic_update_slice(ci_acc, idx, (rows0, 0))
            cv_acc = jax.lax.dynamic_update_slice(cv_acc, val, (rows0, 0))
            return ci_acc, cv_acc, ovf

        with jax.named_scope("s_p2_compact"):
            cidx_loc, cval_loc, sup_ovf = jax.lax.fori_loop(
                0, n_chunks, compact_body,
                (jnp.zeros((r, s_sup), jnp.int32),
                 jnp.zeros((r, s_sup), jnp.float32), jnp.bool_(False)),
            )
        # The compacted V is small enough to replicate everywhere
        # (N x S x 8 B ~ 17 MB at N=16k) — so the exact correction is a
        # purely local gather on every device, no ring needed.
        cidx_all = jax.lax.all_gather(cidx_loc, "data", tiled=True)
        cval_all = jax.lax.all_gather(cval_loc, "data", tiled=True)

        def bound_tile(bm, vbf):
            return jnp.dot(bm, vbf.T, preferred_element_type=jnp.float32)

        def bound_chunk(c):
            """(fd_lb, orig) for my chunk c: a SOUND lower bound on the
            re-ranked distance via the bf16 mask-GEMM ms upper bound
            (MXU work instead of the dense fp32 L1 on the VPU)."""
            rows0 = c * b
            fc = jax.lax.dynamic_slice(f_local, (rows0, 0),
                                       (b, f_local.shape[1]))
            x2 = jnp.sum(fc * fc, axis=1, keepdims=True)
            # Barriers as in dist_chunk/build_v: both dots feed only
            # elementwise consumers (compares/maximum/minsum bound) and
            # XLA otherwise demotes them into VPU kLoop fusions.
            prod = jax.lax.optimization_barrier(jnp.dot(
                fc, f_all.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ))
            d = jnp.maximum(x2 + y2[None, :] - 2.0 * prod, 0.0)
            orig = d / jax.lax.dynamic_slice(row_scale, (rows0,), (b,))[:, None]
            g = jax.lax.optimization_barrier(sum(
                ring_pairwise(
                    support_mask(jax.lax.dynamic_slice(vb, (rows0, 0),
                                                       (b, cb))),
                    vbf, bound_tile)
                for vb, vbf in zip(v_blks, vbf_blks)
            ))
            return fd_lower(minsum_upper(g), orig, lambda_value), orig

        def slot_fd_pairs(c, rowl, cols, orig):
            """Exact re-ranked distance for grouped slots of my chunk c:
            ``rowl`` (bg, Q) row-in-chunk and ``cols`` (bg, Q) absolute
            column per slot, from the compacted (idx, val) tables. The row
            table varies per slot (cross-row compaction), so both sides
            gather — sparse_minsum_pairs."""
            rows0 = c * b
            ci = jnp.take(cidx_loc, rows0 + rowl, axis=0)  # (bg, Q, S)
            cv = jnp.take(cval_loc, rows0 + rowl, axis=0)
            ms = sparse_minsum_pairs(
                ci, cv, jnp.take(cidx_all, cols, axis=0),
                jnp.take(cval_all, cols, axis=0))
            jac = 1.0 - ms / (2.0 - ms)
            o = jnp.take(orig.reshape(-1), rowl * npad + cols)
            return jnp.maximum(
                jac * (1.0 - lambda_value) + o * lambda_value, 0.0)

        bound_ctx = {"bound_chunk": bound_chunk,
                     "slot_fd_pairs": slot_fd_pairs, "sup_ovf": sup_ovf}

    return (final_chunk, final_rows, rows_valid, chunk_valid, row0_global,
            col_valid, npad, r, bound_ctx)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k1", "k2", "lambda_value",
                     "min_samples", "chunk", "l1_impl", "n_vblk",
                     "with_final", "band_cap", "support_cap", "eps_cap",
                     "n_groups"),
)
def _streaming_impl(f, n, rho, mesh, k1, k2, lambda_value, min_samples,
                    chunk, l1_impl, n_vblk=1, with_final=False,
                    band_cap=256, support_cap=128, eps_cap=None,
                    n_groups=0):
    # rho is traced (like n): per-iteration rho scheduling reuses the
    # compiled graph. n_groups > 0: f is (G, npad, D) and the per-group
    # pipeline runs under ONE lax.map inside one shard_map program —
    # one dispatch for all feature groups (the SSG loop's 3 groups paid
    # a dispatch each; the dense path fuses them for the same reason).
    npad = f.shape[-2]
    p = mesh.shape["data"]
    r = npad // p
    b = chunk
    n_chunks = r // b
    cap = min(band_cap, npad)
    g_rows, gcap = _group_geometry(b, cap)
    assert not (n_groups and with_final), "grouped run cannot return final"

    l1_tile = _l1_pallas if l1_impl == "pallas" or (
        l1_impl == "auto" and on_tpu()) else _l1_xla

    def impl(f_local):
        (final_chunk, final_rows, rows_valid, chunk_valid, row0_global,
         col_valid, _, _, bound_ctx) = _phases12(
            f_local, n, k1, k2, lambda_value, b, n_chunks, n_vblk, l1_tile,
            support_cap=support_cap if cap > 0 else 0,
        )

        if with_final:
            def dump(c, acc):
                return jax.lax.dynamic_update_slice(
                    acc, final_chunk(c), (c * b, 0)
                )

            final_stripe = jax.lax.fori_loop(
                0, n_chunks, dump, jnp.zeros((r, npad), jnp.float32)
            )
        else:
            final_stripe = jnp.zeros((1, 1), jnp.float32)

        # ---- phase 3: sampled-bounds single-sweep eps + adjacency -------
        # The former design spent a dedicated coarse sweep (Pallas L1 +
        # histogram, 3.85 s at N=16,384) just to LOCATE the k-th value's
        # bin before the fine sweep could run. This design samples ONE
        # chunk per device (1/n_chunks of a sweep) to ESTIMATE the eps
        # region, then does everything in a single main sweep:
        #   - exact reductions: total pair count, count/sum below r_lo;
        #   - definite adjacency fd <= r_lo (bit-packed inline);
        #   - exact approx_min_k compaction of every pair in (r_lo, r_hi].
        # The k-th value and eps then come out of the compacted view in
        # closed form (two-level sub-ulp histogram over (r, cap) arrays).
        # The sample carries NO exactness burden: post-hoc checks verify
        # (a) the k-th value landed inside (r_lo, r_hi] (exact counts),
        # (b) no slot-group overflowed gcap, (c) eps landed in the region;
        # a mesh-uniform lax.cond re-runs full sweeps if any check fails.
        hi0 = jnp.float32(1.0 + lambda_value)  # jaccard <= 1, orig <= 1
        w0 = hi0 / _BINS

        def cidx(fd):
            return jnp.clip((fd / w0).astype(jnp.int32), 0, _BINS - 1)

        def hist_full(fd, valid):
            """(chunk, npad)-element histogram at _BINS bins, backend-tuned.

            TPU: ==-against-iota compare-reduce on the VPU (scatter
            serializes to ~9 ns/element there — docs/streaming_profile.md:
            1.47 s vs 2.35 s per full sweep). CPU (the test mesh): the same
            compare-reduce lowers pathologically in XLA:CPU (measured
            ~100x slower than scatter), so scatter-add it is. Counts are
            identical either way.
            """
            ci = jnp.where(valid, cidx(fd), _BINS)
            if on_tpu():
                one = ci[:, :, None] == jnp.arange(_BINS, dtype=jnp.int32)
                return jnp.sum(one, axis=(0, 1), dtype=jnp.int32)
            return jnp.zeros((_BINS + 1,), jnp.int32) \
                .at[ci.ravel()].add(1)[:_BINS]

        from ssg_tpu.ops.bits import pack_bits, popcount, unpack_bits
        from ssg_tpu.parallel.ring import stripe_transpose_packed

        nbytes = npad // 8

        with jax.named_scope("s_p3_sample"):
            # One chunk's worth of rows spread over the whole stripe as a
            # golden-ratio Weyl sequence (static coprime multiplier, so the
            # map i -> i*c mod r is a bijection: rows are distinct and
            # equidistribute in EVERY residue class). Measured on real
            # identity-ordered features (N=8192): a contiguous chunk
            # biases the mean estimate +215 bins; a plain stride aligns
            # with the data's period-8 structure (estimates swing 0.56 to
            # 0.69 across offsets); Weyl rows match the truth within
            # ~±37 bins, inside the slack.
            import math
            c_mul = max(int(round(0.6180339887 * r)) | 1, 1)
            while math.gcd(c_mul, r) != 1:
                c_mul += 2
            rows_s = jnp.asarray(
                np.fromiter(((i * c_mul) % r for i in range(b)),
                            np.int32, count=b))
            fd0 = final_rows(rows_s)
            tri0 = rows_valid(row0_global + rows_s) & (fd0 != 0.0)
            # The sample only LOCATES the eps region — its resolution need
            # not beat the sampling noise (measured ~±37*w0 on real
            # features), so COARSE bins (64*w0 wide) suffice for the bin
            # index, and the value sums that feed e_lo/e_hi are computed
            # EXACTLY with one masked reduction instead of fine-bin edge
            # sums. The former _BINS-bin compare-reduce was the largest
            # unattributed op in the round-3 device trace (0.21 s at
            # N=16,384 — it histogrammed 16M sample elements at 8,192
            # bins); 128 bins cost ~3 ms for the same downstream region.
            w_s = hi0 / _BINS_S

            def sample_hist(idx, mask):
                """Histogram of the sample at _BINS_S bins, backend-tuned
                (compare-reduce on TPU, scatter-add on the CPU test mesh —
                same counts; see hist_full)."""
                flat = jnp.where(mask, idx, _BINS_S)
                if on_tpu():
                    h = jnp.sum(
                        flat[:, :, None] == jnp.arange(_BINS_S,
                                                       dtype=jnp.int32),
                        axis=(0, 1), dtype=jnp.int32)
                else:
                    h = jnp.zeros((_BINS_S + 1,), jnp.int32) \
                        .at[flat.ravel()].add(1)[:_BINS_S]
                return jax.lax.psum(h, "data")  # P sample chunks

            ci_s = jnp.clip((fd0 / w_s).astype(jnp.int32), 0, _BINS_S - 1)
            hs = sample_hist(ci_s, tri0)

            # Sampled eps/kth region (generous slack; verified post-hoc).
            s_total = jnp.sum(hs)
            k_s = jnp.maximum(jnp.round(
                rho * s_total.astype(jnp.float32)).astype(jnp.int32), 1)
            cum_s = jnp.cumsum(hs)
            b_s = jnp.minimum(
                jnp.searchsorted(cum_s, k_s, side="left").astype(jnp.int32),
                _BINS_S - 1)
            below_s = jnp.where(b_s > 0, cum_s[jnp.maximum(b_s - 1, 0)], 0)
            # Second level: re-histogram the k-th COARSE bin's sample
            # values at _BINS_S sub-bins (w_f = 64*w0/128 = w0/2). The
            # coarse pass alone snapped the region edges to 64*w0-bin
            # boundaries; measured at N=24,576 (synthetic, eps in the
            # distribution bulk at ~850k pairs per coarse bin) that one
            # extra bin per side inflated the candidate band 639k -> 2.3M
            # pairs and overflowed every cap — a silent fast-path loss
            # worth two orders of magnitude (4.9 s -> 48 s). One more
            # ~3 ms compare-reduce restores sub-w0 edges.
            w_f = w_s / _BINS_S
            lo_s = b_s.astype(jnp.float32) * w_s
            in_b = tri0 & (ci_s == b_s)
            fi_s = jnp.clip(((fd0 - lo_s) / w_f).astype(jnp.int32),
                            0, _BINS_S - 1)
            hf = sample_hist(fi_s, in_b)
            cum_f = below_s + jnp.cumsum(hf)
            b_f = jnp.minimum(
                jnp.searchsorted(cum_f, k_s, side="left").astype(jnp.int32),
                _BINS_S - 1)
            kth_lo = lo_s + b_f.astype(jnp.float32) * w_f
            kth_hi = kth_lo + w_f
            below_f = jnp.where(b_f > 0, cum_f[jnp.maximum(b_f - 1, 0)],
                                below_s)
            # Exact sum of sampled values below the k-th SUB-bin (one
            # masked reduction — no fine-bin edge sums needed).
            sum_below_f = jax.lax.psum(jnp.sum(jnp.where(
                tri0 & ((ci_s < b_s) | (in_b & (fi_s < b_f))),
                fd0, 0.0)), "data")
        rem_s = jnp.maximum(k_s - below_f, 0).astype(jnp.float32)
        ksf = k_s.astype(jnp.float32)
        e_lo = (sum_below_f + rem_s * kth_lo) / ksf
        e_hi = (sum_below_f + rem_s * kth_hi) / ksf
        # Lower edge guards eps (a MEAN of the k smallest — on clustered
        # real data it sits well below the k-th value, and its sample
        # estimate carries the noise of the whole below-kth distribution),
        # so it gets double the slack of the kth-bin upper edge.
        # Slack stays in w0 units (absolute): the two-level sample bins
        # quantize the k-th-bin edges by at most w_f = w0/2, outward only
        # (kth_lo can only drop, kth_hi can only rise), so the region
        # stays sound and at most w0 wider than the fine-swept edges.
        slack = 64.0 * w0
        r_lo = jnp.maximum(jnp.minimum(e_lo, kth_lo) - 2.0 * slack, 0.0)
        r_hi = jnp.maximum(kth_hi, e_hi) + slack

        # ---- main sweep: bound-screen + exact-correct + compaction -------
        # The exact fp32 L1 over V is VPU element work at N per pair; the
        # sweep instead screens every pair with the bf16 mask-GEMM lower
        # bound fd_lb <= fd (ops/minsum.py — MXU work), compacts the few
        # per-row survivors of fd_lb <= r_hi (mean ~40/row on real
        # features), and computes the EXACT distance only for those from
        # the compacted (idx, val) V tables (S x S compare-select, S ~ 128
        # vs N dense). Pairs pruned by the bound can never enter the eps
        # statistic or the adjacency (fd >= fd_lb > r_hi) — they only
        # contribute to the nonzero-pair total, which needs no value.
        # Soundness guards: per-row candidate overflow, V-support overflow
        # (compaction would under-count ms), and the existing post-hoc
        # k-th/eps region checks all force the exact-sweep fallback.
        bg = b // g_rows  # slot-groups per chunk
        # Tier width for the exact S x S correction: the grouped slot
        # arrays budget gcap for the WORST group while the measured mean
        # live count is ~2.2x smaller, and exact_min_k returns live slots
        # FIRST (ascending lower bound, inf-padded tail) — so the common
        # case corrects only the head tier and a mesh-uniform lax.cond
        # runs the tail tier only for chunks where some group's exact
        # live count exceeds the tier (no exactness rests on the bound:
        # the count check is over captured slots). Tiny caps (tests,
        # degenerate inputs) skip tiering.
        xt = gcap if gcap <= 256 else min(
            round_up(max(gcap // 3, 256), 64), gcap)

        def sweep_main(c, carry):
            pruned, cc_acc, cf_acc, cr_acc, ovf, rmax, rsum, gmax = carry
            rows = row0_global + c * b + jnp.arange(b, dtype=jnp.int32)
            ok = (rows[:, None] < n) & col_valid[None, :]
            if cap > 0:
                with jax.named_scope("s_p3m_bound"):
                    fd_lb, orig = bound_ctx["bound_chunk"](c)
                candm = ok & (fd_lb <= r_hi)
                # Upper-triangle pairs pruned by the bound: all nonzero
                # (fd >= fd_lb > r_hi > 0), counted without their values.
                cols_gt = chunk_valid(c)
                pruned += jnp.sum((cols_gt & ~candm).astype(jnp.int32))
                cand_rows = jnp.sum(candm.astype(jnp.int32), axis=1)
                rmax = jnp.maximum(rmax, jnp.max(cand_rows))
                rsum += jnp.sum(cand_rows)
                key = jnp.where(candm, fd_lb, jnp.inf)
                # Direct group-level capture: ONE exact_min_k per slot-group
                # over the g_rows*npad-wide key instead of a per-row
                # selection at cap followed by a group re-selection — the
                # per-row pass was 0.186 s of the 1.19 s N=16,384 program
                # and its set is identical whenever the group's live count
                # fits gcap (exact check below; overflow -> fallback).
                # Selection is by the lower bound, but when the count fits
                # EVERY live slot survives, so exactness never rests on
                # the bound. A side win: per-row truncation (a row alone
                # exceeding the old cap budget) can no longer force a
                # fallback — only the group total matters.
                # Groups take STRIDED rows (i, i+bg, i+2bg, ...): real
                # extracted features arrive identity-ordered, so adjacent
                # rows share a cluster and their candidate counts correlate
                # — a dense cluster would overflow adjacent groups in
                # lockstep (the round-3 sampler-bias failure pattern).
                # Strided composition decorrelates: one worst-case row per
                # group costs 278 + 7*40 << gcap.
                keyg = jnp.swapaxes(
                    key.reshape(g_rows, bg, npad), 0, 1
                ).reshape(bg, g_rows * npad)
                # Exact per-group candidate count from the row counts
                # (group i owns rows i, i+bg, ...): no truncation happened
                # yet, so this is the true live total per group.
                cnt_g = jnp.sum(cand_rows.reshape(g_rows, bg), axis=0)
                ovf = ovf | jnp.any(cnt_g > gcap)
                gmax = jnp.maximum(gmax, jnp.max(cnt_g))
                with jax.named_scope("s_p3m_topk_grp"):
                    lbg, flat = exact_min_k(keyg, gcap)
                rowg = (flat // npad).astype(jnp.int32)  # row-in-group
                colg = (flat - rowg * npad).astype(jnp.int32)
                rowl = rowg * bg \
                    + jnp.arange(bg, dtype=jnp.int32)[:, None]  # row-in-chunk
                with jax.named_scope("s_p3m_sparse"):
                    fd_s = bound_ctx["slot_fd_pairs"](
                        c, rowl[:, :xt], colg[:, :xt], orig)
                if xt < gcap:
                    # Tail tier: live slots beyond xt exist in this chunk
                    # (exact count; mesh-uniform so shard programs agree).
                    need_tail = jax.lax.pmax(
                        jnp.any(cnt_g > xt).astype(jnp.int32), "data") > 0
                    with jax.named_scope("s_p3m_sparse_tail"):
                        fd_t = jax.lax.cond(
                            need_tail,
                            lambda: bound_ctx["slot_fd_pairs"](
                                c, rowl[:, xt:], colg[:, xt:], orig),
                            lambda: jnp.full((bg, gcap - xt), jnp.inf,
                                             jnp.float32),
                        )
                    fd_s = jnp.concatenate([fd_s, fd_t], axis=1)
                fd_s = jnp.where(jnp.isfinite(lbg), fd_s, jnp.inf)
                cc_acc = jax.lax.dynamic_update_slice(cc_acc, colg,
                                                      (c * bg, 0))
                cf_acc = jax.lax.dynamic_update_slice(cf_acc, fd_s,
                                                      (c * bg, 0))
                cr_acc = jax.lax.dynamic_update_slice(cr_acc, rowg,
                                                      (c * bg, 0))
            else:
                # cap=0 statically disables the fused path (escape hatch +
                # deterministic tests): one exact sweep still provides the
                # nonzero-pair total that sizes k; eps/adjacency then run
                # the dedicated fallback sweeps.
                fd = final_chunk(c)
                pruned += jnp.sum(
                    (chunk_valid(c) & (fd != 0.0)).astype(jnp.int32))
            return pruned, cc_acc, cf_acc, cr_acc, ovf, rmax, rsum, gmax

        with jax.named_scope("s_p3_main"):
            (pruned, cand_col, cand_fd, cand_row, cand_ovf, cand_rmax,
             cand_rsum, cand_gmax) = jax.lax.fori_loop(
                0, n_chunks, sweep_main,
                (jnp.int32(0),
                 jnp.full((r // g_rows, max(gcap, 1)), npad, jnp.int32),
                 jnp.full((r // g_rows, max(gcap, 1)), jnp.inf,
                          jnp.float32),
                 jnp.zeros((r // g_rows, max(gcap, 1)), jnp.int32),
                 jnp.bool_(cap == 0), jnp.int32(0), jnp.int32(0),
                 jnp.int32(0)),
            )
        cand_rmax = jax.lax.pmax(cand_rmax, "data")
        cand_gmax = jax.lax.pmax(cand_gmax, "data")
        cand_rsum = jax.lax.psum(cand_rsum, "data")

        # Slot-level stats (exact values for every pair with fd <= r_hi).
        # Global/local matrix row per slot, from the grouped layout:
        # accumulator row a holds chunk a//bg's slot-group a%bg, whose
        # row-in-group t is the STRIDED chunk row t*bg + (a%bg).
        arow = jnp.arange(r // g_rows, dtype=jnp.int32)[:, None]
        grp0 = (arow // bg) * b + (arow % bg)
        rows_loc = grp0 + cand_row * bg  # (r//G, gcap) local row in [0, r)
        rows_gs = row0_global + rows_loc
        live = jnp.isfinite(cand_fd)
        slot_tri = live & (cand_fd != 0.0) & (cand_col > rows_gs)
        below_m = slot_tri & (cand_fd <= r_lo)
        total = jax.lax.psum(
            pruned + jnp.sum(slot_tri.astype(jnp.int32)), "data")
        cnt_below = jax.lax.psum(jnp.sum(below_m.astype(jnp.int32)), "data")
        sum_below = jax.lax.psum(
            jnp.sum(jnp.where(below_m, cand_fd, 0.0)), "data")
        # Region pairs (upper triangle) — the eps_fast histogram domain.
        tri_c = slot_tri & (cand_fd > r_lo) & (cand_fd <= r_hi)
        cnt_rtri = jax.lax.psum(jnp.sum(tri_c.astype(jnp.int32)), "data")
        ovf_any = jax.lax.pmax(cand_ovf.astype(jnp.int32), "data") > 0
        sup_any = (jax.lax.pmax(
            bound_ctx["sup_ovf"].astype(jnp.int32), "data") > 0) \
            if cap > 0 else jnp.bool_(False)
        k = jnp.maximum(
            jnp.round(rho * total.astype(jnp.float32)).astype(jnp.int32), 1
        )
        # Exact post-hoc checks: the k-th smallest pair is inside the
        # compacted region, no slot-group overflowed gcap, no V row overflowed
        # the support compaction.
        p_fast = (cnt_below < k) & (k <= cnt_below + cnt_rtri) \
            & ~ovf_any & ~sup_any

        # Region pairs compact once more before the eps histograms: TPU
        # scatter costs ~9 ns/element INCLUDING dead slots, so 5 scatter
        # passes over the full slot array were 0.41 s at N=16,384 while the
        # live region pairs are ~16 per matrix row. One exact approx_min_k
        # narrows the domain to (r//G, eps_cap) over the grouped slots;
        # slot-rows with more region pairs than eps_cap (exact count check)
        # fall back to eps_slow ONLY — the adjacency fast path is
        # unaffected. Default: _default_eps_cap (gcap//2 = G*cap/4 — the
        # same per-matrix-row capacity and scatter budget as the
        # pre-grouping per-row scheme; see its invariant note).
        ecap = _default_eps_cap(g_rows, gcap) \
            if eps_cap is None else min(int(eps_cap), max(gcap, 1))
        reg_ovf = jax.lax.pmax(
            jnp.any(jnp.sum(tri_c.astype(jnp.int32), axis=1) > ecap)
            .astype(jnp.int32), "data") > 0

        def eps_fast(_):
            """Closed-form eps from the compacted region only.

            Two-level histogram over (r_lo, r_hi]: the region is at most
            3*slack + kth-bin wide (the two-level sampling quantizes each
            edge outward by at most one w0/2 sub-bin, on top of the
            3*slack = 192*w0 budget), so the level-2 bin width
            (r_hi - r_lo)/_BINS^2 <= ~194*w0/2^26 ~ 4e-10 — still sub-ulp
            for values >= ~0.0035 (stronger than the old full-range
            guarantee of >= hi0/8); tied values below that share a bin
            whose min is still the correct order statistic to within the
            tie collapse.
            """
            key = jnp.where(tri_c, cand_fd, jnp.inf)
            rvals, _ = exact_min_k(key, ecap)
            rlive = jnp.isfinite(rvals)
            fdr = rvals.ravel()
            w_a = (r_hi - r_lo) / _BINS
            i_a = jnp.clip(((rvals - r_lo) / w_a).astype(jnp.int32),
                           0, _BINS - 1)
            flat_a = jnp.where(rlive, i_a, _BINS).ravel()
            hist_a = jnp.zeros((_BINS + 1,), jnp.int32).at[flat_a].add(
                rlive.ravel().astype(jnp.int32))
            sum_a = jnp.zeros((_BINS + 1,), jnp.float32).at[flat_a].add(
                jnp.where(rlive.ravel(), fdr, 0.0))
            hist_a = jax.lax.psum(hist_a[:_BINS], "data")
            sum_a = jax.lax.psum(sum_a[:_BINS], "data")
            cum_a = cnt_below + jnp.cumsum(hist_a)
            bin_a = jnp.searchsorted(cum_a, k, side="left").astype(jnp.int32)
            lo_b = r_lo + bin_a.astype(jnp.float32) * w_a
            w_b = w_a / _BINS
            in_a = rlive & (i_a == bin_a)
            i_b = jnp.clip(((rvals - lo_b) / w_b).astype(jnp.int32),
                           0, _BINS - 1)
            flat_b = jnp.where(in_a, i_b, _BINS).ravel()
            hist_b = jnp.zeros((_BINS + 1,), jnp.int32).at[flat_b].add(
                in_a.ravel().astype(jnp.int32))
            sum_b = jnp.zeros((_BINS + 1,), jnp.float32).at[flat_b].add(
                jnp.where(in_a.ravel(), fdr, 0.0))
            min_b = jnp.full((_BINS + 1,), jnp.inf, jnp.float32) \
                .at[flat_b].min(jnp.where(in_a.ravel(), fdr, jnp.inf))
            hist_b = jax.lax.psum(hist_b[:_BINS], "data")
            sum_b = jax.lax.psum(sum_b[:_BINS], "data")
            min_b = jax.lax.pmin(min_b[:_BINS], "data")
            below_a_cnt = jnp.where(bin_a > 0,
                                    cum_a[jnp.maximum(bin_a - 1, 0)],
                                    cnt_below)
            cum_b = below_a_cnt + jnp.cumsum(hist_b)
            bin_b = jnp.searchsorted(cum_b, k, side="left").astype(jnp.int32)
            below_cnt = jnp.where(bin_b > 0,
                                  cum_b[jnp.maximum(bin_b - 1, 0)],
                                  below_a_cnt)
            below_sum = sum_below \
                + jnp.where(bin_a > 0,
                            jnp.cumsum(sum_a)[jnp.maximum(bin_a - 1, 0)],
                            0.0) \
                + jnp.where(bin_b > 0,
                            jnp.cumsum(sum_b)[jnp.maximum(bin_b - 1, 0)],
                            0.0)
            kth = min_b[bin_b]
            return (below_sum + (k - below_cnt).astype(jnp.float32) * kth) \
                / k.astype(jnp.float32)

        def eps_slow(_):
            """Sample misled or capacity overflowed: exact two-sweep eps
            (comparison-histogram coarse sweep to locate the k-th bin,
            then a full-scatter fine sweep — the pre-sampling program).

            k is re-derived from THIS sweep's exact histogram total, not
            the slot-based ``total``: a capacity overflow drops live slots,
            so the slot total undercounts nonzero pairs — using it here
            made the "exact" fallback land on a slightly-low k (measured:
            one extra cluster at N=256 under band_cap=1). When no slots
            were dropped the two totals are equal, so this is a strict
            superset of the old behavior."""
            def coarse_body(c, h):
                fd = final_chunk(c)
                tri = chunk_valid(c) & (fd != 0.0)
                return h + hist_full(fd, tri)

            hist0 = jax.lax.fori_loop(
                0, n_chunks, coarse_body, jnp.zeros((_BINS,), jnp.int32))
            hist0 = jax.lax.psum(hist0, "data")
            k = jnp.maximum(jnp.round(
                rho * jnp.sum(hist0).astype(jnp.float32)).astype(jnp.int32),
                1)
            cum0 = jnp.cumsum(hist0)
            bin0 = jnp.searchsorted(cum0, k, side="left").astype(jnp.int32)
            lo1 = bin0.astype(jnp.float32) * w0
            w1 = w0 / _BINS

            def fine_body(c, carry):
                cnt_lo, sum_lo, fhist, fsum, fmin = carry
                fd = final_chunk(c)
                tri = chunk_valid(c) & (fd != 0.0)
                ci = cidx(fd)
                below = tri & (ci < bin0)
                cnt_lo += jnp.sum(below.astype(jnp.int32))
                sum_lo += jnp.sum(jnp.where(below, fd, 0.0))
                inbin = tri & (ci == bin0)
                fi = jnp.clip(((fd - lo1) / w1).astype(jnp.int32),
                              0, _BINS - 1)
                flat = jnp.where(inbin, fi, _BINS).ravel()
                fdr = fd.ravel()
                fhist = fhist.at[flat].add(1)
                fsum = fsum.at[flat].add(
                    jnp.where(inbin.ravel(), fdr, 0.0))
                fmin = fmin.at[flat].min(
                    jnp.where(inbin.ravel(), fdr, jnp.inf))
                return cnt_lo, sum_lo, fhist, fsum, fmin

            cnt_lo, sum_lo, fhist, fsum, fmin = jax.lax.fori_loop(
                0, n_chunks, fine_body,
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
            below_cnt = jnp.where(bin1 > 0,
                                  cum1[jnp.maximum(bin1 - 1, 0)], cnt_lo)
            below_sum = sum_lo + jnp.where(
                bin1 > 0, jnp.cumsum(fsum)[jnp.maximum(bin1 - 1, 0)], 0.0)
            kth = fmin[bin1]
            return (below_sum + (k - below_cnt).astype(jnp.float32) * kth) \
                / k.astype(jnp.float32)

        with jax.named_scope("s_p3_eps"):
            # Mesh-uniform predicates: every device takes the same branch,
            # so the fallback's ring collectives stay aligned. reg_ovf
            # downgrades eps ONLY (exact two-sweep recompute); the
            # adjacency fast path needs just p_fast + eps-in-region.
            eps = jax.lax.cond(p_fast & ~reg_ovf, eps_fast, eps_slow,
                               operand=None)

        # ---- phase 4: bit-packed adjacency --------------------------------
        # The adjacency is the pipeline's only persistent O(N^2/P) state;
        # packing 8 columns/byte (ops/bits.py) shrinks it 8x — consumers
        # unpack (b, npad) row chunks on the fly. Exact check (c): the
        # definite/band split is only valid when eps itself landed inside
        # (r_lo, r_hi] — otherwise one dedicated sweep rebuilds it.
        adj_ok = p_fast & (eps >= r_lo) & (eps <= r_hi)
        band_fallback = ~adj_ok
        # Diagnostic bit code for perf attribution (diag["fallback_code"]):
        # 1 = a slot-group overflowed gcap, 2 = k-th pair outside the sampled
        # region, 4 = eps outside the region, 8 = a V-row support
        # overflowed the compaction width, 16 = a row's region pairs
        # overflowed eps_cap (eps took the exact two-sweep branch; the
        # adjacency fast path is unaffected).
        fb_code = (ovf_any.astype(jnp.int32)
                   + 2 * (~((cnt_below < k) & (k <= cnt_below + cnt_rtri)))
                   .astype(jnp.int32)
                   + 4 * (~((eps >= r_lo) & (eps <= r_hi))).astype(jnp.int32)
                   + 8 * sup_any.astype(jnp.int32)
                   + 16 * reg_ovf.astype(jnp.int32))
        diag_vec0 = jnp.stack([r_lo, r_hi, e_lo, e_hi,
                               cnt_rtri.astype(jnp.float32),
                               cand_rmax.astype(jnp.float32),
                               cand_rsum.astype(jnp.float32),
                               cand_gmax.astype(jnp.float32)])

        def adj_fast(_):
            # Every adjacency pair has fd <= eps <= r_hi, so it is a
            # compacted candidate (both triangles, diagonal included);
            # scatter their bits into a fresh stripe. Each (row, col)
            # appears in at most one slot, so scatter-ADD of distinct
            # bit values IS set union here.
            sel = live & (cand_fd <= eps)
            byte = jnp.where(sel, cand_col // 8, nbytes)  # nbytes: dropped
            val = jnp.where(
                sel, jnp.uint8(1) << (cand_col & 7).astype(jnp.uint8),
                jnp.uint8(0),
            )
            # Grouped layout: the destination row varies per slot (rows_loc)
            # — the scatter domain is (r//G, gcap), 4x fewer dead slots
            # than the per-row (r, cap) layout at G=8.
            return jnp.zeros((r, nbytes), jnp.uint8) \
                .at[rows_loc, byte].add(val, mode="drop")

        def adj_sweep(_):
            def adj_body(c, acc):
                fd = final_chunk(c)
                rows = row0_global + c * b + jnp.arange(b, dtype=jnp.int32)
                ok = (rows[:, None] < n) & col_valid[None, :]
                return jax.lax.dynamic_update_slice(
                    acc, pack_bits((fd <= eps) & ok), (c * b, 0)
                )

            return jax.lax.fori_loop(
                0, n_chunks, adj_body, jnp.zeros((r, nbytes), jnp.uint8)
            )

        with jax.named_scope("s_p4_adj"):
            adj_p = jax.lax.cond(adj_ok, adj_fast, adj_sweep, operand=None)
            # Symmetrize: bitwise OR on packed bytes IS set union.
            adj_p = adj_p | stripe_transpose_packed(adj_p)
        big = jnp.int32(npad)

        def degree_body(c, acc):
            blk = jax.lax.dynamic_slice(adj_p, (c * b, 0), (b, nbytes))
            d = jnp.sum(popcount(blk), axis=1, dtype=jnp.int32)
            return jax.lax.dynamic_update_slice(acc, d, (c * b,))

        with jax.named_scope("s_p4_degree"):
            degree = jax.lax.fori_loop(
                0, n_chunks, degree_body, jnp.zeros((r,), jnp.int32)
            )
        core_local = degree >= min_samples
        core = jax.lax.all_gather(core_local, "data", tiled=True)
        core_p = pack_bits(core)  # (nbytes,) column mask, packed
        gidx = row0_global + jnp.arange(r, dtype=jnp.int32)
        adj_core_p = jnp.where(core_local[:, None], adj_p & core_p[None, :],
                               jnp.uint8(0))
        labels = jax.lax.all_gather(
            jnp.where(core_local, gidx, big), "data", tiled=True
        )

        def propagate(labels):
            # Chunked neighbor-min: the masked (r, npad) int32 select would
            # be the largest transient of the whole pipeline at big N; a
            # (b, npad) rolling window keeps phase-4 memory at chunk scale.
            def nmin(c, acc):
                a = unpack_bits(
                    jax.lax.dynamic_slice(adj_core_p, (c * b, 0), (b, nbytes)),
                    npad,
                )
                m = jnp.min(jnp.where(a, labels[None, :], big), axis=1)
                return jax.lax.dynamic_update_slice(acc, m, (c * b,))

            neigh_min = jax.lax.fori_loop(
                0, n_chunks, nmin, jnp.full((r,), big, jnp.int32)
            )
            new_local = jnp.minimum(labels[gidx], neigh_min)
            new = jax.lax.all_gather(new_local, "data", tiled=True)

            # One pointer jump: lab[i] <- min(lab[i], lab[lab[i]]) — an
            # (npad,) gather that shortcuts label chains. The invariant (a
            # label is the index of a smaller core point in the same
            # component) is preserved, so the while fixpoint — the component
            # min — is unchanged. More jumps per round were measured a no-op
            # (round counts identical at 1 vs 4 jumps across clustered
            # configs, diag["dbscan_rounds"]): convergence here is gated by
            # new adjacency information per round, not by chain depth.
            hop = jnp.where(new < big, new, 0)
            return jnp.where(new < big,
                             jnp.minimum(new, jnp.take(new, hop)), new)

        start = jax.lax.pcast(jnp.bool_(True), ("data",), to="varying")

        def cond(state):
            return state[1]

        def body(state):
            labels, _, rounds = state
            new = propagate(labels)
            return new, jnp.any(new != labels), rounds + 1

        with jax.named_scope("s_p4_prop"):
            labels, _, db_rounds = jax.lax.while_loop(
                cond, body, (labels, start, jnp.int32(0)))

        def border_min(c, acc):
            a = unpack_bits(
                jax.lax.dynamic_slice(adj_p, (c * b, 0), (b, nbytes))
                & core_p[None, :],
                npad,
            )
            m = jnp.min(jnp.where(a, labels[None, :], big), axis=1)
            return jax.lax.dynamic_update_slice(acc, m, (c * b,))

        with jax.named_scope("s_p4_border"):
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
        diag_vec = jnp.concatenate(
            [diag_vec0, db_rounds.astype(jnp.float32)[None]])
        return (out.astype(jnp.int32), jnp.sum(is_root.astype(jnp.int32)),
                eps, band_fallback, fb_code, diag_vec, final_stripe)

    if n_groups:
        def grouped(f_locals):  # (G, r, D) -> per-group outputs, stacked
            return jax.lax.map(impl, f_locals)

        entry, in_spec = grouped, P(None, "data", None)
    else:
        entry, in_spec = impl, P("data", None)
    (labels, n_clusters, eps, band_fallback, fb_code, diag_vec,
     final) = jax.shard_map(
        entry, mesh=mesh, in_specs=in_spec,
        out_specs=(P(), P(), P(), P(), P(), P(),
                   P("data", None) if with_final else P()),
        check_vma=False,
    )(f)
    return labels, n_clusters, eps, band_fallback, fb_code, diag_vec, final


def _stripe_config(features, mesh, chunk, col_blocks):
    """Shared stripe geometry: row padding, column blocking under the 2 GiB
    buffer limit, chunk divisor fitting. Returns (f, n, npad, r, n_vblk, c).

    ``features`` may carry a leading group axis ((G, N, D) — the fused
    multi-group dispatch); rows are always axis -2.
    """
    import math

    p = mesh.shape["data"]
    n = features.shape[-2]
    # Rows pad to a multiple of lcm(base, 8p): the per-device stripe r must
    # divide by 8 for the bit-packed adjacency (ops/bits.py LSB-first bytes
    # + the packed ring transpose).
    base = p * chunk if n > p * chunk else p
    mult = math.lcm(base, 8 * p)
    npad_t = -(-n // mult) * mult

    def pad(x):
        x = x.astype(jnp.float32)
        cfg = [(0, 0)] * x.ndim
        cfg[-2] = (0, npad_t - n)
        return jnp.pad(x, cfg) if npad_t > n else x

    if isinstance(features, jax.Array) and not features.is_fully_addressable:
        # Process-spanning input (multi-host extract feeding clustering):
        # eager concatenation would mix a global array with local pad rows;
        # run the pad as one SPMD program instead.
        f = jax.jit(pad)(features)
    else:
        f = pad(jnp.asarray(features))
    npad = f.shape[-2]
    r = npad // p
    # Column-block V/rh so no single fp32 buffer exceeds ~1 GiB (XLA's hard
    # limit is 2 GiB per buffer).
    if col_blocks is not None:
        if npad % col_blocks:
            raise ValueError(f"col_blocks {col_blocks} must divide {npad}")
        n_vblk = col_blocks
    else:
        n_vblk = 1
        while r * (npad // n_vblk) * 4 > 2**30 and npad % (n_vblk * 2) == 0:
            n_vblk *= 2
    # Packed adjacency stripe (r x npad/8 bytes) and the (r, r) bool block
    # transient of the packed ring transpose are the remaining hard buffer
    # bounds (the bool chunk transients scale with `chunk`, not N).
    if r * npad // 8 > 2**31 or r * r > 2**31:
        raise ValueError(
            f"adjacency stripe ({r} x {npad} bits) or transpose block "
            f"({r} x {r} bool) exceeds the 2 GiB buffer limit; use a mesh "
            f"with more devices for N={n}."
        )
    # Chunk must divide the per-device stripe; shrink for tiny inputs.
    c = min(chunk, r)
    while r % c:
        c -= 1
    return f, n, npad, r, n_vblk, c


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
    col_blocks: int | None = None,
    return_final: bool = False,
    band_cap: int | None = None,
    support_cap: int = 128,
    eps_cap: int | None = None,
    diag: dict | None = None,
):
    """k-reciprocal re-rank + auto-eps DBSCAN without materializing the
    distance matrix: O(N^2/P) bool + ONE fp32 V stripe per chip.

    Returns (labels (N,) int32, n_clusters, eps) — matching
    re_ranking + cluster numerics (eps within fp32-histogram exactness).
    With ``return_final=True`` (debug/eval only: materializes the dense
    (N, N) re-ranked matrix!) a fourth element, the final distance matrix,
    is appended.

    ``band_cap`` is the per-row capacity for candidate pairs the screening
    bound cannot prune (fd_lb <= r_hi: every pair at or near the eps
    region); rows exceeding it trigger the exact-but-slower dedicated
    sweeps (labels are identical either way). The default (None) scales
    with N — candidates/row grow ~linearly (the eps quantile is a fixed
    fraction rho of N^2 pairs). ``band_cap=0`` disables the fused path
    entirely (always resweep). ``support_cap`` bounds the compacted-V row
    width; V rows with more nonzeros (k1-driven, ~54 mean / 110 max on
    real features) also force the exact fallback. Candidate slots of G=8
    adjacent rows re-compact into 2*band_cap grouped slots (exact
    group-count overflow check -> same fallback), cutting the exact
    S x S correction ~4x. ``eps_cap`` (default: grouped cap/8, >= 64)
    bounds the second compaction that narrows the eps histograms to the
    live region pairs (~16/row); overflow downgrades the eps computation
    ONLY (exact two-sweep recompute) — the adjacency fast path stays
    engaged. Pass ``diag`` (a dict) to receive
    ``{"band_fallback": bool, "fallback_code": int, ...}`` for perf
    attribution.
    """
    from ssg_tpu.parallel.multihost import global_put

    f, n, npad, r, n_vblk, c = _stripe_config(features, mesh, chunk,
                                              col_blocks)
    k1 = min(int(k1), n - 1)
    k2 = min(int(k2), n - 1)
    if band_cap is None:
        # ~0.017*N measured max candidates/row on real features with the
        # one-directional bound; 2x headroom, 64-lane aligned.
        band_cap = max(256, round_up(npad // 30, 64))
    (labels, n_clusters, eps, band_fallback, fb_code, diag_vec,
     final) = _streaming_impl(
        global_put(mesh, f, P("data", None)),
        global_put(mesh, np.int32(n), P()),
        global_put(mesh, np.float32(rho), P()),
        mesh, k1, k2, float(lambda_value),
        int(min_samples), int(c), l1_impl, n_vblk=n_vblk,
        with_final=return_final, band_cap=int(band_cap),
        support_cap=int(support_cap),
        eps_cap=None if eps_cap is None else int(eps_cap),
    )
    if diag is not None:
        diag["band_fallback"] = bool(band_fallback)
        diag["fallback_code"] = int(fb_code)  # 1 ovf | 2 kth-out | 4 eps-out
        dv = np.asarray(diag_vec)
        diag["r_lo"], diag["r_hi"] = float(dv[0]), float(dv[1])
        diag["e_lo"], diag["e_hi"] = float(dv[2]), float(dv[3])
        diag["region_tri_pairs"] = int(dv[4])
        diag["cand_row_max"] = int(dv[5])
        diag["cand_total"] = int(dv[6])
        diag["cand_group_max"] = int(dv[7])
        diag["dbscan_rounds"] = int(dv[8])
    if return_final:
        return labels[:n], n_clusters, eps, final[:n, :n]
    return labels[:n], n_clusters, eps


def streaming_cluster_groups(
    features,
    mesh: Mesh,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.1,
    rho: float = 1.6e-3,
    min_samples: int = 4,
    chunk: int = 512,
    l1_impl: str = "auto",
    col_blocks: int | None = None,
    band_cap: int | None = None,
    support_cap: int = 128,
    eps_cap: int | None = None,
    diag: dict | None = None,
):
    """``streaming_cluster`` for all feature groups in ONE device program.

    ``features``: (G, N, D) array (or list of (N, D)) — the SSG whole/
    upper/lower embeddings. The per-group pipeline runs under a single
    lax.map inside one shard_map program, so the SSG iteration pays one
    dispatch for all groups instead of G (the dense path fuses its groups
    in ``api.cluster_groups`` for the same reason — SURVEY.md §3.1).
    Per-group results are bit-identical to G separate ``streaming_cluster``
    calls (same per-group program, same data).

    Returns (labels (G, N) np-convertible, counts list[int], eps list
    [float]). ``diag`` (optional dict) receives per-group arrays.
    """
    from ssg_tpu.parallel.multihost import global_put

    if not isinstance(features, jax.Array):
        features = jnp.stack([jnp.asarray(f) for f in features])
    f, n, npad, r, n_vblk, c = _stripe_config(features, mesh, chunk,
                                              col_blocks)
    g = f.shape[0]
    k1 = min(int(k1), n - 1)
    k2 = min(int(k2), n - 1)
    if band_cap is None:
        band_cap = max(256, round_up(npad // 30, 64))
    (labels, n_clusters, eps, band_fallback, fb_code, diag_vec,
     _) = _streaming_impl(
        global_put(mesh, f, P(None, "data", None)),
        global_put(mesh, np.int32(n), P()),
        global_put(mesh, np.float32(rho), P()),
        mesh, k1, k2, float(lambda_value),
        int(min_samples), int(c), l1_impl, n_vblk=n_vblk,
        band_cap=int(band_cap), support_cap=int(support_cap),
        eps_cap=None if eps_cap is None else int(eps_cap),
        n_groups=g,
    )
    if diag is not None:
        diag["band_fallback"] = [bool(x) for x in np.asarray(band_fallback)]
        diag["fallback_code"] = [int(x) for x in np.asarray(fb_code)]
        diag["diag_vec"] = np.asarray(diag_vec)
    return (labels[:, :n], [int(x) for x in np.asarray(n_clusters)],
            [float(x) for x in np.asarray(eps)])


@functools.partial(
    jax.jit,
    static_argnames=("nqc", "mesh", "k1", "k2", "lambda_value", "chunk",
                     "l1_impl", "n_vblk"),
)
def _rerank_eval_impl(f, valid, row_qid, row_qcam, row_qmask,
                      col_gid, col_gcam, col_gmask, nqc, mesh,
                      k1, k2, lambda_value, chunk, l1_impl, n_vblk):
    from ssg_tpu.ops.metrics import rank_stats_auto

    p = mesh.shape["data"]
    npad = f.shape[0]
    r = npad // p
    b = chunk
    n_chunks = r // b

    l1_tile = _l1_pallas if l1_impl == "pallas" or (
        l1_impl == "auto" and on_tpu()) else _l1_xla

    def impl(f_local, valid, row_qid, row_qcam, row_qmask,
             col_gid, col_gcam, col_gmask):
        final_chunk, _, _, _, row0_global, _, _, _, _ = _phases12(
            f_local, 0, k1, k2, lambda_value, b, n_chunks, n_vblk, l1_tile,
            valid_global=valid,
        )

        def sweep(c, carry):
            ap_sum, cmc_sum, n_valid = carry
            with jax.named_scope("s_e_fd"):
                fd = final_chunk(c)  # (b, npad) re-ranked distances
            rows = row0_global + c * b + jnp.arange(b, dtype=jnp.int32)
            # Full stripe rows: gallery/query/pad columns interleave; the
            # col mask excludes non-gallery columns from the protocol's
            # valid sublist exactly (their distances never matter).
            # rank_stats_auto: sort-free compare-count ranks (the argsort
            # path cost 5.6 s/chunk at MSMT scale — 8× the whole fd
            # compute), exact argsort fallback if a row carries > hit_cap
            # relevant columns.
            with jax.named_scope("s_e_rank"):
                a, cm, v = rank_stats_auto(
                    fd, jnp.take(row_qid, rows), col_gid,
                    jnp.take(row_qcam, rows), col_gcam,
                    jnp.take(row_qmask, rows), col_gmask,
                )
            return ap_sum + a, cmc_sum + cm, n_valid + v

        # Query rows occupy each shard's first qr local rows (interleaved
        # layout built by the host wrapper) — the re-ranked sweep touches
        # ONLY those nqc chunks (mesh-uniform static count, so the ring
        # collectives inside final_chunk stay aligned), cutting the
        # dominant dense L1+GEMM phase by ~N/nq vs sweeping the stripe.
        ap, cmc, nv = jax.lax.fori_loop(
            0, nqc, sweep,
            (jnp.float32(0.0), jnp.zeros((100,), jnp.float32), jnp.int32(0)),
        )
        return (jax.lax.psum(ap, "data"), jax.lax.psum(cmc, "data"),
                jax.lax.psum(nv, "data"))

    return jax.shard_map(
        impl, mesh=mesh,
        in_specs=(P("data", None), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(f, valid, row_qid, row_qcam, row_qmask, col_gid, col_gcam, col_gmask)


def streaming_rerank_eval(
    query_features: jax.Array,
    gallery_features: jax.Array,
    mesh: Mesh,
    q_ids,
    g_ids,
    q_cams,
    g_cams,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.1,
    chunk: int = 512,
    l1_impl: str = "auto",
    col_blocks: int | None = None,
):
    """Test-time k-reciprocal re-ranked evaluation at streaming scale
    (SURVEY.md §3.5 "optionally with re-ranking"; VERDICT r1 missing #3).

    Neither the (N, N) re-ranked matrix nor the (Q, G) block is ever
    materialized: phases 1-2 build the V stripes exactly as
    ``streaming_cluster``, then one sweep reduces chunks of re-ranked
    query rows directly into additive CMC/mAP statistics on device
    (ops/metrics.rank_stats_masked) — the market1501 protocol of
    ``api.evaluate_all``, numerically equal to evaluating the dense
    ``re_ranking(concat(qf, gf))[:nq, nq:]`` matrix (re-ranked distances
    are row-permutation-equivariant; summation-order ulps only).

    Layout: query and gallery rows INTERLEAVE across shards — each shard's
    stripe holds ceil(nq/P) query rows first, then its gallery slice — so
    the final re-ranked sweep (dense L1 + distance GEMM, the dominant
    phase) visits only the query chunks: nq/N of the stripe, the same
    static chunk count on every shard (the ring collectives inside the
    sweep require a mesh-uniform trip count).

    Returns (mAP, cmc (100,), n_valid_queries).
    """
    import math

    from ssg_tpu.parallel.multihost import global_put

    spmd = (isinstance(query_features, jax.Array)
            and not query_features.is_fully_addressable)
    # Single-process inputs take the device-side permutation too: the
    # features usually already live on device (extract -> eval), and the
    # old host path (np.asarray pull + global_put push) cost a ~2(nq+ng)·d
    # fp32 tunnel round-trip — measured 9+ s against 1.24 s of device
    # compute at Market scale (logs/perf_r5/rerank_trace.log). Only the
    # multi-host replicated-numpy case still needs global_put (each
    # process holds the full array; the permutation must place shards).
    on_device = spmd or jax.process_count() == 1
    if spmd:
        qf, gf = query_features, gallery_features
    elif on_device:
        # Keep device arrays on device; lift host input to numpy f32
        # (one tunnel upload inside the build jit, same as global_put).
        qf = query_features if isinstance(query_features, jax.Array) \
            else np.asarray(query_features, np.float32)
        gf = gallery_features if isinstance(gallery_features, jax.Array) \
            else np.asarray(gallery_features, np.float32)
    else:
        qf = np.asarray(query_features, np.float32)
        gf = np.asarray(gallery_features, np.float32)
    nq, ng, d = qf.shape[0], gf.shape[0], qf.shape[1]
    n = nq + ng
    p = mesh.shape["data"]
    qr = -(-nq // p)  # query slots per shard
    gr = -(-ng // p)  # gallery slots per shard
    base = p * chunk if n > p * chunk else p
    mult = math.lcm(base, 8 * p)
    npad = -(-(p * (qr + gr)) // mult) * mult
    r = npad // p
    c = min(chunk, r)
    while r % c:
        c -= 1
    if col_blocks is not None:
        if npad % col_blocks:
            raise ValueError(f"col_blocks {col_blocks} must divide {npad}")
        n_vblk = col_blocks
    else:
        n_vblk = 1
        while r * (npad // n_vblk) * 4 > 2**30 and npad % (n_vblk * 2) == 0:
            n_vblk *= 2

    # src[i] = row of concat(qf, gf) placed at layout slot i (-1 = pad).
    src = np.full((npad,), -1, np.int64)
    valid = np.zeros((npad,), bool)
    row_qid = np.zeros((npad,), np.int32)
    row_qcam = np.zeros((npad,), np.int32)
    row_qmask = np.zeros((npad,), bool)
    col_gid = np.zeros((npad,), np.int32)
    col_gcam = np.zeros((npad,), np.int32)
    col_gmask = np.zeros((npad,), bool)
    q_ids = np.asarray(q_ids, np.int32)
    q_cams = np.asarray(q_cams, np.int32)
    g_ids = np.asarray(g_ids, np.int32)
    g_cams = np.asarray(g_cams, np.int32)
    for me in range(p):
        lo = me * r
        q0, q1 = me * qr, min((me + 1) * qr, nq)
        m = max(q1 - q0, 0)
        if m:
            src[lo:lo + m] = np.arange(q0, q1)
            valid[lo:lo + m] = True
            row_qmask[lo:lo + m] = True
            row_qid[lo:lo + m] = q_ids[q0:q1]
            row_qcam[lo:lo + m] = q_cams[q0:q1]
        g0, g1 = me * gr, min((me + 1) * gr, ng)
        m = max(g1 - g0, 0)
        if m:
            src[lo + qr:lo + qr + m] = nq + np.arange(g0, g1)
            valid[lo + qr:lo + qr + m] = True
            col_gmask[lo + qr:lo + qr + m] = True
            col_gid[lo + qr:lo + qr + m] = g_ids[g0:g1]
            col_gcam[lo + qr:lo + qr + m] = g_cams[g0:g1]

    if on_device:
        # Process-spanning inputs (multi-host extract feeding eval) and
        # all single-process inputs: the permutation runs as one SPMD
        # program on device — eager numpy fills cannot read global
        # arrays, and pulling device arrays to host pays the tunnel both
        # ways. Pad slots gather a zero row.
        idx = np.where(src < 0, n, src)

        @functools.partial(jax.jit, out_shardings=jax.NamedSharding(
            mesh, P("data", None)))
        def build(q, g):
            allf = jnp.concatenate(
                [q.astype(jnp.float32), g.astype(jnp.float32),
                 jnp.zeros((1, d), jnp.float32)], axis=0)
            return jnp.take(allf, jnp.asarray(idx), axis=0)

        f_placed = build(qf, gf)
    else:
        f = np.zeros((npad, d), np.float32)
        live = src >= 0
        f[live] = np.concatenate([qf, gf], axis=0)[src[live]]
        f_placed = global_put(mesh, f, P("data", None))

    k1 = min(int(k1), n - 1)
    k2 = min(int(k2), n - 1)
    nqc = -(-qr // c)  # query chunks per shard (static, mesh-uniform)
    rep = lambda x: global_put(mesh, x, P())  # noqa: E731
    ap, cmc, nv = _rerank_eval_impl(
        f_placed, rep(valid),
        rep(row_qid), rep(row_qcam), rep(row_qmask),
        rep(col_gid), rep(col_gcam), rep(col_gmask),
        nqc, mesh, k1, k2, float(lambda_value), int(c), l1_impl, n_vblk,
    )
    denom = max(int(nv), 1)
    return float(ap) / denom, np.asarray(cmc) / denom, int(nv)
