"""Tiled all-pairs L1 (Manhattan) distance — the Jaccard workhorse.

The k-reciprocal Jaccard distance reduces to an L1 distance matrix over the
sparse encoding V (see ops/rerank.py): with row sums S,

    sum_k min(V_i_k, V_j_k) = (S_i + S_j - ||V_i - V_j||_1) / 2.

The reference computes this with a Python loop over inverted-index lists
([reid/rerank.py], SURVEY.md §3.3 — the #1 CPU hot spot). Here it is one
Pallas kernel: grid over (M-tile, N-tile, K-block), fp32 accumulation of
|a - b| partial sums in VMEM. Elementwise VPU work, HBM-bandwidth bound;
zero K-padding is exact (|0 - 0| = 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssg_tpu.ops._compat import on_tpu, round_up


def _l1_kernel(x_ref, y_ref, out_ref, acc_ref, *, k_steps: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = x_ref[:]  # (TM, TK)
    b = y_ref[:]  # (TN, TK)
    acc_ref[:] += jnp.sum(jnp.abs(a[:, None, :] - b[None, :, :]), axis=-1)

    @pl.when(k == k_steps - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _l1_pallas(
    x: jax.Array,
    y: jax.Array,
    # Tiles swept on v5e at N=3368 (scripts/perf_l1.py): (128,128,256) runs
    # 19x faster than the naive (64,128,128) — Mosaic vectorizes the K sweep
    # without materializing the full (tm,tn,tk) broadcast. Round-2 re-sweep:
    # a SINGLE K step (tk = whole padded row) is another 1.7x (39.4 ->
    # 22.7 ms at N=3368; 7.9 -> 4.7 at N=2000) — the K-grid revolutions
    # were re-fetching the accumulator tile; one step keeps it live. Used
    # whenever the row pair fits VMEM: dp <= 4096 (~8.7 MB of the 16 MB
    # scoped limit; dp = 6144 measured 20.09M inside the streaming program
    # — Mosaic's scoped accounting exceeds the naive 2x-double-buffer
    # estimate, so stay at half the limit); larger rows fall back to
    # tk=2048 blocks.
    tm: int = 128,
    tn: int = 128,
    tk: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    m, d = x.shape
    n, _ = y.shape
    if tk is None:
        dp_full = round_up(d, 512)
        tk = dp_full if dp_full <= 4096 else 2048
    mp, np_, dp = round_up(m, tm), round_up(n, tn), round_up(d, tk)
    xpad = jnp.zeros((mp, dp), jnp.float32).at[:m, :d].set(x.astype(jnp.float32))
    ypad = jnp.zeros((np_, dp), jnp.float32).at[:n, :d].set(y.astype(jnp.float32))
    k_steps = dp // tk
    out = pl.pallas_call(
        functools.partial(_l1_kernel, k_steps=k_steps),
        grid=(mp // tm, np_ // tn, k_steps),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tk), lambda i, j, k: (j, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        interpret=interpret,
    )(xpad, ypad)
    return out[:m, :n]


def _l1_xla(x: jax.Array, y: jax.Array, row_chunk: int = 64) -> jax.Array:
    """Row-chunked XLA fallback (CPU tests / tiny inputs)."""
    m, d = x.shape
    mp = round_up(m, row_chunk)
    xpad = jnp.zeros((mp, d), jnp.float32).at[:m].set(x.astype(jnp.float32))
    y = y.astype(jnp.float32)

    def chunk(xc):
        return jnp.sum(jnp.abs(xc[:, None, :] - y[None, :, :]), axis=-1)

    out = jax.lax.map(chunk, xpad.reshape(mp // row_chunk, row_chunk, d))
    return out.reshape(mp, y.shape[0])[:m]


def l1_distance(x: jax.Array, y: jax.Array | None = None, impl: str = "auto") -> jax.Array:
    """All-pairs L1 distance, fp32. impl: 'auto' | 'xla' | 'pallas'."""
    if y is None:
        y = x
    if impl == "xla" or (impl == "auto" and not on_tpu()):
        return _l1_xla(x, y)
    return _l1_pallas(x, y, interpret=not on_tpu())
