"""All-pairs (squared) Euclidean distance on TPU.

Replaces the reference's host-side distance computations: the torch GEMM in
``pairwise_distance`` [reid/evaluators.py] and the numpy preamble of
[reid/rerank.py] (SURVEY.md §2 #6, #10).

Two implementations with identical semantics:

* ``_pairwise_xla`` — the expanded-GEMM form ``|x|^2 + |y|^2 - 2 x y^T``.
  XLA maps the GEMM straight onto the MXU and fuses the rank-1 norm adds;
  for most shapes this is already speed-of-light (the op is GEMM-bound).
* ``_pairwise_pallas`` — a tiled Pallas kernel (grid over M x N tiles,
  K-blocked accumulation in fp32) that keeps the distance tiles in VMEM and
  fuses norm computation into the tile epilogue. Used as the building block
  for kernels that consume distance *tiles* without materializing the full
  matrix (eps selection, sharded re-ranking).

``preferred_element_type=float32`` everywhere: distances drive clustering
decisions and must not accumulate in bf16 (SURVEY.md §7 hard part f).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssg_tpu.ops._compat import cdiv, on_tpu, round_up


def _pairwise_xla(x: jax.Array, y: jax.Array, squared: bool) -> jax.Array:
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    y2 = jnp.sum(y * y, axis=1, keepdims=True).T
    # HIGHEST: distances drive clustering decisions; the default TPU matmul
    # precision (bf16 MXU passes) is not parity-safe (SURVEY.md §7f).
    d = x2 + y2 - 2.0 * jnp.dot(
        x, y.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = jnp.maximum(d, 0.0)
    return d if squared else jnp.sqrt(d)


def _dist_kernel(x_ref, y_ref, out_ref, acc_ref, *, squared: bool, k_steps: int):
    """One (TM, TN) distance tile; K-blocked GEMM accumulation in fp32."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xb = x_ref[:]  # (TM, TK)
    yb = y_ref[:]  # (TN, TK)
    # Accumulate the three GEMM-shaped terms: -2 x.y^T + |x|^2 + |y|^2.
    acc_ref[:] += (
        -2.0
        * jnp.dot(
            xb,
            yb.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        + jnp.sum(xb * xb, axis=1, keepdims=True)
        + jnp.sum(yb * yb, axis=1, keepdims=True).T
    )

    @pl.when(k == k_steps - 1)
    def _():
        d = jnp.maximum(acc_ref[:], 0.0)
        out_ref[:] = d if squared else jnp.sqrt(d)


def _pairwise_pallas(
    x: jax.Array,
    y: jax.Array,
    squared: bool,
    tm: int = 256,
    tn: int = 256,
    # None: single K step when the row pair fits VMEM — same finding as
    # ops/l1.py round 2 (K-grid revolutions re-fetch the accumulator
    # tile): 2.01 -> 1.72 ms at (3368, 2048) on v5e.
    tk: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    m, d = x.shape
    n, _ = y.shape
    if tk is None:
        dp_full = round_up(d, 512)
        fits = (tm + tn) * dp_full * 4 * 2 + tm * tn * 8 <= 12 * 1024 * 1024
        tk = dp_full if fits else 512
    mp, np_, dp = round_up(m, tm), round_up(n, tn), round_up(d, tk)
    # Zero padding in K adds 0 to every term; padded rows are sliced off.
    xpad = jnp.zeros((mp, dp), jnp.float32).at[:m, :d].set(x.astype(jnp.float32))
    ypad = jnp.zeros((np_, dp), jnp.float32).at[:n, :d].set(y.astype(jnp.float32))
    k_steps = dp // tk
    grid = (mp // tm, np_ // tn, k_steps)
    out = pl.pallas_call(
        functools.partial(_dist_kernel, squared=squared, k_steps=k_steps),
        grid=grid,
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


def pairwise_distance(
    x: jax.Array,
    y: jax.Array | None = None,
    squared: bool = True,
    impl: str = "auto",
) -> jax.Array:
    """All-pairs (squared) Euclidean distance, fp32.

    Args:
      x: (N, D) features.
      y: (M, D) features; defaults to x (the symmetric case SSG clusters on).
      squared: return squared distances (default — what re-ranking consumes).
      impl: 'auto' | 'xla' | 'pallas'. 'auto' picks XLA (GEMM-bound op; the
        Pallas path exists for fusion into tile-streaming consumers).
    """
    if y is None:
        y = x
    if impl == "pallas":
        return _pairwise_pallas(x, y, squared, interpret=not on_tpu())
    return _pairwise_xla(x, y, squared)
