"""On-device eps auto-selection (SSG's rho-quantile rule).

The reference ([selftraining.py], SURVEY.md §3.1) sorts all nonzero
upper-triangle distances on host and averages the smallest ``round(rho * M)``
of them — an O(N^2 log N^2) host sort that dominates wall-clock at MSMT17
scale. Here the same value is computed on device without any sort:

  1. binary-search the k-th smallest value over IEEE-754 bit patterns
     (non-negative floats compare identically as signed ints), using only
     O(N^2) masked counts per step (31 steps);
  2. mean = (sum of values strictly below the k-th + the tie mass) / k.

This matches ``sorted[:k].mean()`` including ties, works on distance *tiles*
(only reductions touch the matrix — the basis for the sharded variant in
ssg_tpu.parallel), and never materializes a sorted copy.

Precision notes (x64 is disabled in this environment): counts are int32
(valid while M = #upper-triangle entries < 2^31, i.e. N <= 46k — larger N
uses the sharded path); ``rho * M`` is computed in fp32, exact while
M < 2^24 and within ±1 count beyond that (negligible for a mean over k
values).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def _kth_smallest_bits(x_bits: jax.Array, valid: jax.Array, k: jax.Array) -> jax.Array:
    """Bit pattern of the k-th smallest (1-indexed) valid value.

    Values are non-negative fp32, so their int32 bit patterns are
    non-negative and order-isomorphic to the float order.
    """

    def body(_, lo_hi):
        lo, hi = lo_hi
        mid = lo + (hi - lo) // 2  # overflow-safe midpoint
        cnt = jnp.sum((valid & (x_bits <= mid)).astype(jnp.int32))
        take_low = cnt >= k
        return jnp.where(take_low, lo, mid + 1), jnp.where(take_low, mid, hi)

    lo = jnp.int32(0)
    hi = jnp.int32(0x7F7FFFFF)  # max finite fp32
    _, hi = jax.lax.fori_loop(0, 31, body, (lo, hi))
    return hi


@jax.jit
def select_eps(dist: jax.Array, rho: jax.Array | float = 1.6e-3) -> jax.Array:
    """Exact on-device equivalent of the oracle's ``select_eps_np``.

    Mean of the smallest ``round(rho * M)`` of the M nonzero upper-triangle
    entries of ``dist``. Returns a scalar fp32 (traced — usable inside jit).
    ``rho`` is traced (per-iteration rho scheduling must not recompile).
    """
    n = dist.shape[0]
    if n * (n - 1) // 2 >= 2**31:
        # int32 counts silently wrap past this; the streaming path
        # (parallel/streaming.py) owns larger N with per-shard counts.
        raise ValueError(
            f"select_eps int32 count bound exceeded at N={n} (max ~46k); "
            "use parallel.streaming_cluster for larger N"
        )
    d = dist.astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    valid = (cols > rows) & (d != 0.0)

    m = jnp.sum(valid.astype(jnp.int32))
    # numpy.round rounds half-to-even; jnp.round matches.
    k = jnp.round(rho * m.astype(jnp.float32)).astype(jnp.int32)
    k = jnp.maximum(k, 1)

    bits = jax.lax.bitcast_convert_type(d, jnp.int32)
    kth_bits = _kth_smallest_bits(bits, valid, k)
    kth = jax.lax.bitcast_convert_type(kth_bits, jnp.float32)

    below = valid & (d < kth)
    cnt_below = jnp.sum(below.astype(jnp.int32))
    sum_below = jnp.sum(jnp.where(below, d, 0.0))
    total = sum_below + (k - cnt_below).astype(jnp.float32) * kth
    return total / k.astype(jnp.float32)
