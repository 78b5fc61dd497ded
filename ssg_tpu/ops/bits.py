"""Bit-packing utilities for boolean adjacency state.

DBSCAN's persistent per-chip state in the streaming pipeline is a boolean
adjacency stripe (r, N); packing 8 columns per uint8 byte shrinks it 8x,
raising the single-chip N ceiling accordingly (VERDICT r1 weak #2 /
ROADMAP "bit-packed adjacency"). Consumers unpack fixed-size row chunks on
the fly, so peak bool memory stays at chunk scale. LSB-first bit order
throughout. All functions are traceable (usable inside jit/shard_map).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# numpy at module scope (no backend touch at import time); jnp lifts these
# to on-device constants inside traced functions.
_WEIGHTS = np.asarray([1, 2, 4, 8, 16, 32, 64, 128], np.uint8)


def pack_bits(x: jax.Array) -> jax.Array:
    """(..., C) bool -> (..., C//8) uint8, LSB-first. C must divide by 8."""
    c = x.shape[-1]
    xr = x.reshape(*x.shape[:-1], c // 8, 8)
    return jnp.sum(xr.astype(jnp.uint8) * jnp.asarray(_WEIGHTS),
                   axis=-1, dtype=jnp.uint8)


def unpack_bits(x: jax.Array, cols: int) -> jax.Array:
    """(..., C//8) uint8 -> (..., C) bool, inverse of pack_bits."""
    bits = (x[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
    return bits.reshape(*x.shape[:-1], cols).astype(bool)


def popcount(x: jax.Array) -> jax.Array:
    """Per-byte set-bit count, uint8 -> int32 (branch-free SWAR).

    The obvious 256-entry table lookup is a GATHER, and TPU gathers
    serialize at ~8-9 ns/element — measured 0.276 s for one pass over the
    N=16,384 adjacency stripe (33.5 MB), which made the DBSCAN degree scan
    the second-largest phase of the whole streaming pipeline. Three uint8
    shift/mask/add steps are pure VPU vector work for the same counts.
    """
    x = x.astype(jnp.uint8)
    v = x - ((x >> 1) & jnp.uint8(0x55))
    v = (v & jnp.uint8(0x33)) + ((v >> 2) & jnp.uint8(0x33))
    v = (v + (v >> 4)) & jnp.uint8(0x0F)
    return v.astype(jnp.int32)
