"""Bit-packing utilities (ops/bits.py) + the packed ring transpose."""

import numpy as np

import jax.numpy as jnp

from ssg_tpu.ops.bits import pack_bits, popcount, unpack_bits


def test_pack_unpack_roundtrip(rng):
    x = rng.random((5, 64)) < 0.3
    packed = pack_bits(jnp.asarray(x))
    assert packed.shape == (5, 8) and packed.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(unpack_bits(packed, 64)), x)


def test_pack_matches_numpy_packbits(rng):
    x = rng.random((3, 40)) < 0.5
    want = np.packbits(x, axis=-1, bitorder="little")
    np.testing.assert_array_equal(np.asarray(pack_bits(jnp.asarray(x))), want)


def test_popcount(rng):
    vals = rng.integers(0, 256, (17,), dtype=np.uint8)
    want = np.asarray([bin(v).count("1") for v in vals])
    np.testing.assert_array_equal(np.asarray(popcount(jnp.asarray(vals))), want)


def test_stripe_transpose_packed_matches_bool(rng):
    import jax
    from jax.sharding import PartitionSpec as P

    from ssg_tpu.parallel import make_mesh
    from ssg_tpu.parallel.ring import stripe_transpose, stripe_transpose_packed

    mesh = make_mesh(8)
    n = 8 * 16  # r = 16 (multiple of 8)
    a = rng.random((n, n)) < 0.2

    def packed_t(x_local):
        return stripe_transpose_packed(pack_bits(x_local))

    got_p = jax.jit(jax.shard_map(
        packed_t, mesh=mesh, in_specs=P("data", None),
        out_specs=P("data", None), check_vma=False,
    ))(jnp.asarray(a))
    np.testing.assert_array_equal(
        np.asarray(unpack_bits(got_p, n)), a.T
    )
