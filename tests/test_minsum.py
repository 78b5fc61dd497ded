"""ops/minsum.py: exact compacted min-sum + sound screening bound."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssg_tpu.ops.minsum import (compact_rows, fd_lower, minsum_upper,
                                sparse_minsum, support_mask)


def _sparse_rows(rng, b, n, max_supp):
    """Random nonnegative rows with bounded support, row sums ~1."""
    v = np.zeros((b, n), np.float32)
    for i in range(b):
        k = rng.integers(1, max_supp + 1)
        idx = rng.choice(n, size=k, replace=False)
        w = rng.random(k).astype(np.float32) + 1e-3
        v[i, idx] = w / w.sum()
    return v


def test_compact_rows_captures_all_nonzeros():
    rng = np.random.default_rng(0)
    v = _sparse_rows(rng, 16, 200, 12)
    idx, val = compact_rows(jnp.asarray(v), 16)
    idx, val = np.asarray(idx), np.asarray(val)
    for i in range(16):
        got = {(j, x) for j, x in zip(idx[i], val[i]) if x > 0}
        want = {(j, v[i, j]) for j in np.nonzero(v[i])[0]}
        assert got == want


def test_sparse_minsum_matches_dense():
    rng = np.random.default_rng(1)
    b, n, s, q = 8, 160, 16, 6
    v = _sparse_rows(rng, b, n, s)
    w = _sparse_rows(rng, b * q, n, s)  # candidate rows
    cols = rng.integers(0, b * q, size=(b, q))
    ci, cv = compact_rows(jnp.asarray(v), s)
    wj, wv = compact_rows(jnp.asarray(w), s)
    cj = jnp.take(wj, jnp.asarray(cols), axis=0)
    vj = jnp.take(wv, jnp.asarray(cols), axis=0)
    got = np.asarray(sparse_minsum(ci, cv, cj, vj, qblock=4))
    want = np.minimum(v[:, None, :], w[cols]).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_sparse_minsum_ragged_qblock():
    rng = np.random.default_rng(2)
    v = _sparse_rows(rng, 4, 64, 8)
    ci, cv = compact_rows(jnp.asarray(v), 8)
    cols = rng.integers(0, 4, size=(4, 7))  # q=7 is prime: qblock falls to 1
    cj = jnp.take(ci, jnp.asarray(cols), axis=0)
    vj = jnp.take(cv, jnp.asarray(cols), axis=0)
    got = np.asarray(sparse_minsum(ci, cv, cj, vj, qblock=4))
    want = np.minimum(v[:, None, :], v[cols]).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_bound_is_sound_in_fp():
    """fd_lower(minsum_upper(bf16 mask-GEMM)) <= true fd for every pair,
    including near-duplicate rows where ms ~ 1 and jaccard can go slightly
    negative in fp (the reason the clamp lives at the fd level)."""
    rng = np.random.default_rng(3)
    n, d = 96, 300
    v = _sparse_rows(rng, n, d, 20)
    # adversarial: exact duplicates and near-duplicates stress ms ~ 1
    v[1] = v[0]
    v[3] = v[2] * (1 + 1e-7)
    vj = jnp.asarray(v)
    orig = jnp.asarray(rng.random((n, n)).astype(np.float32))
    lam = 0.1

    g = jnp.dot(support_mask(vj), vj.T.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    fd_lb = np.asarray(fd_lower(minsum_upper(g), orig, lam))

    ms = np.minimum(v[:, None, :], v[None, :, :]).sum(-1, dtype=np.float32)
    jac = 1.0 - ms / (2.0 - ms)
    fd = np.maximum(jac * (1 - lam) + np.asarray(orig) * lam, 0.0)
    assert (fd_lb <= fd + 1e-12).all(), (fd_lb - fd).max()


def test_bound_is_usefully_tight():
    """On clustered data the screen must prune the vast majority of pairs
    at a realistic radius (this is the whole point of the design)."""
    rng = np.random.default_rng(4)
    n = 128
    v = _sparse_rows(rng, n, 512, 16)
    lam = 0.1
    orig = jnp.asarray(rng.random((n, n)).astype(np.float32) * 0.5 + 0.5)
    g = jnp.dot(support_mask(jnp.asarray(v)),
                jnp.asarray(v).T.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    fd_lb = np.asarray(fd_lower(minsum_upper(g), orig, lam))
    # random sparse rows rarely overlap: nearly everything sits near
    # jac ~ 1, so a mid-range radius prunes nearly all pairs
    assert (fd_lb > 0.6).mean() > 0.9


def test_sparse_minsum_pairs_matches_dense():
    """Per-slot row tables (the grouped main sweep's layout) agree with the
    dense min-sum for arbitrary (row, col) slot assignments."""
    from ssg_tpu.ops.minsum import sparse_minsum_pairs

    rng = np.random.default_rng(3)
    b, n, s, q = 6, 120, 12, 8
    v = _sparse_rows(rng, 32, n, s)
    rows = rng.integers(0, 32, size=(b, q))
    cols = rng.integers(0, 32, size=(b, q))
    ti, tv = compact_rows(jnp.asarray(v), s)
    ci = jnp.take(ti, jnp.asarray(rows), axis=0)
    cv = jnp.take(tv, jnp.asarray(rows), axis=0)
    cj = jnp.take(ti, jnp.asarray(cols), axis=0)
    vj = jnp.take(tv, jnp.asarray(cols), axis=0)
    got = np.asarray(sparse_minsum_pairs(ci, cv, cj, vj, qblock=4))
    want = np.minimum(v[rows], v[cols]).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_sparse_minsum_pairs_ragged_qblock():
    from ssg_tpu.ops.minsum import sparse_minsum_pairs

    rng = np.random.default_rng(4)
    v = _sparse_rows(rng, 10, 50, 6)
    rows = rng.integers(0, 10, size=(3, 5))  # q=5 prime: qblock falls to 1
    cols = rng.integers(0, 10, size=(3, 5))
    ti, tv = compact_rows(jnp.asarray(v), 6)
    got = np.asarray(sparse_minsum_pairs(
        jnp.take(ti, jnp.asarray(rows), axis=0),
        jnp.take(tv, jnp.asarray(rows), axis=0),
        jnp.take(ti, jnp.asarray(cols), axis=0),
        jnp.take(tv, jnp.asarray(cols), axis=0), qblock=4))
    want = np.minimum(v[rows], v[cols]).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
