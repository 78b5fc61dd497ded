"""Property tests for the blocked exact min-k (ops/topk.py).

The TPU fast path (block-min prefilter + two narrow selections) must be
an EXACT top-k: same value multiset as a full sort, sorted ascending,
indices pointing at elements carrying those values — including under
heavy value ties and +inf padding (the compaction call sites select
"every finite element" and check counts separately). ``_blocked_min_k``
is backend-neutral, so the CPU test mesh exercises the same algorithm
the TPU runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssg_tpu.ops.topk import _BLK, _blocked_min_k, exact_max_k, exact_min_k


def _check_exact(key_np, vals, idx, k):
    vals, idx = np.asarray(vals), np.asarray(idx)
    for r in range(key_np.shape[0]):
        want = np.sort(key_np[r])[:k]
        got = np.asarray(vals[r])
        assert np.array_equal(got, np.sort(got)), "not ascending"
        # value multiset matches the true k smallest (inf-safe compare)
        assert np.array_equal(want, got), (want[:8], got[:8])
        # indices point at elements with the claimed values
        finite = np.isfinite(got)
        assert np.all(key_np[r][idx[r][finite]] == got[finite])
        assert np.all(idx[r] >= 0) and np.all(idx[r] < key_np.shape[1])


@pytest.mark.parametrize("w,k", [(4160, 21), (4160, 278), (8320, 7)])
def test_blocked_random(w, k):
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (17, w), jnp.float32))
    vals, idx = jax.jit(lambda a: _blocked_min_k(a, k))(jnp.asarray(x))
    _check_exact(x, vals, idx, k)


def test_blocked_tie_heavy():
    # 5 distinct levels over a wide row: boundary ties guaranteed.
    x = np.asarray(jax.random.randint(
        jax.random.PRNGKey(1), (9, 4160), 0, 5)).astype(np.float32)
    vals, idx = jax.jit(lambda a: _blocked_min_k(a, 33))(jnp.asarray(x))
    _check_exact(x, vals, idx, 33)
    # duplicate indices would double-select one element
    for r in range(x.shape[0]):
        assert len(set(np.asarray(idx)[r].tolist())) == 33


def test_blocked_inf_padding():
    # Rows with FEWER than k finite entries: every finite element must
    # appear exactly once; the rest are +inf slots (compaction contract).
    rng = np.random.default_rng(2)
    x = np.full((6, 4160), np.inf, np.float32)
    for r in range(6):
        live = rng.choice(4160, size=rng.integers(0, 30), replace=False)
        x[r, live] = rng.standard_normal(live.size).astype(np.float32)
    k = 64
    vals, idx = jax.jit(lambda a: _blocked_min_k(a, k))(jnp.asarray(x))
    vals, idx = np.asarray(vals), np.asarray(idx)
    for r in range(6):
        finite = np.isfinite(x[r])
        got = vals[r][np.isfinite(vals[r])]
        assert np.array_equal(np.sort(x[r][finite]), np.sort(got))
        sel = idx[r][np.isfinite(vals[r])]
        assert len(set(sel.tolist())) == sel.size


def test_blocked_worst_case_one_block():
    # All k smallest packed into a single block: stage 1 must still keep
    # that block, and stage 2 must pull every element from it.
    x = np.full((3, 4160), 100.0, np.float32)
    x[:, 128:128 + _BLK] = np.arange(_BLK, dtype=np.float32)[None, :]
    vals, idx = jax.jit(lambda a: _blocked_min_k(a, _BLK))(jnp.asarray(x))
    _check_exact(x, vals, idx, _BLK)
    assert np.array_equal(np.sort(np.asarray(idx)[0]),
                          np.arange(128, 128 + _BLK))


def test_exact_min_k_dispatch_narrow():
    # Narrow/odd widths take the single-pass branch and stay exact.
    for w, k in ((130, 5), (4096, 600), (37, 40)):
        x = np.asarray(jax.random.normal(
            jax.random.PRNGKey(3), (4, w), jnp.float32))
        vals, idx = jax.jit(lambda a, k=k: exact_min_k(a, k))(jnp.asarray(x))
        _check_exact(x, vals, idx, min(k, w))


def test_exact_max_k():
    x = np.asarray(jax.random.normal(
        jax.random.PRNGKey(4), (5, 4160), jnp.float32))
    vals, idx = jax.jit(lambda a: exact_max_k(a, 19))(jnp.asarray(x))
    vals, idx = np.asarray(vals), np.asarray(idx)
    for r in range(5):
        want = np.sort(x[r])[::-1][:19]
        assert np.array_equal(want, vals[r])
        assert np.all(x[r][idx[r]] == vals[r])
