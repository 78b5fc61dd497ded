"""NaN/inf sanitizer coverage (SURVEY.md §5 "race detection / sanitizers").

The reference is a single-process script with no sanitizers; the TPU
rebuild's equivalent hygiene is (a) jax_debug_nans over the hot graphs —
any NaN produced inside jit raises instead of silently corrupting
pseudo-labels — and (b) checkify float checks on the loss, including the
degenerate inputs most likely to divide by zero (identical features,
single-cluster batches).
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssg_tpu import api
from ssg_tpu.ops.triplet import batch_hard_triplet_loss


@contextlib.contextmanager
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


def _features(n=96, f=64, ident=False, seed=0):
    rng = np.random.default_rng(seed)
    x = np.ones((n, f), np.float32) if ident else rng.normal(
        size=(n, f)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return jnp.asarray(x)


@pytest.mark.parametrize("ident", [False, True])
def test_analytics_graph_nan_free(ident):
    """extract->rerank->eps->DBSCAN produces no NaN, even on all-identical
    features (zero distances everywhere — the div-by-zero magnet)."""
    feats = _features(ident=ident)[None]  # one group
    with debug_nans():
        labels, n_clusters, eps = api.cluster_groups(feats, k1=8, k2=3)
    assert np.isfinite(float(eps[0]))


@pytest.mark.parametrize("single_id", [False, True])
def test_triplet_loss_nan_free(single_id):
    """Batch-hard triplet on degenerate batches: one identity means no
    negatives (hardest-negative mask empty) — must yield finite loss."""
    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    labels = jnp.zeros(16, jnp.int32) if single_id else jnp.asarray(
        np.arange(16) // 4)
    with debug_nans():
        loss, prec = batch_hard_triplet_loss(emb, labels, margin=0.3)
    assert np.isfinite(float(loss))


def test_triplet_loss_checkify_clean():
    """checkify float-error pass over the loss: no hidden inf/nan ops."""
    from jax.experimental import checkify

    rng = np.random.default_rng(2)
    emb = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    labels = jnp.asarray(np.arange(16) // 4)
    checked = checkify.checkify(
        lambda e, l: batch_hard_triplet_loss(e, l, margin=0.3)[0],
        errors=checkify.float_checks)
    err, loss = jax.jit(checked)(emb, labels)
    err.throw()  # raises if any NaN/inf/div-by-zero occurred
    assert np.isfinite(float(loss))


def test_train_step_nan_free_on_single_identity_batch():
    """A single-identity P x K batch (one surviving cluster — no negatives
    anywhere) must not poison the params: loss is 0 and the masked-loss
    gradients stay 0, not 0 * NaN.

    Images must be distinct (random): batch-wide *constant* activations
    make Flax BN's variance (mean(x^2) - mean(x)^2) go negative by fp
    cancellation -> rsqrt NaN. That's unreachable in the product — the
    per-sample crop/flip augmentation decorrelates even a repeated image —
    so the realistic degenerate is distinct images, one identity.
    """
    from ssg_tpu import models
    from ssg_tpu.train.trainer import create_train_state, make_train_step

    model = models.create("resnet18", num_features=0, num_parts=3,
                          dtype=jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=(4, 32, 16, 3))
    step = make_train_step(model, num_parts=3, height=32, width=16)
    rng = np.random.default_rng(4)
    images = rng.integers(0, 256, size=(4, 32, 16, 3)).astype(np.uint8)
    pids = np.zeros((3, 4), np.int64)  # every branch: a single identity
    with debug_nans():
        state, metrics = step(state, jnp.asarray(images),
                              jnp.asarray(pids), jax.random.PRNGKey(1))
    assert float(metrics["loss"]) == 0.0
    flat = jax.tree_util.tree_leaves(state.params)
    assert not any(bool(jnp.isnan(p).any()) for p in flat)
