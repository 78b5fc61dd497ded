"""Multi-chip path tests on the virtual 8-device CPU mesh (SURVEY.md §4.3).

Every sharded op is compared against its single-device twin (which is itself
oracle-verified), including the full sharded rerank -> eps -> DBSCAN chain.
Sizes are deliberately NOT multiples of 8 to exercise the padding/masking.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssg_tpu.cluster import dbscan, select_eps
from ssg_tpu.ops import pairwise_distance, re_ranking
from ssg_tpu.parallel import (
    make_mesh,
    sharded_dbscan,
    sharded_pairwise_distance,
    sharded_re_ranking,
    sharded_select_eps,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


@pytest.fixture
def feats(rng):
    centers = rng.normal(size=(10, 24)) * 3.0
    pts = centers[np.repeat(np.arange(10), 9)] + rng.normal(size=(90, 24)) * 0.4
    scatter = rng.normal(size=(13, 24)) * 6.0  # 103 rows: not divisible by 8
    return np.concatenate([pts, scatter], 0).astype(np.float32)


def test_sharded_distance_matches_single(mesh, feats):
    ref = np.asarray(pairwise_distance(jnp.asarray(feats)))
    ours = np.asarray(sharded_pairwise_distance(jnp.asarray(feats), mesh))
    # atol: different GEMM tilings reorder accumulation (~1e-4 abs noise).
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=2e-4)


def test_sharded_eps_matches_single(mesh, feats):
    d = pairwise_distance(jnp.asarray(feats), squared=False)
    for rho in (0.016, 0.1):
        ref = float(select_eps(d, rho=rho))
        ours = float(sharded_select_eps(d, mesh, rho=rho))
        assert ours == pytest.approx(ref, rel=1e-6)


def test_sharded_dbscan_matches_single(mesh, feats):
    d = pairwise_distance(jnp.asarray(feats), squared=False)
    eps = float(select_eps(d, rho=0.05))
    ref_labels, ref_n = dbscan(d, eps, min_samples=4)
    labels, n = sharded_dbscan(d, eps, mesh, min_samples=4)
    assert int(n) == int(ref_n)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(ref_labels))


def test_sharded_rerank_matches_single(mesh, feats):
    ref = np.asarray(re_ranking(features=jnp.asarray(feats), k1=12, k2=4))
    ours = np.asarray(
        sharded_re_ranking(jnp.asarray(feats), mesh, k1=12, k2=4)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_sharded_full_chain_label_parity(mesh, feats):
    """config-5 shape: sharded rerank -> sharded eps -> sharded DBSCAN,
    labels must equal the single-device (oracle-verified) chain exactly."""
    x = jnp.asarray(feats)
    ref_dist = re_ranking(features=x, k1=12, k2=4)
    ref_eps = select_eps(ref_dist, rho=0.05)
    ref_labels, _ = dbscan(ref_dist, ref_eps, min_samples=4)

    dist = sharded_re_ranking(x, mesh, k1=12, k2=4)
    eps = sharded_select_eps(dist, mesh, rho=0.05)
    labels, _ = sharded_dbscan(dist, eps, mesh, min_samples=4)
    assert float(eps) == pytest.approx(float(ref_eps), rel=1e-5)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(ref_labels))


def test_dp_train_step_runs_on_mesh(mesh, rng):
    """Data-parallel train step: batch sharded over the mesh, params
    replicated — the DataParallel replacement (SURVEY.md §2)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ssg_tpu.models.resnet import BasicBlock, SSGResNet
    from ssg_tpu.train.trainer import create_train_state, make_train_step

    model = SSGResNet(stage_sizes=(1, 1), block=BasicBlock, num_features=16,
                      dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=(2, 64, 32, 3))
    step = make_train_step(model, num_parts=3, height=64, width=32)

    images = (rng.random((16, 64, 32, 3)) * 255).astype(np.uint8)
    labels = np.tile(np.repeat(np.arange(4), 4)[None], (3, 1))
    sharding = NamedSharding(mesh, P("data"))
    images_sharded = jax.device_put(jnp.asarray(images), sharding)
    state2, metrics = step(state, images_sharded,
                           jnp.asarray(labels), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_dp_helpers_shard_and_replicate():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ssg_tpu.parallel import make_mesh, replicate, shard_batch

    mesh = make_mesh(8)
    batch = {"x": np.zeros((16, 4), np.float32), "y": np.zeros((16,), np.int32)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding == NamedSharding(mesh, P("data"))
    params = replicate(mesh, {"w": np.ones((3, 3), np.float32)})
    assert params["w"].sharding == NamedSharding(mesh, P())
    assert params["w"].is_fully_replicated


def test_extract_features_sharded_matches_single():
    import jax
    import jax.numpy as jnp

    from ssg_tpu import api
    from ssg_tpu.data import datasets
    from ssg_tpu.data.preprocessor import Preprocessor
    from ssg_tpu.models.resnet import BasicBlock, SSGResNet
    from ssg_tpu.parallel import make_mesh

    ds = datasets.create("market1501", scale="tiny", seed=9)
    orig_render = ds.render
    ds.render = lambda fnames: orig_render(fnames)[:, ::4, ::4, :]
    model = SSGResNet(stage_sizes=(1, 1), block=BasicBlock, num_features=8,
                      dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 64, 32, 3)), train=False)
    items = ds.train[:32]

    f1, p1, c1, n1 = api.extract_features(
        model, variables, Preprocessor(ds, items=items, batch_size=16))
    mesh = make_mesh(8)
    f2, p2, c2, n2 = api.extract_features(
        model, variables, Preprocessor(ds, items=items, batch_size=16),
        mesh=mesh)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)
    np.testing.assert_array_equal(p1, p2)
    assert n1 == n2


def test_ring_gather_sum_matches_onehot_gemm():
    """ring_gather_sum (the QE k-row gather) must equal the one-hot GEMM
    contraction it replaced, for arbitrary global row indices."""
    from jax.sharding import PartitionSpec as P

    from ssg_tpu.parallel import make_mesh
    from ssg_tpu.parallel.ring import ring_gather_sum

    mesh = make_mesh(8)
    rng = np.random.default_rng(5)
    n, m, b, k = 64, 16, 24, 5
    v = rng.normal(size=(n, m)).astype(np.float32)
    idx = np.stack([rng.choice(n, size=k, replace=False)
                    for _ in range(b)]).astype(np.int32)

    def impl(idx_rep, v_local):
        return ring_gather_sum(jnp.asarray(idx_rep), v_local)

    out = jax.shard_map(
        impl, mesh=mesh, in_specs=(P(), P("data", None)),
        out_specs=P(), check_vma=False,
    )(jnp.asarray(idx), jnp.asarray(v))
    want = np.zeros((b, m), np.float32)
    for i in range(b):
        want[i] = v[idx[i]].sum(0)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6, atol=1e-6)
