"""Tests for the parity-surface components: evaluation_metrics (full flag
set), loss package (TripletLoss class + OIM), feature_extraction
(extract_cnn_feature + FeatureDatabase), dist_metric / metric_learning
(euclidean + KISSME), inception model, cuhk03 dataset def.

Oracles per SURVEY.md §4: numpy/sklearn/torch-CPU implementations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssg_tpu.oracle.ranking import cmc_np, mean_ap_np


def _toy_eval(seed=0, q=20, g=60, ids=7, cams=3):
    rng = np.random.default_rng(seed)
    qi = rng.integers(0, ids, q)
    gi = rng.integers(0, ids, g)
    qc = rng.integers(0, cams, q)
    gc = rng.integers(0, cams, g)
    # Distances biased so same-id pairs are closer, plus noise; no exact ties.
    d = rng.uniform(1.0, 2.0, (q, g))
    d -= 0.8 * (qi[:, None] == gi[None, :])
    d += rng.uniform(0, 1e-6, (q, g))
    return d.astype(np.float32), qi, gi, qc, gc


class TestRankingMetrics:
    def test_mean_ap_matches_oracle(self):
        from ssg_tpu.evaluation_metrics import mean_ap

        d, qi, gi, qc, gc = _toy_eval()
        got = mean_ap(d, qi, gi, qc, gc)
        want = mean_ap_np(d, qi, gi, qc, gc)
        assert got == pytest.approx(want, abs=1e-4)

    @pytest.mark.parametrize("first_match_break", [True, False])
    @pytest.mark.parametrize("separate_camera_set", [False, True])
    def test_cmc_matches_oracle(self, first_match_break, separate_camera_set):
        from ssg_tpu.evaluation_metrics import cmc

        d, qi, gi, qc, gc = _toy_eval(seed=1)
        kw = dict(topk=30, first_match_break=first_match_break,
                  separate_camera_set=separate_camera_set)
        got = cmc(d, qi, gi, qc, gc, **kw)
        want = cmc_np(d, qi, gi, qc, gc, **kw)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_cmc_single_gallery_shot_runs(self):
        from ssg_tpu.evaluation_metrics import cmc

        # cuhk03 protocol: single-shot sampling + allshots counting
        # (open-reid never combines single_gallery_shot with
        # first_match_break; the oracle reproduces that pairing).
        d, qi, gi, qc, gc = _toy_eval(seed=2)
        curve = cmc(d, qi, gi, qc, gc, topk=10, single_gallery_shot=True,
                    first_match_break=False)
        assert curve.shape == (10,)
        assert np.all(np.diff(curve) >= -1e-9) and curve[-1] <= 1.0

    def test_cmc_sgs_first_match_break_scales_by_repeats(self):
        from ssg_tpu.evaluation_metrics import cmc

        # Oracle quirk (oracle/ranking.py:101-104): under sgs+fmb each of
        # the 10 repeats adds a full +1, so the curve is exactly repeats x
        # the allshots-sgs curve (same draws when the seed is pinned).
        d, qi, gi, qc, gc = _toy_eval(seed=3)
        kw = dict(topk=40, single_gallery_shot=True)
        allshots = cmc(d, qi, gi, qc, gc, first_match_break=False,
                       rng=np.random.default_rng(7), **kw)
        fmb = cmc(d, qi, gi, qc, gc, first_match_break=True,
                  rng=np.random.default_rng(7), **kw)
        np.testing.assert_allclose(fmb, 10.0 * allshots, atol=1e-5)
        # Every valid query's single sampled match lands within topk=40
        # here, so the fmb curve saturates at repeats, not 1.
        assert fmb[-1] == pytest.approx(10.0)

    def test_cmc_topk_above_pad_matches_oracle(self):
        from ssg_tpu.evaluation_metrics import cmc

        d, qi, gi, qc, gc = _toy_eval(seed=4, g=120)
        kw = dict(topk=115, first_match_break=False)
        got = cmc(d, qi, gi, qc, gc, **kw)
        want = cmc_np(d, qi, gi, qc, gc, **kw)
        assert got.shape == (115,)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_accuracy(self):
        from ssg_tpu.evaluation_metrics import accuracy

        logits = np.array([[0.9, 0.1, 0.0], [0.2, 0.5, 0.3], [0.1, 0.2, 0.7]])
        target = np.array([0, 2, 2])
        top1, top2 = accuracy(logits, target, topk=(1, 2))
        assert top1 == pytest.approx(2 / 3)
        assert top2 == pytest.approx(1.0)


class TestLossPackage:
    def test_triplet_class_matches_op(self):
        from ssg_tpu.loss import TripletLoss, batch_hard_triplet_loss

        rng = np.random.default_rng(0)
        x = rng.normal(size=(16, 32)).astype(np.float32)
        y = np.repeat(np.arange(4), 4)
        loss_c, prec_c = TripletLoss(margin=0.3)(jnp.asarray(x), jnp.asarray(y))
        loss_f, prec_f = batch_hard_triplet_loss(jnp.asarray(x), jnp.asarray(y), 0.3)
        assert float(loss_c) == pytest.approx(float(loss_f))
        assert float(prec_c) == pytest.approx(float(prec_f))

    def test_oim_loss_vs_manual_ce(self):
        from ssg_tpu.loss import oim_loss

        rng = np.random.default_rng(1)
        x = rng.normal(size=(8, 16))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        lut = rng.normal(size=(5, 16))
        lut /= np.linalg.norm(lut, axis=1, keepdims=True)
        y = np.array([0, 1, 2, 3, 4, 0, 1, 2])
        loss, new_lut = oim_loss(jnp.asarray(lut, jnp.float32),
                                 jnp.asarray(x, jnp.float32), jnp.asarray(y),
                                 temperature=0.1, momentum=0.5)
        logits = x @ lut.T / 0.1
        logp = logits - np.log(np.exp(logits).sum(1, keepdims=True))
        want = -np.mean(logp[np.arange(8), y])
        assert float(loss) == pytest.approx(want, rel=1e-5)
        # LUT rows re-normalized and moved toward the class-mean feature.
        np.testing.assert_allclose(np.linalg.norm(np.asarray(new_lut), axis=1),
                                   1.0, atol=1e-5)
        mean0 = x[[0, 5]].mean(0)
        raw = 0.5 * lut[0] + 0.5 * mean0
        np.testing.assert_allclose(np.asarray(new_lut)[0],
                                   raw / np.linalg.norm(raw), atol=1e-5)

    def test_oim_ignores_unlabeled(self):
        from ssg_tpu.loss import oim_loss

        rng = np.random.default_rng(2)
        x = rng.normal(size=(4, 8)).astype(np.float32)
        lut = np.eye(3, 8, dtype=np.float32)
        y_all = np.array([0, 1, -1, -1])
        loss_a, lut_a = oim_loss(jnp.asarray(lut), jnp.asarray(x), jnp.asarray(y_all))
        loss_b, lut_b = oim_loss(jnp.asarray(lut), jnp.asarray(x[:2]),
                                 jnp.asarray(y_all[:2]))
        assert float(loss_a) == pytest.approx(float(loss_b), rel=1e-5)
        np.testing.assert_allclose(np.asarray(lut_a), np.asarray(lut_b), atol=1e-6)
        assert np.allclose(np.asarray(lut_a)[2], lut[2])  # unmatched row untouched

    def test_oim_stateful_wrapper_learns(self):
        from ssg_tpu.loss import OIMLoss

        crit = OIMLoss(num_features=8, num_classes=3)
        rng = np.random.default_rng(3)
        x = rng.normal(size=(6, 8))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        y = np.array([0, 1, 2, 0, 1, 2])
        first = crit(jnp.asarray(x, jnp.float32), jnp.asarray(y))
        second = crit(jnp.asarray(x, jnp.float32), jnp.asarray(y))
        assert second < first  # LUT moved toward the features


class TestFeatureExtraction:
    def test_extract_cnn_feature_matches_api(self):
        from ssg_tpu import models
        from ssg_tpu.feature_extraction import extract_cnn_feature

        model = models.create("resnet18", num_features=0, num_parts=3)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((2, 64, 32, 3), jnp.float32), train=False)
        imgs = np.random.default_rng(0).integers(0, 256, (4, 64, 32, 3),
                                                 dtype=np.uint8)
        feats = extract_cnn_feature(model, variables, imgs)
        assert feats.shape[0] == 3 and feats.shape[1] == 4
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-4)
        with pytest.raises(TypeError):
            extract_cnn_feature(model, variables, imgs.astype(np.float32))

    def test_feature_database_roundtrip(self, tmp_path):
        h5py = pytest.importorskip("h5py")  # noqa: F841
        from ssg_tpu.feature_extraction import FeatureDatabase

        path = str(tmp_path / "feats.h5")
        rng = np.random.default_rng(0)
        a, b = rng.normal(size=(16,)), rng.normal(size=(16,))
        with FeatureDatabase(path, "w") as db:
            db["img_a.jpg"] = a
            db["img_b.jpg"] = b
            db["img_a.jpg"] = a + 1  # overwrite
        with FeatureDatabase(path, "r") as db:
            assert len(db) == 2 and "img_a.jpg" in db
            np.testing.assert_allclose(db["img_a.jpg"], (a + 1).astype(np.float32),
                                       atol=1e-6)
            np.testing.assert_allclose(db["img_b.jpg"], b.astype(np.float32),
                                       atol=1e-6)


class TestMetricLearning:
    def test_euclidean_is_identity(self):
        from ssg_tpu.dist_metric import DistanceMetric

        m = DistanceMetric("euclidean")
        x = np.random.default_rng(0).normal(size=(5, 4)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(m.transform(x)), x)

    def test_kissme_improves_separation(self):
        """On anisotropic clusters, KISSME distances should separate classes
        better than raw Euclidean (higher between/within ratio)."""
        from ssg_tpu.metric_learning import KISSME

        rng = np.random.default_rng(0)
        dim, ids, per = 16, 6, 20
        centers = rng.normal(size=(ids, dim)) * 0.5
        noise_scale = np.ones(dim)
        noise_scale[: dim // 2] = 4.0  # nuisance directions
        X = np.concatenate(
            [c + rng.normal(size=(per, dim)) * noise_scale for c in centers])
        y = np.repeat(np.arange(ids), per)

        def ratio(D):
            same = y[:, None] == y[None, :]
            off = ~np.eye(len(y), dtype=bool)
            return D[~same].mean() / D[same & off].mean()

        euc = ((X[:, None] - X[None, :]) ** 2).sum(-1)
        kiss = np.asarray(KISSME(seed=0).fit(X, y).distance(X))
        assert ratio(kiss) > ratio(euc) * 1.5
        assert kiss.min() >= -1e-5  # PSD projection keeps distances valid

    def test_get_metric_unknown_raises(self):
        from ssg_tpu.metric_learning import get_metric

        with pytest.raises(KeyError):
            get_metric("mahalanobis2000")


class TestInception:
    def test_forward_contract(self):
        from ssg_tpu import models

        assert "inception" in models.names()
        model = models.create("inception", depth=3, width=16, num_features=32,
                              num_classes=5, num_parts=3)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 64, 32, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out["embeddings"].shape == (3, 2, 32)
        assert out["logits"].shape == (3, 2, 5)
        # Eval embeddings L2-normalized (reference eval behavior).
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out["embeddings"]), axis=-1), 1.0, atol=1e-4)


def test_cuhk03_synthetic_shape():
    from ssg_tpu.data import datasets

    ds = datasets.create("cuhk03", scale="tiny", seed=0)
    assert len(ds.train) > 0 and len(ds.query) > 0
    assert {c for _, _, c in ds.train} <= {0, 1}


class TestSingleGalleryShotDevice:
    """_cmc_sgs_device vs the numpy oracle (randomized cuhk03 protocol)."""

    def test_exact_when_groups_are_singletons(self):
        # One valid gallery instance per id -> sampling is deterministic,
        # so device and oracle must agree exactly despite different RNGs.
        from ssg_tpu.evaluation_metrics import cmc

        rng = np.random.default_rng(7)
        n_ids = 12
        gi = np.arange(n_ids)
        gc = np.ones(n_ids, int)
        qi = np.arange(n_ids).repeat(2)
        qc = np.zeros_like(qi)
        d = rng.normal(size=(qi.size, n_ids))
        kw = dict(topk=10, single_gallery_shot=True, first_match_break=False)
        got = cmc(d, qi, gi, qc, gc, **kw)
        want = cmc_np(d, qi, gi, qc, gc, **kw)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_statistically_matches_oracle(self):
        # Multi-instance groups: both samplers are uniform-per-id, so the
        # expected curves agree; average over seeds and compare loosely.
        from ssg_tpu.evaluation_metrics import cmc

        rng = np.random.default_rng(3)
        n_ids, per_id = 8, 4
        gi = np.arange(n_ids).repeat(per_id)
        gc = rng.integers(1, 3, size=gi.size)
        qi = np.arange(n_ids).repeat(3)
        qc = np.zeros_like(qi)
        feats_g = rng.normal(size=(n_ids, 5))[gi] + 0.8 * rng.normal(
            size=(gi.size, 5))
        feats_q = rng.normal(size=(n_ids, 5))[qi] + 0.8 * rng.normal(
            size=(qi.size, 5))
        d = ((feats_q[:, None] - feats_g[None]) ** 2).sum(-1)
        kw = dict(topk=10, single_gallery_shot=True, first_match_break=False,
                  separate_camera_set=False)
        got = np.mean([
            cmc(d, qi, gi, qc, gc, rng=np.random.default_rng(s), **kw)
            for s in range(8)], axis=0)
        want = np.mean([
            cmc_np(d, qi, gi, qc, gc, rng=np.random.default_rng(s), **kw)
            for s in range(8)], axis=0)
        np.testing.assert_allclose(got, want, atol=0.05)
