"""Tests for datasets, sampler, and on-device transforms."""

import numpy as np

from ssg_tpu.data import datasets
from ssg_tpu.data.preprocessor import Preprocessor
from ssg_tpu.data.sampler import RandomIdentitySampler
from ssg_tpu.data.synthetic import RAW_H, RAW_W


def test_dataset_factory_structure():
    ds = datasets.create("market1501", scale="tiny", seed=1)
    assert ds.num_train_ids >= 8
    for split in (ds.train, ds.query, ds.gallery):
        for fname, pid, cam in split:
            assert fname == f"{pid:08d}_{cam:02d}_" + fname.split("_")[-1]
    # Deterministic across constructions.
    ds2 = datasets.create("market1501", scale="tiny", seed=1)
    assert ds.train == ds2.train
    img1 = ds.render([ds.train[0][0]])
    img2 = ds2.render([ds.train[0][0]])
    np.testing.assert_array_equal(img1, img2)
    assert img1.shape == (1, RAW_H, RAW_W, 3) and img1.dtype == np.uint8


def test_identity_appearance_dominates():
    # Same-id images should be closer in pixel space than cross-id ones.
    ds = datasets.create("market1501", scale="tiny")
    same = [f for f, p, _ in ds.train if p == ds.train[0][1]][:4]
    other = [f for f, p, _ in ds.train if p != ds.train[0][1]][:4]
    a = ds.render(same).astype(np.float32)
    b = ds.render(other).astype(np.float32)
    intra = np.mean([np.abs(a[0] - a[i]).mean() for i in range(1, 4)])
    cross = np.mean([np.abs(a[0] - b[i]).mean() for i in range(4)])
    assert cross > 1.5 * intra


def test_random_identity_sampler_pk_layout():
    ds = datasets.create("market1501", scale="tiny")
    sampler = RandomIdentitySampler(ds.train, num_instances=4, seed=0)
    idx = sampler.epoch_indices()
    assert len(idx) == sampler.num_samples * 4
    pids = np.asarray([ds.train[i][1] for i in idx])
    # Every consecutive group of 4 shares one identity.
    groups = pids.reshape(-1, 4)
    assert (groups == groups[:, :1]).all()
    # All identities appear exactly once per epoch.
    assert sorted(set(groups[:, 0])) == sorted(sampler.pids)


def test_preprocessor_pads_tail():
    ds = datasets.create("market1501", scale="tiny")
    pre = Preprocessor(ds, items=ds.train[:10], batch_size=8)
    batches = list(pre)
    assert len(batches) == 2
    images, pids, cams, mask = batches[1]
    assert images.shape[0] == 8
    assert mask.sum() == 2


def test_transforms_on_device():
    import jax
    import jax.numpy as jnp

    from ssg_tpu.data import transforms

    ds = datasets.create("market1501", scale="tiny")
    imgs = ds.render([f for f, _, _ in ds.train[:4]])
    x = transforms.test_transform(jnp.asarray(imgs))
    assert x.shape == (4, 256, 128, 3)
    assert abs(float(x.mean())) < 3.0

    key = jax.random.PRNGKey(0)
    y = jax.jit(lambda k, im: transforms.train_transform(k, im))(key, jnp.asarray(imgs))
    assert y.shape == (4, 256, 128, 3)
    assert bool(jnp.isfinite(y).all())
    # Different keys -> different augmentations.
    y2 = transforms.train_transform(jax.random.PRNGKey(1), jnp.asarray(imgs))
    assert not np.allclose(np.asarray(y), np.asarray(y2))
