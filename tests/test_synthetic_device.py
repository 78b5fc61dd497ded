"""Tests for the on-device synthetic renderer (data/synthetic_device.py)."""

import numpy as np

from ssg_tpu.data.synthetic import SyntheticReID
from ssg_tpu.data.synthetic_device import DeviceRenderer


def _collect(renderer, items, bs):
    imgs, pids = [], []
    for images, p, _, mask in renderer.batches(items, bs):
        arr = np.asarray(images)
        imgs.append(arr[mask])
        pids.append(p[mask])
    return np.concatenate(imgs), np.concatenate(pids)


def test_shapes_dtype_and_padding():
    ds = SyntheticReID(name="t", num_train_ids=4, num_test_ids=2, cams=3)
    r = DeviceRenderer(ds)
    batches = list(r.batches(ds.train, batch_size=10))
    assert all(b[0].shape == (10, 256, 128, 3) for b in batches)
    assert str(batches[0][0].dtype) == "uint8"
    imgs, pids = _collect(r, ds.train, 10)
    assert len(imgs) == len(ds.train) and len(pids) == len(ds.train)


def test_deterministic_across_calls():
    ds = SyntheticReID(name="t", num_train_ids=3, num_test_ids=2, cams=2)
    r = DeviceRenderer(ds)
    a, _ = _collect(r, ds.train[:6], 4)
    b, _ = _collect(r, ds.train[:6], 4)
    np.testing.assert_array_equal(a, b)


def test_identity_dominates_appearance():
    """Same-id image pairs must be closer in pixel space than cross-id pairs
    (the property that makes clustering benchmarks meaningful)."""
    ds = SyntheticReID(name="t", num_train_ids=6, num_test_ids=2, cams=3)
    r = DeviceRenderer(ds)
    imgs, pids = _collect(r, ds.train, 16)
    x = imgs.reshape(len(imgs), -1).astype(np.float32) / 255.0
    d = ((x[:, None] - x[None, :]) ** 2).mean(-1)
    same = pids[:, None] == pids[None, :]
    off = ~np.eye(len(x), dtype=bool)
    assert d[same & off].mean() * 2 < d[~same].mean()
