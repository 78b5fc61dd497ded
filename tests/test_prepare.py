"""Raw benchmark tree -> open-reid layout preparation (data/prepare.py),
fed straight into datasets.create + Preprocessor."""

import os

import numpy as np
import pytest

from ssg_tpu.data import datasets
from ssg_tpu.data.prepare import prepare

PIL = pytest.importorskip("PIL.Image")


def _img(path, seed):
    arr = np.random.default_rng(seed).integers(0, 256, (64, 32, 3), dtype=np.uint8)
    PIL.fromarray(arr).save(path)


def test_prepare_market_layout(tmp_path):
    raw = tmp_path / "raw"
    for sub in ("bounding_box_train", "query", "bounding_box_test"):
        (raw / sub).mkdir(parents=True)
    # Market naming: {pid:04d}_c{cam}s{seq}_{frame}_{det}.jpg; junk pid -1.
    _img(raw / "bounding_box_train" / "0001_c1s1_000151_01.jpg", 1)
    _img(raw / "bounding_box_train" / "0001_c2s1_000176_02.jpg", 2)
    _img(raw / "bounding_box_train" / "0007_c1s1_001051_03.jpg", 3)
    _img(raw / "bounding_box_test" / "-1_c1s1_000000_01.jpg", 4)  # junk
    _img(raw / "bounding_box_test" / "0021_c3s1_000251_01.jpg", 5)
    _img(raw / "query" / "0021_c1s1_000301_01.jpg", 6)

    out = tmp_path / "prepared"
    splits = prepare("market1501", str(raw), str(out))
    assert len(splits["train"]) == 3
    assert len(splits["gallery"]) == 1  # junk pid skipped
    assert len(splits["query"]) == 1
    assert (out / "splits.json").exists() and (out / "meta.json").exists()

    ds = datasets.create("market1501", root=str(out))
    assert type(ds).__name__ == "DirectoryReID"
    assert sorted(p for _, p, _ in ds.train) == [1, 1, 7]
    assert [c for _, _, c in ds.query] == [0]  # cameras rebased to 0
    imgs = ds.render([f for f, _, _ in ds.train])
    assert imgs.shape[0] == 3 and imgs.dtype == np.uint8


def test_prepare_msmt_layout(tmp_path):
    raw = tmp_path / "raw"
    (raw / "train" / "0000").mkdir(parents=True)
    (raw / "test" / "0003").mkdir(parents=True)
    _img(raw / "train" / "0000" / "0000_000_c1_0001.jpg", 1)
    _img(raw / "train" / "0000" / "0000_001_c2_0002.jpg", 2)
    _img(raw / "test" / "0003" / "0003_000_c5_0001.jpg", 3)
    _img(raw / "test" / "0003" / "0003_001_c7_0002.jpg", 4)
    (raw / "list_train.txt").write_text(
        "0000/0000_000_c1_0001.jpg 0\n0000/0000_001_c2_0002.jpg 0\n")
    (raw / "list_query.txt").write_text("0003/0003_000_c5_0001.jpg 3\n")
    (raw / "list_gallery.txt").write_text("0003/0003_001_c7_0002.jpg 3\n")

    out = tmp_path / "prepared"
    splits = prepare("msmt17", str(raw), str(out))
    assert [p for _, p, _ in splits["train"]] == [0, 0]
    assert [c for _, _, c in splits["query"]] == [4]
    ds = datasets.create("msmt17", root=str(out))
    assert len(ds.train) == 2 and len(ds.gallery) == 1


def test_prepare_unknown_raises(tmp_path):
    with pytest.raises(KeyError):
        prepare("imagenet", str(tmp_path), str(tmp_path))
