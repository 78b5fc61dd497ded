"""Preprocessor must stream directory datasets through the native
prefetching loader and agree with the PIL fallback path."""

import numpy as np
import pytest

from ssg_tpu.data import datasets, native_loader
from ssg_tpu.data.preprocessor import Preprocessor

PIL = pytest.importorskip("PIL.Image")

pytestmark = pytest.mark.skipif(
    not native_loader.is_available(), reason="libssg_data not built"
)


@pytest.fixture()
def disk_dataset(tmp_path):
    images = tmp_path / "images"
    images.mkdir()
    rng = np.random.default_rng(0)
    for i in range(7):
        arr = rng.integers(0, 256, size=(128, 64, 3), dtype=np.uint8)
        PIL.fromarray(arr).save(images / f"{i % 3:08d}_{i % 2:02d}_{i:04d}.png")
    return datasets.create("market1501", root=str(tmp_path))


def test_native_stream_used_and_matches_metadata(disk_dataset):
    pre = Preprocessor(disk_dataset, batch_size=4)
    assert pre._native_stream() is not None
    batches = list(pre)
    assert len(batches) == 2
    images, pids, cams, mask = batches[-1]
    assert images.shape == (4, 256, 128, 3)
    assert mask.tolist() == [True, True, True, False]
    want_pids = [p for _, p, _ in disk_dataset.train]
    got_pids = np.concatenate([b[1][b[3]] for b in batches]).tolist()
    assert got_pids == want_pids


def test_native_stream_pixels_match_batch_decode(disk_dataset):
    pre = Preprocessor(disk_dataset, batch_size=4)
    got = np.concatenate([b[0][b[3]] for b in pre])
    want = disk_dataset.render([f for f, _, _ in disk_dataset.train])
    np.testing.assert_array_equal(got, want)


def test_fallback_when_native_disabled(disk_dataset, monkeypatch):
    monkeypatch.setattr(native_loader, "is_available", lambda: False)
    pre = Preprocessor(disk_dataset, batch_size=4)
    assert pre._native_stream() is None
    batches = list(pre)
    assert len(batches) == 2 and batches[0][0].shape == (4, 256, 128, 3)


def test_prefetch_preserves_order_and_propagates_errors():
    from ssg_tpu.data.prefetch import prefetch

    assert list(prefetch(iter(range(100)), depth=3)) == list(range(100))

    def boom():
        yield 1
        yield 2
        raise RuntimeError("decode failed")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1 and next(it) == 2
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_prefetch_overlaps_producer_with_consumer():
    """With depth=2, the producer renders ahead: total wall-clock is close
    to max(produce, consume) per item, not the sum."""
    import time

    from ssg_tpu.data.prefetch import prefetch

    def slow_producer():
        for i in range(6):
            time.sleep(0.05)
            yield i

    t0 = time.time()
    for _ in prefetch(slow_producer(), depth=2):
        time.sleep(0.05)  # consumer work
    overlapped = time.time() - t0
    # Serial would be ~0.6s; overlapped ~0.35s. Generous bound for CI noise.
    assert overlapped < 0.5, overlapped
