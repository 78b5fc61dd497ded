"""Tests for the native C++ data pipeline (native/ssg_data via ctypes).

Oracle: PIL decode (same underlying libjpeg) + float bilinear resize in
numpy with pixel-center sampling, matching the kernel in
native/ssg_data/image.cc.
"""

import os

import numpy as np
import pytest

from ssg_tpu.data import native_loader

PIL = pytest.importorskip("PIL.Image")

pytestmark = pytest.mark.skipif(
    not native_loader.is_available(), reason="libssg_data not built"
)


def _resize_bilinear_np(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    h, w = img.shape[:2]
    ys = (np.arange(oh) + 0.5) * (h / oh) - 0.5
    xs = (np.arange(ow) + 0.5) * (w / ow) - 0.5
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    y0 = np.clip(ys.astype(int), 0, h - 1)
    x0 = np.clip(xs.astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    dy = (ys - y0)[:, None, None]
    dx = (xs - x0)[None, :, None]
    f = img.astype(np.float64)
    top = f[y0][:, x0] * (1 - dx) + f[y0][:, x1] * dx
    bot = f[y1][:, x0] * (1 - dx) + f[y1][:, x1] * dx
    return np.clip(top * (1 - dy) + bot * dy + 0.5, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    """A handful of images in every supported format, deterministic pixels."""
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i, ext in enumerate(["png", "png", "ppm", "jpg"]):
        arr = rng.integers(0, 256, size=(96 + 8 * i, 48 + 4 * i, 3), dtype=np.uint8)
        p = os.path.join(root, f"img{i}.{ext}")
        if ext == "ppm":
            with open(p, "wb") as f:
                f.write(b"P6\n# comment\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]))
                f.write(arr.tobytes())
        else:
            PIL.fromarray(arr).save(p, quality=95)
        paths.append(p)
        arrays.append(arr)
    return paths, arrays


def test_decode_lossless_formats_exact(image_dir):
    """PNG and PPM decode must be bit-exact; resize matches the numpy oracle."""
    paths, arrays = image_dir
    for p, arr in zip(paths[:3], arrays[:3]):
        h, w = arr.shape[:2]
        got = native_loader.decode_resize(p, h, w)  # identity resize
        np.testing.assert_array_equal(got, arr)
        oh, ow = 64, 32
        got = native_loader.decode_resize(p, oh, ow)
        want = _resize_bilinear_np(arr, oh, ow)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1  # fp rounding


def test_decode_jpeg_close_to_pil(image_dir):
    """JPEG is lossy but both paths use libjpeg — decoded pixels must agree."""
    paths, _ = image_dir
    p = paths[3]
    pil = np.asarray(PIL.open(p).convert("RGB"))
    got = native_loader.decode_resize(p, pil.shape[0], pil.shape[1])
    assert np.abs(got.astype(int) - pil.astype(int)).mean() < 1.0


def test_load_batch_threaded_matches_single(image_dir):
    paths, _ = image_dir
    many = paths * 8  # 32 images
    a = native_loader.load_batch(many, 128, 64, num_threads=1)
    b = native_loader.load_batch(many, 128, 64, num_threads=8)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (32, 128, 64, 3)


def test_load_batch_reports_failures(image_dir, tmp_path):
    paths, _ = image_dir
    with pytest.raises(IOError):
        native_loader.load_batch([paths[0], str(tmp_path / "missing.jpg")], 64, 32)


def test_batch_loader_prefetch_epochs(image_dir):
    paths, _ = image_dir
    many = paths * 3  # 12 images, batch 5 -> 3 batches, tail valid=2
    ref = native_loader.load_batch(many, 64, 32)
    loader = native_loader.BatchLoader(many, batch_size=5, height=64, width=32,
                                       prefetch=2)
    for _ in range(2):  # two epochs: reset must replay identically
        got, valids = [], []
        for images, valid in loader:
            assert images.shape == (5, 64, 32, 3)
            got.append(images[:valid])
            valids.append(valid)
        assert valids == [5, 5, 2]
        np.testing.assert_array_equal(np.concatenate(got), ref)
    loader.close()


def test_directory_dataset_uses_native(tmp_path, monkeypatch):
    """DirectoryReID.render goes through the native path and matches PIL."""
    from ssg_tpu.data import datasets
    from ssg_tpu.data.synthetic import RAW_H, RAW_W

    images = tmp_path / "images"
    images.mkdir()
    rng = np.random.default_rng(1)
    names = []
    for i in range(4):
        arr = rng.integers(0, 256, size=(160, 70, 3), dtype=np.uint8)
        name = f"{i:08d}_{i % 2:02d}_0000.png"
        PIL.fromarray(arr).save(images / name)
        names.append(name)
    ds = datasets.create("market1501", root=str(tmp_path))
    assert type(ds).__name__ == "DirectoryReID"
    native = ds.render(names)
    monkeypatch.setattr(native_loader, "is_available", lambda: False)
    pil = ds.render(names)
    assert native.shape == pil.shape == (4, RAW_H, RAW_W, 3)
    # Different bilinear implementations (PIL area-weighted vs pixel-center):
    # agree to within a small mean error on random pixels.
    assert np.abs(native.astype(int) - pil.astype(int)).mean() < 30


def test_exif_orientation_all_eight(tmp_path):
    """EXIF-rotated JPEGs decode upright, matching PIL.ImageOps.exif_transpose.

    Real-world re-ID raw distributions contain camera-rotated JPEGs; the
    reference's PIL loader honors the orientation tag, so ours must too
    (native/ssg_data/image.cc parse_exif_orientation/apply_orientation).
    """
    from PIL import ImageOps

    rng = np.random.default_rng(1)
    # Low-frequency image so JPEG loss stays small and orientation errors
    # (which move pixels by half the image) are unmistakable.
    base = rng.integers(0, 8, size=(6, 4, 3)).repeat(16, 0).repeat(16, 1)
    arr = (base * 32 + 16).astype(np.uint8)
    for orient in range(1, 9):
        p = os.path.join(tmp_path, f"o{orient}.jpg")
        img = PIL.fromarray(arr)
        exif = img.getexif()
        exif[0x0112] = orient
        img.save(p, quality=95, exif=exif)

        pil_img = ImageOps.exif_transpose(PIL.open(p)).convert("RGB")
        want = np.asarray(pil_img)
        got = native_loader.decode_resize(p, want.shape[0], want.shape[1])
        err = np.abs(got.astype(int) - want.astype(int))
        assert err.max() <= 24 and err.mean() < 3, (
            f"orientation {orient}: max {err.max()} mean {err.mean():.2f}")


def _splice_app1(path: str, payload: bytes) -> None:
    """Insert an extra APP1 segment right after the existing EXIF APP1."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:2] == b"\xff\xd8"
    pos = 2
    while pos < len(data):
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        if marker == 0xDA:  # SOS: entropy data follows; insert before it
            break
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        pos += 2 + ln
        if marker == 0xE1:  # first APP1 = EXIF; insert after it
            break
    seg = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    with open(path, "wb") as f:
        f.write(data[:pos] + seg + data[pos:])


def test_exif_survives_trailing_xmp_app1(tmp_path):
    """A non-EXIF APP1 (XMP, which real photos place AFTER EXIF) must not
    reset an already-parsed orientation to identity (ADVICE r2 medium)."""
    from PIL import ImageOps

    rng = np.random.default_rng(3)
    base = rng.integers(0, 8, size=(6, 4, 3)).repeat(16, 0).repeat(16, 1)
    arr = (base * 32 + 16).astype(np.uint8)
    p = os.path.join(tmp_path, "xmp.jpg")
    img = PIL.fromarray(arr)
    exif = img.getexif()
    exif[0x0112] = 6  # rotate 90 CW
    img.save(p, quality=95, exif=exif)
    _splice_app1(p, b"http://ns.adobe.com/xap/1.0/\x00" + b"<x:xmpmeta/>" * 4)

    pil_img = ImageOps.exif_transpose(PIL.open(p)).convert("RGB")
    want = np.asarray(pil_img)
    got = native_loader.decode_resize(p, want.shape[0], want.shape[1])
    err = np.abs(got.astype(int) - want.astype(int))
    assert err.max() <= 24 and err.mean() < 3, (
        f"max {err.max()} mean {err.mean():.2f}")


def test_exif_huge_ifd_offset_is_identity(tmp_path):
    """A crafted EXIF whose IFD0 offset is 0xFFFFFFFE must not wrap the
    bounds check into an OOB read (ADVICE r2 high); decode falls back to
    identity orientation."""
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, size=(32, 24, 3), dtype=np.uint8)
    p = os.path.join(tmp_path, "evil.jpg")
    PIL.fromarray(arr).save(p, quality=95)
    # "Exif\0\0" + little-endian TIFF header with IFD offset 0xFFFFFFFE.
    evil = b"Exif\x00\x00" + b"II" + b"\x2a\x00" + b"\xfe\xff\xff\xff"
    _splice_app1(p, evil)

    want = np.asarray(PIL.open(p).convert("RGB"))
    got = native_loader.decode_resize(p, want.shape[0], want.shape[1])
    assert np.abs(got.astype(int) - want.astype(int)).mean() < 1.0


def test_cmyk_jpeg_decodes_like_pil(tmp_path):
    """Adobe CMYK JPEGs decode to RGB (4-channel convert in image.cc)."""
    rng = np.random.default_rng(2)
    base = rng.integers(0, 8, size=(6, 4, 4)).repeat(16, 0).repeat(16, 1)
    arr4 = (base * 32 + 16).astype(np.uint8)
    p = os.path.join(tmp_path, "cmyk.jpg")
    PIL.fromarray(arr4, mode="CMYK").save(p, quality=95)

    want = np.asarray(PIL.open(p).convert("RGB"))
    got = native_loader.decode_resize(p, want.shape[0], want.shape[1])
    err = np.abs(got.astype(int) - want.astype(int))
    assert err.max() <= 24 and err.mean() < 3, (
        f"max {err.max()} mean {err.mean():.2f}")
