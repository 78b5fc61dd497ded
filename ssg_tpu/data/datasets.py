"""Dataset factory, mirroring the reference's ``datasets.create`` surface.

Reference behavior ([reid/datasets/__init__.py], SURVEY.md §2 #11): each
dataset object exposes ``.train / .query / .gallery`` as ``(fname, pid,
camid)`` triplets plus ``num_train_ids``.

Two backends:
  * ``DirectoryReID`` — real data on disk in the open-reid layout
    (``<root>/images/{pid:08d}_{camid:02d}_*.jpg`` plus optional
    ``splits.json``); images decoded with PIL at batch-render time.
  * ``SyntheticReID`` — deterministic synthetic data (no network in this
    environment; see ssg_tpu/data/synthetic.py).

``create(name, root)`` picks DirectoryReID when the root exists and contains
images, otherwise falls back to a synthetic dataset shaped like the named
benchmark (sizes scaled by ``scale``).
"""

from __future__ import annotations

import json
import os

import numpy as np

from ssg_tpu.data import native_loader
from ssg_tpu.data.synthetic import RAW_H, RAW_W, SyntheticReID

# (train_ids, test_ids, cams) of the real benchmarks — used to shape the
# synthetic stand-ins. Sizes: SURVEY.md §0 [HIGH].
_BENCHMARKS = {
    "market1501": dict(train_ids=751, test_ids=750, cams=6),
    "dukemtmc": dict(train_ids=702, test_ids=702, cams=8),
    "msmt17": dict(train_ids=1041, test_ids=3060, cams=15),
    "cuhk03": dict(train_ids=1367, test_ids=100, cams=2),
}

_SCALES = {
    "tiny": 0.02,  # unit tests
    "small": 0.1,  # integration tests / single-chip dev
    "full": 1.0,
}


class DirectoryReID:
    """Open-reid directory layout: images named {pid:08d}_{camid:02d}_*.jpg."""

    def __init__(self, name: str, root: str, split_id: int = 0):
        self.name = name
        self.root = root
        self.images_dir = os.path.join(root, "images")
        splits_path = os.path.join(root, "splits.json")
        if os.path.exists(splits_path):
            with open(splits_path) as f:
                splits = json.load(f)
            if not 0 <= split_id < len(splits):
                raise ValueError(
                    f"split_id {split_id} out of range ({len(splits)} splits)"
                )
            split = splits[split_id]
            self.train = [tuple(x) for x in split["train"]]
            self.query = [tuple(x) for x in split["query"]]
            self.gallery = [tuple(x) for x in split["gallery"]]
        else:
            # Single-split fallback: everything is train.
            items = []
            for fname in sorted(os.listdir(self.images_dir)):
                if not fname.endswith((".jpg", ".png")):
                    continue
                pid = int(fname[:8])
                cam = int(fname[9:11])
                items.append((fname, pid, cam))
            self.train, self.query, self.gallery = items, [], []
        self.num_train_ids = len({pid for _, pid, _ in self.train})

    def render(self, fnames: list[str]) -> np.ndarray:
        paths = [os.path.join(self.images_dir, f) for f in fnames]
        if native_loader.is_available():
            # Native threaded decode+resize (C++, native/ssg_data).
            return native_loader.load_batch(paths, RAW_H, RAW_W)
        from PIL import Image

        out = np.empty((len(fnames), RAW_H, RAW_W, 3), dtype=np.uint8)
        for b, path in enumerate(paths):
            img = Image.open(path).convert("RGB")
            img = img.resize((RAW_W, RAW_H), Image.BILINEAR)
            out[b] = np.asarray(img, dtype=np.uint8)
        return out


def names() -> list[str]:
    return sorted(_BENCHMARKS)


def create(name: str, root: str | None = None, scale: str = "small", seed: int = 0,
           split_id: int = 0, **kw):
    """Create a dataset. Uses real data at ``root`` when present, else a
    deterministic synthetic stand-in shaped like the named benchmark.
    ``split_id`` selects among multiple splits.json entries (open-reid
    convention, SURVEY.md §2 #11)."""
    if root is not None and os.path.isdir(os.path.join(root, "images")):
        return DirectoryReID(name, root, split_id=split_id)
    if name not in _BENCHMARKS:
        raise KeyError(f"Unknown dataset: {name!r}; known: {names()}")
    bench = _BENCHMARKS[name]
    frac = _SCALES.get(scale, None)
    if frac is None:
        frac = float(scale)
    return SyntheticReID(
        name=name,
        num_train_ids=max(8, int(bench["train_ids"] * frac)),
        num_test_ids=max(8, int(bench["test_ids"] * frac)),
        cams=bench["cams"],
        seed=seed,
        **kw,
    )
