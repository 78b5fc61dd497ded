"""Batched preprocessor: dataset items -> device-ready uint8 batches.

Mirrors the reference's ``Preprocessor`` ([reid/utils/data/preprocessor.py],
SURVEY.md §2 #12) but batch-at-a-time: renders/decodes a whole batch of
images to one contiguous uint8 array on host, pads the tail batch to a static
size (jit-friendly), and leaves resize/augment/normalize to the on-device
transforms (ssg_tpu/data/transforms.py).
"""

from __future__ import annotations

import numpy as np


class Preprocessor:
    """Iterable over fixed-size batches of (images_u8, pids, camids, mask).

    ``mask`` marks real (non-padding) rows in the tail batch; downstream
    feature consumers drop padded rows on host after extraction.
    """

    def __init__(self, dataset, items=None, batch_size: int = 64):
        self.dataset = dataset
        self.items = list(items if items is not None else dataset.train)
        self.batch_size = batch_size

    def __len__(self) -> int:
        return (len(self.items) + self.batch_size - 1) // self.batch_size

    @property
    def fnames(self) -> list[str]:
        return [f for f, _, _ in self.items]

    def gather(self, indices: np.ndarray):
        """Render an arbitrary index batch (for P x K training batches)."""
        chosen = [self.items[int(i)] for i in indices]
        fnames = [f for f, _, _ in chosen]
        pids = np.asarray([p for _, p, _ in chosen], dtype=np.int32)
        cams = np.asarray([c for _, _, c in chosen], dtype=np.int32)
        return self.dataset.render(fnames), pids, cams

    def __iter__(self):
        stream = self._native_stream()
        if stream is not None:
            yield from stream
            return
        bs = self.batch_size
        for start in range(0, len(self.items), bs):
            chunk = self.items[start : start + bs]
            n = len(chunk)
            fnames = [f for f, _, _ in chunk]
            images = self.dataset.render(fnames)
            pids = np.asarray([p for _, p, _ in chunk], dtype=np.int32)
            cams = np.asarray([c for _, _, c in chunk], dtype=np.int32)
            mask = np.ones((bs,), dtype=bool)
            if n < bs:  # pad tail to static shape
                pad = bs - n
                images = np.concatenate([images, np.repeat(images[-1:], pad, 0)], 0)
                pids = np.concatenate([pids, np.repeat(pids[-1:], pad)], 0)
                cams = np.concatenate([cams, np.repeat(cams[-1:], pad)], 0)
                mask[n:] = False
            yield images, pids, cams, mask

    def _native_stream(self):
        """Background-prefetching iteration for on-disk datasets: the C++
        loader (native/ssg_data) decodes batch i+1 while batch i is on the
        device — the reference's DataLoader-worker overlap, without worker
        processes."""
        import os

        from ssg_tpu.data import native_loader

        images_dir = getattr(self.dataset, "images_dir", None)
        if images_dir is None or not native_loader.is_available():
            return None
        from ssg_tpu.data.synthetic import RAW_H, RAW_W

        paths = [os.path.join(images_dir, f) for f, _, _ in self.items]
        bs = self.batch_size
        loader = native_loader.BatchLoader(paths, batch_size=bs,
                                           height=RAW_H, width=RAW_W)

        def gen():
            try:
                for start, (images, valid) in zip(
                    range(0, len(self.items), bs), loader
                ):
                    chunk = self.items[start : start + bs]
                    chunk = chunk + [chunk[-1]] * (bs - len(chunk))
                    pids = np.asarray([p for _, p, _ in chunk], dtype=np.int32)
                    cams = np.asarray([c for _, _, c in chunk], dtype=np.int32)
                    mask = np.ones((bs,), dtype=bool)
                    mask[valid:] = False
                    yield images, pids, cams, mask
            finally:
                loader.close()

        return gen()
