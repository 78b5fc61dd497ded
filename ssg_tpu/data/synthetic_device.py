"""On-device synthetic image rendering.

Device twin of SyntheticReID.render (ssg_tpu/data/synthetic.py): the same
image model — per-identity low-frequency palette, camera tint, geometric
jitter, pixel noise — generated entirely in HBM with jax.random. Only tiny
metadata (pids, cams, per-image keys) crosses the host boundary, which
matters in environments where host->device bandwidth is the bottleneck
(bench.py; see also the native loader for real data).

Not bit-identical to the numpy renderer (different PRNG streams); it is the
same distribution, identity-dominated and deterministic from the dataset
seed, which is what extraction/clustering benchmarks need.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ssg_tpu.data.synthetic import RAW_H, RAW_W, SyntheticReID, _seed_for


@functools.partial(jax.jit, static_argnames=("height", "width"))
def _render(palette, cam_tint, pids, cams, keys, height: int, width: int):
    """(B,) metadata -> (B, height, width, 3) uint8."""
    base_lo = palette[pids]  # (B, ph, pw, 3)
    b = base_lo.shape[0]
    base = jax.image.resize(base_lo, (b, height, width, 3), "bilinear")

    def jitter_one(img, key):
        k1, k2, k3 = jax.random.split(key, 3)
        dy = jax.random.randint(k1, (), -12, 13)
        dx = jax.random.randint(k2, (), -6, 7)
        img = jnp.roll(img, (dy, dx), axis=(0, 1))
        noise = 0.03 * jax.random.normal(k3, img.shape, jnp.float32)
        return img + noise

    img = jax.vmap(jitter_one)(base, keys)
    img = img + cam_tint[cams][:, None, None, :]
    return jnp.clip(img * 255.0, 0, 255).astype(jnp.uint8)


class DeviceRenderer:
    """Renders a SyntheticReID's items on device in fixed-size batches."""

    def __init__(self, dataset: SyntheticReID):
        self.dataset = dataset
        self.palette = jnp.asarray(dataset._palette)
        self.cam_tint = jnp.asarray(dataset._cam_tint)

    def batches(self, items, batch_size: int):
        """Yields (images_u8_on_device, pids, cams, mask) — Preprocessor's
        iteration contract, with rendering on device and tail padding."""
        items = list(items)
        for start in range(0, len(items), batch_size):
            chunk = items[start : start + batch_size]
            n = len(chunk)
            pad = batch_size - n
            chunk = chunk + [chunk[-1]] * pad
            pids = np.asarray([p for _, p, _ in chunk], dtype=np.int32)
            cams = np.asarray([c for _, _, c in chunk], dtype=np.int32)
            keys = jnp.asarray(
                [
                    jax.random.key_data(
                        jax.random.PRNGKey(
                            _seed_for(f, self.dataset.seed) % (2**31)
                        )
                    )
                    for f, _, _ in chunk
                ]
            )
            keys = jax.vmap(jax.random.wrap_key_data)(keys)
            images = _render(
                self.palette, self.cam_tint, jnp.asarray(pids),
                jnp.asarray(cams), keys, RAW_H, RAW_W,
            )
            mask = np.ones((batch_size,), dtype=bool)
            if pad:
                mask[n:] = False
            yield images, pids, cams, mask
