"""On-device, batch-vectorized image transforms (JAX).

TPU-first replacement for the reference's per-image PIL transforms in
[reid/utils/data/transforms.py] (SURVEY.md §2 #12): ``RectScale`` (plain
resize, test time) and ``RandomSizedRectCrop`` + horizontal flip (train time),
followed by ImageNet normalization. Here the whole batch is transformed inside
one jitted graph: random resized crops are expressed as
``jax.image.scale_and_translate`` (static output shape, dynamic crop box), so
XLA fuses decode-side normalization with the first conv.

Input convention: uint8 (B, H, W, 3) NHWC batches at the canonical raw size;
output float (B, H, W, 3), ImageNet-normalized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], dtype=jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], dtype=jnp.float32)


def normalize(images_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 (B, H, W, 3) -> ImageNet-normalized float (B, H, W, 3)."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x.astype(dtype)


def rect_scale(images: jax.Array, height: int, width: int) -> jax.Array:
    """Plain bilinear resize (the reference's RectScale, test transform)."""
    b, _, _, c = images.shape
    return jax.image.resize(images, (b, height, width, c), method="bilinear")


def _crop_one(img, key, out_h, out_w):
    """Random area/aspect crop of one (H, W, 3) image, resized to out size."""
    h, w, _ = img.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = jax.random.uniform(k1, (), minval=0.64, maxval=1.0) * (h * w)
    # Reference samples aspect ratio (h/w) in [2, 3].
    aspect = jax.random.uniform(k2, (), minval=2.0, maxval=3.0)
    crop_h = jnp.sqrt(area * aspect)
    crop_w = jnp.sqrt(area / aspect)
    crop_h = jnp.clip(crop_h, 1.0, h)
    crop_w = jnp.clip(crop_w, 1.0, w)
    y0 = jax.random.uniform(k3, (), minval=0.0, maxval=1.0) * (h - crop_h)
    x0 = jax.random.uniform(k4, (), minval=0.0, maxval=1.0) * (w - crop_w)
    scale = jnp.stack([out_h / crop_h, out_w / crop_w])
    translation = jnp.stack([-y0 * out_h / crop_h, -x0 * out_w / crop_w])
    return jax.image.scale_and_translate(
        img.astype(jnp.float32),
        (out_h, out_w, img.shape[-1]),
        (0, 1),
        scale,
        translation,
        method="bilinear",
    )


def random_sized_rect_crop(
    key: jax.Array, images: jax.Array, height: int, width: int
) -> jax.Array:
    """Batched RandomSizedRectCrop, vmapped over the batch."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda im, k: _crop_one(im, k, height, width))(images, keys)


def random_horizontal_flip(key: jax.Array, images: jax.Array) -> jax.Array:
    flips = jax.random.bernoulli(key, 0.5, (images.shape[0],))
    return jnp.where(flips[:, None, None, None], images[:, :, ::-1, :], images)


def train_transform(
    key: jax.Array, images_u8: jax.Array, height: int = 256, width: int = 128,
    dtype=jnp.float32,
) -> jax.Array:
    """Full train-time pipeline: random crop -> flip -> normalize."""
    k1, k2 = jax.random.split(key)
    x = random_sized_rect_crop(k1, images_u8.astype(jnp.float32), height, width)
    x = random_horizontal_flip(k2, x)
    x = x / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x.astype(dtype)


def test_transform(
    images_u8: jax.Array, height: int = 256, width: int = 128, dtype=jnp.float32
) -> jax.Array:
    """Test-time pipeline: resize (if needed) -> normalize."""
    x = images_u8
    if x.shape[1] != height or x.shape[2] != width:
        x = rect_scale(x.astype(jnp.float32), height, width)
    return normalize(x, dtype=dtype) if x.dtype == jnp.uint8 else (
        ((x / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
    ).astype(dtype)
