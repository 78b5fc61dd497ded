"""Single-batch CNN feature extraction.

Mirrors the reference's ``extract_cnn_feature(model, inputs)``
([reid/feature_extraction/cnn.py], SURVEY.md §2 #9): eval-mode, no-grad
forward returning the (multi-branch) embeddings. Here that is one jitted
apply — normalization fuses into the conv stack, inputs are uint8 HWC
batches, and the embeddings land as a (num_parts, B, F) array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ssg_tpu.data import transforms


@functools.partial(jax.jit, static_argnames=("apply_fn",))
def _forward(apply_fn, variables, images_u8):
    x = transforms.test_transform(images_u8)
    return apply_fn(variables, x, train=False)["embeddings"]


def extract_cnn_feature(model, variables, inputs) -> jax.Array:
    """inputs: (B, H, W, 3) uint8 (raw) or float (already transformed
    upstream is NOT supported — pass raw uint8; the transform is fused).
    Returns (num_parts, B, F) L2-normalized embeddings, still on device."""
    images = jnp.asarray(inputs)
    if images.dtype != jnp.uint8:
        raise TypeError("extract_cnn_feature expects raw uint8 HWC batches")
    return _forward(model.apply, variables, images)
