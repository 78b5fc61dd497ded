"""InceptionNet with SSG part pooling, in Flax (NHWC).

The open-reid family ships a compact inception next to ResNet
([reid/models/inception.py], SURVEY.md §2 #3 — tagged [LOW], present for
surface parity): a conv stem followed by inception blocks mixing 1x1 / 3x3 /
double-3x3 / pooled branches, ending in the same embedding head stack.

This rebuild keeps the SSG multi-part contract (whole / upper / lower pooled
embeddings from the last feature map — see ssg_tpu/models/resnet.py) so the
architecture drops into the extract -> cluster -> triplet pipeline unchanged.
All branch convs run in the module dtype (bf16 on TPU); heads stay fp32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ssg_tpu.models.resnet import PART_NAMES


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        x = nn.Conv(
            self.features, (k, k), (self.strides, self.strides),
            padding=[(k // 2, k // 2)] * 2, use_bias=False, dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)
        return nn.relu(x)


class InceptionBlock(nn.Module):
    """Four branches concatenated: 1x1, 3x3, double 3x3, avg-pool + 1x1.
    ``strides=2`` downsamples (the pool branch switches to max-pool)."""

    features: int  # per-branch width
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f, s = self.features, self.strides
        branches = []
        if s == 1:
            branches.append(_ConvBN(f, 1, 1, self.dtype, name="b1x1")(x, train))
        y = _ConvBN(f, 1, 1, self.dtype, name="b3x3_reduce")(x, train)
        branches.append(_ConvBN(f, 3, s, self.dtype, name="b3x3")(y, train))
        y = _ConvBN(f, 1, 1, self.dtype, name="bdbl_reduce")(x, train)
        y = _ConvBN(f, 3, 1, self.dtype, name="bdbl_1")(y, train)
        branches.append(_ConvBN(f, 3, s, self.dtype, name="bdbl_2")(y, train))
        if s == 1:
            p = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])
            branches.append(_ConvBN(f, 1, 1, self.dtype, name="bpool")(p, train))
        else:
            branches.append(
                nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
            )
        return jnp.concatenate(branches, axis=-1)


class SSGInception(nn.Module):
    """Inception backbone + SSG multi-part heads (same output contract as
    SSGResNet: dict with 'embeddings' (num_parts, B, F) and optional
    'logits')."""

    depth: int = 8  # inception blocks after the stem
    width: int = 64  # base per-branch width
    num_features: int = 0
    dropout: float = 0.0
    num_classes: int = 0
    num_parts: int = 3
    norm: bool = True
    dtype: Any = jnp.float32
    precision: Any = None  # accepted for factory-signature parity

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Stem: /4 spatial.
        x = _ConvBN(32, 3, 2, self.dtype, name="stem1")(x, train)
        x = _ConvBN(32, 3, 1, self.dtype, name="stem2")(x, train)
        x = _ConvBN(64, 3, 1, self.dtype, name="stem3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        width = self.width
        for i in range(self.depth):
            downsample = i in (self.depth // 3, 2 * self.depth // 3)
            if downsample:
                width *= 2
            x = InceptionBlock(
                features=width, strides=2 if downsample else 1,
                dtype=self.dtype, name=f"block{i}",
            )(x, train)

        h = x.shape[1]
        pools = [
            jnp.mean(x, axis=(1, 2)),
            jnp.mean(x[:, : h // 2], axis=(1, 2)),
            jnp.mean(x[:, h // 2 :], axis=(1, 2)),
        ][: self.num_parts]

        embeddings, logits = [], []
        for part, pooled in zip(PART_NAMES, pools):
            y = pooled.astype(jnp.float32)
            if self.num_features > 0:
                y = nn.Dense(self.num_features, dtype=jnp.float32,
                             name=f"feat_{part}")(y)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name=f"feat_bn_{part}",
            )(y)
            emb = y
            if not train and self.norm:
                emb = emb / jnp.maximum(
                    jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12
                )
            if self.dropout > 0:
                y = nn.Dropout(self.dropout, deterministic=not train)(y)
            if self.num_classes > 0:
                logits.append(
                    nn.Dense(self.num_classes, dtype=jnp.float32,
                             name=f"classifier_{part}")(y)
                )
            embeddings.append(emb)

        out = {"embeddings": jnp.stack(embeddings)}
        if logits:
            out["logits"] = jnp.stack(logits)
        return out


def inception(**kwargs):
    kwargs.pop("last_stride", None)  # resnet-only knob, accepted for parity
    return SSGInception(**kwargs)
