"""ResNet with SSG part pooling, in Flax (NHWC, bf16-ready).

TPU-native rebuild of the reference's [reid/models/resnet.py] (SURVEY.md §2
#4): a torchvision-style ResNet backbone whose conv5 feature map is pooled
three ways — whole map, upper half, lower half (spatial H split before
pooling; the core SSG trick) — each with its own embedding head.

Design choices for TPU:
  * NHWC layout (XLA TPU's native conv layout), channels-last pooling;
  * one jitted forward returns ALL part embeddings — the three heads share
    the backbone pass and XLA fuses the pools into the last conv block;
  * ``dtype`` policy: backbone compute in bf16 (MXU), params and head
    outputs fp32; set dtype=float32 + precision=HIGHEST for torch parity;
  * ``last_stride`` option (re-ID repos often use stride-1 conv5 for larger
    maps; torchvision default is 2).

Weight compatibility: module names/shapes line up 1:1 with torchvision's
ResNet via ssg_tpu.models.convert (torch state_dict -> flax variables), so
ImageNet-pretrained or reference-trained checkpoints can be imported for the
mAP parity runs (SURVEY.md §5 checkpoint row).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + residual."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32
    precision: Any = None
    fused_eval: bool = False  # route eval identity blocks through Pallas
    act_store: Any = None  # round-trip block output through this dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Eval-mode identity blocks (stride 1, matching channels) can route
        # through the fused Pallas kernel (ops/bottleneck): BatchNorms fold
        # into the conv weights and the two mid-width intermediates stay in
        # VMEM. v5e measurement (docs/extract_profile.md round-2 addendum):
        # the kernel beats XLA's conv per-block in isolation (1.2-1.8x for
        # Cm <= 256) but LOSES end to end — every XLA fusion that feeds a
        # Pallas op must emit the default layout instead of its preferred
        # tiled layout, and those boundary passes cost more than the
        # per-block wins (6.05 -> 6.1..7.0 ms/batch measured across
        # gatings). Stage-level spans (ops/bottleneck_stage.py) lose too:
        # an identity-copy Pallas splice alone costs +1.68 ms at the
        # layer1 boundary — the repacking is structural. Default OFF; the
        # kernels remain as tested primitives (full story in the profile
        # doc).
        if (
            self.fused_eval
            and not train
            and not self.is_initializing()
            and self.strides == 1
            and x.shape[-1] == 4 * self.features
        ):
            from ssg_tpu.ops.bottleneck import fold_bn, fused_bottleneck

            p = self.variables["params"]
            s = self.variables["batch_stats"]
            (w1, b1), (w2, b2), (w3, b3) = [
                fold_bn(p[c]["kernel"], p[b]["scale"], p[b]["bias"],
                        s[b]["mean"], s[b]["var"], 1e-5)
                for c, b in (("conv1", "bn1"), ("conv2", "bn2"),
                             ("conv3", "bn3"))
            ]
            return fused_bottleneck(
                x.astype(self.dtype), w1[0, 0], b1, w2, b2, w3[0, 0], b3)

        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), (s, s), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            dtype=self.dtype, precision=self.precision, name=name,
        )
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        residual = x
        y = conv(self.features, 1, 1, "conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = conv(self.features, 3, self.strides, "conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = conv(self.features * 4, 1, 1, "conv3")(y)
        y = bn("bn3")(y)
        if residual.shape != y.shape:
            residual = conv(self.features * 4, 1, self.strides, "downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        y = nn.relu(y + residual)
        if self.act_store is not None:
            # Guarded bandwidth experiment (docs/train_profile.md): store
            # the block-boundary activation in a narrower dtype (e.g.
            # float8_e4m3fn) so the tensor XLA materializes between block
            # fusions — and saves for the backward — carries half the bf16
            # bytes. Compute stays bf16; only the residual-trunk storage
            # quantizes. The barrier pins the narrow tensor as the value
            # crossing the fusion boundary (otherwise XLA may fuse both
            # converts into one side and materialize bf16 anyway).
            y = jax.lax.optimization_barrier(y.astype(self.act_store))
            y = y.astype(self.dtype)
        return y


class BasicBlock(nn.Module):
    """torchvision BasicBlock (resnet18/34): 3x3 -> 3x3 + residual."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32
    precision: Any = None
    fused_eval: bool = False  # accepted for interface parity; unused

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), (s, s), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            dtype=self.dtype, precision=self.precision, name=name,
        )
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        residual = x
        y = conv(self.features, 3, self.strides, "conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = conv(self.features, 3, 1, "conv2")(y)
        y = bn("bn2")(y)
        if residual.shape != y.shape:
            residual = conv(self.features, 1, self.strides, "downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


def stem_conv_apply(x, kernel, dtype, precision=None, s2d=False):
    """The 7x7/s2 stem conv math (kernel: (7, 7, 3, 64)), as a plain
    function so non-module callers (perf experiments) can reuse it."""
    x = x.astype(dtype)  # nn.Conv's input promotion, made explicit
    b, h, w, _ = x.shape
    if not (s2d and h % 2 == 0 and w % 2 == 0):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        return jax.lax.conv_general_dilated(
            x, kernel.astype(dtype), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=dn, precision=precision,
        )
    # out[p] = sum_{u} k[u] x[2p+u-3]; with u-3 = 2a+d (a in -2..1,
    # d in {0,1}) this is a 4-tap conv over the d-indexed s2d planes
    # with asymmetric padding (2, 1). Exactness test: test_models.
    kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k2 = kp.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
    k2 = k2.reshape(4, 4, 12, 64)
    z = x.reshape(b, h // 2, 2, w // 2, 2, 3)
    z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 12)
    dn = jax.lax.conv_dimension_numbers(
        z.shape, k2.shape, ("NHWC", "HWIO", "NHWC")
    )
    return jax.lax.conv_general_dilated(
        z, k2.astype(dtype), (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=dn, precision=precision,
    )


class StemConv(nn.Module):
    """The 7x7/s2 stem conv, with an optional space-to-depth evaluation.

    A 3-channel 7x7 conv wastes most of the MXU's contraction lanes (the
    K dim pads 3 -> 8+). The mathematically exact rewrite (MLPerf ResNet
    trick): 2x2 space-to-depth the input (12 channels) and evaluate a 4x4
    stride-1 conv whose kernel is the zero-front-padded 7x7 kernel
    reshaped — same multiply-adds, 4x better channel occupancy. The
    parameter stays the canonical (7, 7, 3, 64) kernel at the torchvision
    path (backbone/conv1/kernel), so checkpoint conversion is unaffected.
    """

    dtype: Any = jnp.float32
    precision: Any = None
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 3, 64),
            jnp.float32,
        )
        return stem_conv_apply(x, kernel, self.dtype, self.precision,
                               self.s2d)


class ResNetBackbone(nn.Module):
    stage_sizes: Sequence[int]
    block: ModuleDef = Bottleneck
    last_stride: int = 2
    dtype: Any = jnp.float32
    precision: Any = None
    stem_s2d: bool | None = None  # None: on for TPU backends
    fused_eval: bool = False  # fused identity bottlenecks (Bottleneck only)
    act_store: Any = None  # narrow block-boundary storage dtype (experiment)

    @nn.compact
    def __call__(self, x, train: bool = False):
        s2d = self.stem_s2d
        if s2d is None:
            from ssg_tpu.ops._compat import on_tpu

            s2d = on_tpu()
        x = StemConv(
            dtype=self.dtype, precision=self.precision, s2d=s2d, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, num_blocks in enumerate(self.stage_sizes):
            stage_stride = 1 if stage == 0 else (
                self.last_stride if stage == len(self.stage_sizes) - 1 else 2
            )
            for blk in range(num_blocks):
                kw = {"act_store": self.act_store} \
                    if self.block is Bottleneck else {}
                x = self.block(
                    features=64 * 2**stage,
                    strides=stage_stride if blk == 0 else 1,
                    dtype=self.dtype,
                    precision=self.precision,
                    fused_eval=self.fused_eval,
                    name=f"layer{stage + 1}_{blk}",
                    **kw,
                )(x, train=train)
        return x  # (B, h, w, C) conv5 feature map


# SSG part groupings: whole map, upper half, lower half (SURVEY.md §2 #4).
PART_NAMES = ("whole", "up", "down")


class SSGResNet(nn.Module):
    """ResNet backbone + SSG multi-part pooling heads.

    Returns a dict:
      ``embeddings``: (num_parts, B, num_features) — raw in train mode
        (triplet loss input), L2-normalized in eval mode (the reference's
        eval behavior);
      ``logits``: (num_parts, B, num_classes) if num_classes > 0.
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    block: ModuleDef = Bottleneck
    num_features: int = 0  # 0 -> use pooled backbone channels directly
    dropout: float = 0.0
    num_classes: int = 0
    num_parts: int = 3
    norm: bool = True  # L2-normalize embeddings in eval mode
    last_stride: int = 2
    dtype: Any = jnp.float32
    precision: Any = None
    stem_s2d: bool | None = None  # space-to-depth stem (None: on for TPU)
    fused_eval: bool = False  # fused identity bottlenecks at eval (see Bottleneck)
    act_store: Any = None  # narrow block-boundary storage dtype (experiment)

    @nn.compact
    def __call__(self, x, train: bool = False):
        fmap = ResNetBackbone(
            stage_sizes=self.stage_sizes, block=self.block,
            last_stride=self.last_stride, dtype=self.dtype,
            precision=self.precision, stem_s2d=self.stem_s2d,
            fused_eval=self.fused_eval, act_store=self.act_store,
            name="backbone",
        )(x, train=train)
        h = fmap.shape[1]
        # max(h//2, 1): a height-1 conv5 map (tiny inputs) would make the
        # upper slice empty -> mean 0/0 -> NaN poisoning the whole step
        # (caught by tests/test_sanitizers.py); both halves collapse to the
        # whole row instead. Unchanged for h >= 2.
        pools = [
            jnp.mean(fmap, axis=(1, 2)),  # whole
            jnp.mean(fmap[:, : max(h // 2, 1)], axis=(1, 2)),  # upper body
            jnp.mean(fmap[:, h // 2 :], axis=(1, 2)),  # lower body
        ][: self.num_parts]

        embeddings, logits = [], []
        for part, pooled in zip(PART_NAMES, pools):
            y = pooled.astype(jnp.float32)
            if self.num_features > 0:
                y = nn.Dense(
                    self.num_features, dtype=jnp.float32, name=f"feat_{part}"
                )(y)
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
                    nn.Dense(
                        self.num_classes, dtype=jnp.float32,
                        name=f"classifier_{part}",
                    )(y)
                )
            embeddings.append(emb)

        out = {"embeddings": jnp.stack(embeddings)}
        if logits:
            out["logits"] = jnp.stack(logits)
        return out


def _make(stage_sizes, block):
    def ctor(**kwargs):
        return SSGResNet(stage_sizes=stage_sizes, block=block, **kwargs)

    return ctor


resnet18 = _make((2, 2, 2, 2), BasicBlock)
resnet34 = _make((3, 4, 6, 3), BasicBlock)
resnet50 = _make((3, 4, 6, 3), Bottleneck)
resnet101 = _make((3, 4, 23, 3), Bottleneck)
resnet152 = _make((3, 8, 36, 3), Bottleneck)
