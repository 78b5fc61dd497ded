"""Fused ResNet bottleneck (1x1 -> 3x3 -> 1x1 + residual) — one Pallas pass.

Why this exists: the extract forward is HBM-bandwidth-bound, not
compute-bound (docs/extract_profile.md). XLA's per-conv fusions each read
the block's input from HBM, write the mid-width intermediate, read it back,
and re-read the input for the residual add — ~4x the main tensor's bytes
per bottleneck block. This kernel keeps the two mid-width intermediates in
VMEM, so a block costs exactly one input read + one output write (~2x), and
the BN affine transforms are pre-folded into the conv weights (fold_bn), so
there is no separate elementwise traffic at all.

Applies to *identity* bottlenecks (stride 1, in==out channels) — 12 of the
16 blocks in ResNet-50 and all the big-tensor ones; strided/downsample
blocks stay on XLA convs (models/fused_eval.py).

Kernel design (eval only, NHWC, bf16 activations, fp32 accumulation):
  grid = (B // TB,); per step the kernel holds an x tile (TB,H,W,C):
    y1 = relu(x @ w1 + b1)                  # 1x1 reduce, MXU
    y1p: VMEM scratch (TB, H+2, W, Cm) — y1 with zero rows top/bottom
    y2 = relu(sum_{dr,dc} shift(y1p) @ w2[dr,dc] + b2)   # 3x3 as 9 MXU dots
    out = relu(x + y2 @ w3 + b3)            # 1x1 expand + residual
  Width shifts are zero-edge concats in VMEM (exact conv padding); height
  shifts are free row slices of the padded scratch. All dots accumulate in
  fp32 (preferred_element_type), matching XLA's bf16-conv accumulation.

Reference behavior: [reid/models/resnet.py] Bottleneck eval forward
(SURVEY.md §2 #4); parity vs the Flax module in tests/test_bottleneck.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssg_tpu.ops._compat import on_tpu


def fold_bn(kernel, scale, bias, mean, var, eps=1e-5):
    """Fold an eval-mode BatchNorm into the preceding conv.

    conv(x, k) -> bn -> relu  ==  conv(x, k * s) + b  with
    s = scale / sqrt(var + eps), b = bias - mean * s. Exact in fp32; the
    folded kernel is cast to the activation dtype by the caller.

    kernel: (..., Cout); scale/bias/mean/var: (Cout,).
    """
    s = scale.astype(jnp.float32) * jax.lax.rsqrt(
        var.astype(jnp.float32) + jnp.float32(eps)
    )
    return (
        kernel.astype(jnp.float32) * s,
        bias.astype(jnp.float32) - mean.astype(jnp.float32) * s,
    )


def _shift_w(v, dc):
    """out[..., w, :] = v[..., w + dc - 1, :], zero outside — conv padding."""
    if dc == 1:
        return v
    zero = jnp.zeros_like(v[:, :, :1])
    if dc == 0:
        return jnp.concatenate([zero, v[:, :, :-1]], axis=2)
    return jnp.concatenate([v[:, :, 1:], zero], axis=2)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            out_ref, *, tb, h, w, c, cm):
    m = tb * h * w
    x = x_ref[:]  # (tb, h, w, c) bf16
    xm = x.reshape(m, c)

    y1 = jnp.dot(xm, w1_ref[:], preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 + b1_ref[:], 0.0).astype(x.dtype)
    y1p = jnp.pad(y1.reshape(tb, h, w, cm), ((0, 0), (1, 1), (0, 0), (0, 0)))

    # The three width taps concatenated channel-wise: one K=3*Cm dot per
    # row tap instead of nine K=Cm dots — measured 1.05-1.35x over the
    # 9-dot form (better MXU contraction fill, fewer shift copies).
    z = jnp.concatenate(
        [_shift_w(y1p, 0), y1p, _shift_w(y1p, 2)], axis=-1
    )  # (tb, h+2, w, 3cm)
    acc = b2_ref[:] * jnp.ones((m, 1), jnp.float32)
    for dr in range(3):
        v = z[:, dr : dr + h].reshape(m, 3 * cm)
        acc += jnp.dot(v, w2_ref[dr], preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc, 0.0).astype(x.dtype)

    y3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.float32)
    out = jnp.maximum(y3 + b3_ref[:] + xm.astype(jnp.float32), 0.0)
    out_ref[:] = out.astype(x.dtype).reshape(tb, h, w, c)


def _pick_tb(b, h, w, c, cm, budget=12 * 1024 * 1024):
    """Largest batch tile whose VMEM footprint fits the budget."""
    weights = (9 * cm * cm + 2 * c * cm) * 2 + (2 * cm + c) * 4
    for tb in (32, 16, 8, 4, 2, 1):
        if b % tb:
            continue
        io = 2 * 2 * tb * h * w * c * 2          # x + out, double-buffered
        # acc fp32 + padded y1 + the 3-tap concat z (bf16)
        live = tb * h * w * cm * 4 + tb * (h + 2) * w * cm * 2 * 4
        if weights + io + live <= budget:
            return tb
    return 1


def bottleneck_ref(x, w1, b1, w2, b2, w3, b3):
    """jnp reference of the fused block (same folded-BN math, XLA convs)."""
    dt = x.dtype
    y = jnp.maximum(jnp.einsum("bhwc,cm->bhwm", x, w1.astype(dt),
                               preferred_element_type=jnp.float32) + b1, 0.0)
    y = y.astype(dt)
    dn = jax.lax.conv_dimension_numbers(
        y.shape, (3, 3, y.shape[-1], y.shape[-1]), ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        y, w2.astype(dt), (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + b2, 0.0).astype(dt)
    y = jnp.einsum("bhwm,mc->bhwc", y, w3.astype(dt),
                   preferred_element_type=jnp.float32) + b3
    return jnp.maximum(y + x.astype(jnp.float32), 0.0).astype(dt)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, interpret: bool = False):
    """Identity bottleneck with BN pre-folded into (w, b) pairs.

    x: (B, H, W, C) activations (bf16 on TPU). w1: (C, Cm) fp32 folded,
    w2: (3, 3, Cm, Cm), w3: (Cm, C); b*: fp32 (Cout,). Returns (B, H, W, C)
    in x.dtype. Falls back to the XLA reference off-TPU.
    """
    b, h, w, c = x.shape
    if w < 3 or h < 3 or not (on_tpu() or interpret):
        # Degenerate spatial dims would give zero-size shift slices
        # (Mosaic rejects 0-size vectors); XLA handles them fine.
        return bottleneck_ref(x, w1, b1, w2, b2, w3, b3)
    cm = w1.shape[1]
    tb = _pick_tb(b, h, w, c, cm)
    dt = x.dtype
    kern = functools.partial(_kernel, tb=tb, h=h, w=w, c=c, cm=cm)
    full = lambda spec_shape: pl.BlockSpec(  # noqa: E731
        spec_shape, lambda i: (0,) * len(spec_shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full((c, cm)),
            full((1, cm)),
            full((3, 3 * cm, cm)),
            full((1, cm)),
            full((cm, c)),
            full((1, c)),
        ],
        out_specs=pl.BlockSpec((tb, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dt),
        interpret=interpret,
    )(
        x,
        w1.astype(dt), b1.reshape(1, -1).astype(jnp.float32),
        # (3,3,Cm,Cm) -> (3, 3*Cm, Cm): row tap dr major, (dc, j) flattened
        # to the contraction axis — matches the kernel's z concat order.
        w2.reshape(3, 3 * cm, cm).astype(dt),
        b2.reshape(1, -1).astype(jnp.float32),
        w3.astype(dt), b3.reshape(1, -1).astype(jnp.float32),
    )
