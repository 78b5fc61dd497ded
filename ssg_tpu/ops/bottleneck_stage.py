"""Whole-stage fused ResNet bottleneck run — one Pallas span per stage.

docs/extract_profile.md (round-2 addendum) measured that single-block
Pallas splicing loses end to end: every XLA fusion feeding a Pallas op
must emit the default layout, and the boundary repacking outweighs the
per-block wins. The shape that amortizes the boundaries is ONE kernel per
stage: the strided/downsample first block plus the identity run execute
back-to-back in VMEM, entered and exited once.

Kernel structure (eval only, NHWC, bf16 activations, fp32 accumulation),
grid over batch tiles:

  block 0 (stride s in {1, 2}, with 1x1 downsample residual):
    y1 = relu(x @ w1 + b1)                       # full-res 1x1 (as torch)
    y2 = relu(conv3x3_s(y1) + b2)                # s=2 via width/row pairs
    y  = relu(y2 @ w3 + b3 + (strided x) @ wd + bd)
  blocks 1..n-1 (identity): the ops/bottleneck.py body inline.

The stride-2 3x3 uses the pair trick: reshaping width into (W/2, 2*Cm)
makes the three column taps *channel slices* of the pair tensor (offsets
at multiples of Cm — aligned), and row taps become row-pair slot selects;
no sublane-granularity shifts at all.

BN is pre-folded into every conv (ops/bottleneck.fold_bn). Parity vs the
Flax module graph in tests/test_bottleneck.py.

Reference behavior: [reid/models/resnet.py] Bottleneck stages
(SURVEY.md §2 #4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssg_tpu.ops._compat import on_tpu
from ssg_tpu.ops.bottleneck import _shift_w, bottleneck_ref


def _identity_body(x, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                   *, tb, h, w, c, cm):
    """One identity bottleneck on a (tb, h, w, c) VMEM value (fp32-accum
    dots, bf16 between) — same math as ops/bottleneck._kernel."""
    m = tb * h * w
    xm = x.reshape(m, c)
    y1 = jnp.dot(xm, w1_ref[:], preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 + b1_ref[:], 0.0).astype(x.dtype)
    y1p = jnp.pad(y1.reshape(tb, h, w, cm), ((0, 0), (1, 1), (0, 0), (0, 0)))
    z = jnp.concatenate([_shift_w(y1p, 0), y1p, _shift_w(y1p, 2)], axis=-1)
    acc = b2_ref[:] * jnp.ones((m, 1), jnp.float32)
    for dr in range(3):
        v = z[:, dr : dr + h].reshape(m, 3 * cm)
        acc += jnp.dot(v, w2_ref[dr], preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc, 0.0).astype(x.dtype)
    y3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.float32)
    out = jnp.maximum(y3 + b3_ref[:] + xm.astype(jnp.float32), 0.0)
    return out.astype(x.dtype).reshape(tb, h, w, c)


def _downsample_body_s1(x, refs, *, tb, h, w, c, cm):
    """Block 0 with stride 1 + 1x1 downsample (ResNet-50 layer1_0)."""
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, wd_ref, bd_ref = refs
    m = tb * h * w
    cout = w3_ref.shape[1]
    xm = x.reshape(m, c)
    y1 = jnp.dot(xm, w1_ref[:], preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 + b1_ref[:], 0.0).astype(x.dtype)
    y1p = jnp.pad(y1.reshape(tb, h, w, cm), ((0, 0), (1, 1), (0, 0), (0, 0)))
    z = jnp.concatenate([_shift_w(y1p, 0), y1p, _shift_w(y1p, 2)], axis=-1)
    acc = b2_ref[:] * jnp.ones((m, 1), jnp.float32)
    for dr in range(3):
        v = z[:, dr : dr + h].reshape(m, 3 * cm)
        acc += jnp.dot(v, w2_ref[dr], preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc, 0.0).astype(x.dtype)
    y3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.float32)
    res = jnp.dot(xm, wd_ref[:], preferred_element_type=jnp.float32)
    out = jnp.maximum(y3 + b3_ref[:] + res + bd_ref[:], 0.0)
    return out.astype(x.dtype).reshape(tb, h, w, cout)


def _downsample_body_s2(x, refs, *, tb, h, w, c, cm):
    """Block 0 with stride 2 + 1x1/s2 downsample (layers 2-4 first block).

    Width pairs: (tb, h, w, cm) -> (tb, h, w/2, 2cm); the three column
    taps 2w2+dc-1 are then channel slices (odd of pair w2-1 | even of w2 |
    odd of w2). Row taps 2h2+dr-1 (+1 pad offset) are slots of row pairs.
    """
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, wd_ref, bd_ref = refs
    assert h % 2 == 0 and w % 2 == 0
    h2, w2 = h // 2, w // 2
    m2 = tb * h2 * w2
    cout = w3_ref.shape[1]

    xm = x.reshape(tb * h * w, c)
    y1 = jnp.dot(xm, w1_ref[:], preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 + b1_ref[:], 0.0).astype(x.dtype)
    # Pad rows by 1 top/bottom -> h+2 rows; pair them: (tb, h2+1, 2, ...).
    y1p = jnp.pad(y1.reshape(tb, h, w, cm), ((0, 0), (1, 1), (0, 0), (0, 0)))
    rp = y1p.reshape(tb, h2 + 1, 2, w, cm)
    # Row variants for dr in 0..2: padded row index 2*h2_out + dr.
    row_vars = (
        rp[:, :h2, 0],   # dr=0: pair p, slot 0
        rp[:, :h2, 1],   # dr=1: pair p, slot 1
        rp[:, 1:, 0],    # dr=2: pair p+1, slot 0
    )
    acc = b2_ref[:] * jnp.ones((m2, 1), jnp.float32)
    for dr, rows in enumerate(row_vars):
        pairs = rows.reshape(tb, h2, w2, 2 * cm)
        prev = jnp.concatenate(
            [jnp.zeros_like(pairs[:, :, :1]), pairs[:, :, :-1]], axis=2)
        zc = jnp.concatenate(
            [prev[..., cm:], pairs[..., :cm], pairs[..., cm:]], axis=-1)
        acc += jnp.dot(zc.reshape(m2, 3 * cm), w2_ref[dr],
                       preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc, 0.0).astype(x.dtype)
    y3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.float32)
    # Strided residual: even rows / even columns of x.
    xs = x.reshape(tb, h2, 2, w2, 2, c)[:, :, 0, :, 0, :].reshape(m2, c)
    res = jnp.dot(xs, wd_ref[:], preferred_element_type=jnp.float32)
    out = jnp.maximum(y3 + b3_ref[:] + res + bd_ref[:], 0.0)
    return out.astype(x.dtype).reshape(tb, h2, w2, cout)


def _stage_kernel(*refs, tb, h, w, c, cm, stride, n_identity, has_ds):
    x_ref = refs[0]
    out_ref = refs[-1]
    wrefs = refs[1:-1]
    y = x_ref[:]
    i = 0
    if has_ds:
        body = _downsample_body_s2 if stride == 2 else _downsample_body_s1
        y = body(y, wrefs[0:8], tb=tb, h=h, w=w, c=c, cm=cm)
        i = 8
    ho, wo = y.shape[1], y.shape[2]
    cout = y.shape[3]
    for _ in range(n_identity):
        y = _identity_body(y, *wrefs[i : i + 6], tb=tb, h=ho, w=wo, c=cout,
                           cm=cm)
        i += 6
    out_ref[:] = y


def stage_ref(x, blocks, stride):
    """XLA reference: the same folded-BN stage math, block by block."""
    dt = x.dtype
    first = True
    for blk in blocks:
        if len(blk) == 8:
            w1, b1, w2, b2, w3, b3, wd, bd = blk
            s = stride if first else 1
            y = jnp.maximum(
                jnp.einsum("bhwc,cm->bhwm", x, w1.astype(dt),
                           preferred_element_type=jnp.float32) + b1, 0.0
            ).astype(dt)
            dn = jax.lax.conv_dimension_numbers(
                y.shape, (3, 3, y.shape[-1], y.shape[-1]),
                ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                y, w2.astype(dt), (s, s), [(1, 1), (1, 1)],
                dimension_numbers=dn, preferred_element_type=jnp.float32)
            y = jnp.maximum(y + b2, 0.0).astype(dt)
            y = jnp.einsum("bhwm,mc->bhwc", y, w3.astype(dt),
                           preferred_element_type=jnp.float32) + b3
            res = x[:, ::s, ::s, :]
            res = jnp.einsum("bhwc,cd->bhwd", res, wd.astype(dt),
                             preferred_element_type=jnp.float32) + bd
            x = jnp.maximum(y + res, 0.0).astype(dt)
        else:
            x = bottleneck_ref(x, *blk)
        first = False
    return x


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def fused_bottleneck_stage(x, blocks, stride: int = 1,
                           interpret: bool = False):
    """Run a whole bottleneck stage (block 0 maybe strided + downsample,
    then identity blocks) as one Pallas span.

    blocks: tuple of weight tuples — 8-tuple (w1,b1,w2,b2,w3,b3,wd,bd) for
    a downsample block (must be first if present), 6-tuple for identity.
    All BN pre-folded; w1/w3/wd passed as 2-D (Cin, Cout); w2 as
    (3, 3, Cm, Cm). Falls back to the XLA reference off-TPU.
    """
    b, h, w, c = x.shape
    has_ds = len(blocks[0]) == 8
    if (w < 4 or h < 4 or not (on_tpu() or interpret)
            or (stride == 2 and (h % 2 or w % 2))):
        return stage_ref(x, blocks, stride)
    cm = blocks[0][0].shape[-1]
    cout = blocks[0][4].shape[-1] if has_ds else c
    ho, wo = (h // stride, w // stride)
    dt = x.dtype

    # Batch tile: largest that keeps IO tiles + weights + transients under
    # a conservative VMEM budget.
    wbytes = sum(int(jnp.size(a)) * 2 for blk in blocks for a in blk)
    tb = 1
    for cand in (16, 8, 4, 2, 1):
        if b % cand:
            continue
        io = 2 * 2 * cand * (h * w * c + ho * wo * cout)
        live = cand * h * w * cm * 16
        if wbytes + io + live <= 13 * 1024 * 1024:
            tb = cand
            break

    n_identity = len(blocks) - (1 if has_ds else 0)
    kern = functools.partial(
        _stage_kernel, tb=tb, h=h, w=w, c=c, cm=cm, stride=stride,
        n_identity=n_identity, has_ds=has_ds)

    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, _s=len(shape): (0,) * _s, memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((tb, h, w, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [x]
    for blk in blocks:
        if len(blk) == 8:
            w1, b1, w2, b2, w3, b3, wd, bd = blk
            flat = [
                w1.astype(dt), b1.reshape(1, -1).astype(jnp.float32),
                w2.reshape(3, 3 * cm, cm).astype(dt),
                b2.reshape(1, -1).astype(jnp.float32),
                w3.astype(dt), b3.reshape(1, -1).astype(jnp.float32),
                wd.astype(dt), bd.reshape(1, -1).astype(jnp.float32),
            ]
        else:
            w1, b1, w2, b2, w3, b3 = blk
            flat = [
                w1.astype(dt), b1.reshape(1, -1).astype(jnp.float32),
                w2.reshape(3, 3 * cm, cm).astype(dt),
                b2.reshape(1, -1).astype(jnp.float32),
                w3.astype(dt), b3.reshape(1, -1).astype(jnp.float32),
            ]
        for a in flat:
            in_specs.append(full(a.shape))
            args.append(a)

    return pl.pallas_call(
        kern,
        grid=(b // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, ho, wo, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, cout), dt),
        interpret=interpret,
    )(*args)
