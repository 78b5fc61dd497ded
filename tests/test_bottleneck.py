"""Fused bottleneck kernel (ops/bottleneck) + in-module fused_eval path.

Parity targets: the pure-XLA reference implementation of the folded block
(bottleneck_ref) and the unfused Flax module graph. On CPU the Pallas
kernel runs in interpret mode (exact) or falls back to bottleneck_ref.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssg_tpu import models
from ssg_tpu.ops.bottleneck import (
    bottleneck_ref,
    fold_bn,
    fused_bottleneck,
)


def _block_args(key, b=4, h=8, w=6, c=64, cm=16, dtype=jnp.float32):
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (b, h, w, c), dtype)
    shapes = [(c, cm), (cm,), (3, 3, cm, cm), (cm,), (cm, c), (c,)]
    ws = [jax.random.normal(ks[i + 1], s, jnp.float32) * 0.1
          for i, s in enumerate(shapes)]
    return x, ws


def test_fused_bottleneck_matches_ref_interpret():
    x, ws = _block_args(jax.random.PRNGKey(0))
    ref = bottleneck_ref(x, *ws)
    out = fused_bottleneck(x, *ws, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_fused_bottleneck_degenerate_spatial_falls_back():
    # h/w < 3 would make zero-size shift slices; must not crash.
    x, ws = _block_args(jax.random.PRNGKey(1), h=2, w=1)
    ref = bottleneck_ref(x, *ws)
    out = fused_bottleneck(x, *ws, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fold_bn_exact():
    k = jax.random.PRNGKey(2)
    c, cm = 8, 4
    x = jax.random.normal(k, (2, 5, 5, c))
    kern = jax.random.normal(jax.random.fold_in(k, 1), (1, 1, c, cm)) * 0.1
    scale, bias, mean = (
        jax.random.normal(jax.random.fold_in(k, i), (cm,)) * 0.1 + 1.0
        for i in (2, 3, 4))
    var = jnp.abs(jax.random.normal(jax.random.fold_in(k, 5), (cm,))) + 0.5
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kern.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, kern, (1, 1), "VALID",
                                     dimension_numbers=dn)
    want = (y - mean) * scale / jnp.sqrt(var + 1e-5) + bias
    kf, bf = fold_bn(kern, scale, bias, mean, var)
    got = jax.lax.conv_general_dilated(x, kf, (1, 1), "VALID",
                                       dimension_numbers=dn) + bf
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("num_features,last_stride", [(0, 2), (128, 1)])
def test_module_fused_eval_matches_standard(num_features, last_stride):
    m_std = models.create("resnet50", num_features=num_features,
                          num_parts=3, dtype=jnp.float32,
                          last_stride=last_stride, fused_eval=False)
    m_fused = models.create("resnet50", num_features=num_features,
                            num_parts=3, dtype=jnp.float32,
                            last_stride=last_stride, fused_eval=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 32, 3), jnp.float32)
    v = m_std.init(jax.random.PRNGKey(0), x[:2], train=False)
    a = m_std.apply(v, x, train=False)["embeddings"]
    b = m_fused.apply(v, x, train=False)["embeddings"]
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_module_fused_eval_train_mode_unaffected():
    m_fused = models.create("resnet50", num_features=0, num_parts=3,
                            dtype=jnp.float32, fused_eval=True)
    m_std = models.create("resnet50", num_features=0, num_parts=3,
                          dtype=jnp.float32, fused_eval=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 32, 3), jnp.float32)
    v = m_std.init(jax.random.PRNGKey(0), x[:2], train=False)
    rngs = {"dropout": jax.random.PRNGKey(2)}
    a, sa = m_std.apply(v, x, train=True, mutable=["batch_stats"], rngs=rngs)
    b, sb = m_fused.apply(v, x, train=True, mutable=["batch_stats"],
                          rngs=rngs)
    np.testing.assert_array_equal(np.asarray(a["embeddings"]),
                                  np.asarray(b["embeddings"]))
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_array_equal(np.asarray(p),
                                                   np.asarray(q)),
        sa, sb)


class TestFusedStage:
    """Whole-stage fused kernel (ops/bottleneck_stage) vs XLA reference."""

    @staticmethod
    def _mk_blocks(key, c, cm, n_identity):
        cout = 4 * cm
        i = iter(range(1, 100))
        mk = lambda s: jax.random.normal(  # noqa: E731
            jax.random.fold_in(key, next(i)), s, jnp.float32) * 0.1
        blk0 = (mk((c, cm)), mk((cm,)), mk((3, 3, cm, cm)), mk((cm,)),
                mk((cm, cout)), mk((cout,)), mk((c, cout)), mk((cout,)))
        idents = tuple(
            (mk((cout, cm)), mk((cm,)), mk((3, 3, cm, cm)), mk((cm,)),
             mk((cm, cout)), mk((cout,)))
            for _ in range(n_identity))
        return (blk0,) + idents

    @pytest.mark.parametrize("stride", [1, 2])
    def test_stage_matches_ref(self, stride):
        from ssg_tpu.ops.bottleneck_stage import (
            fused_bottleneck_stage, stage_ref)

        key = jax.random.PRNGKey(0)
        blocks = self._mk_blocks(key, c=16, cm=8, n_identity=2)
        x = jax.random.normal(jax.random.fold_in(key, 0), (4, 16, 8, 16),
                              jnp.float32)
        ref = stage_ref(x, blocks, stride)
        out = fused_bottleneck_stage(x, blocks, stride=stride,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_stage_matches_flax_module(self):
        """Folded stage == the Flax Bottleneck chain with real BN stats."""
        from flax.core import freeze
        from ssg_tpu.models.resnet import Bottleneck
        from ssg_tpu.ops.bottleneck import fold_bn
        from ssg_tpu.ops.bottleneck_stage import fused_bottleneck_stage

        key = jax.random.PRNGKey(3)
        c_in, cm = 16, 8
        x = jax.random.normal(key, (2, 8, 8, c_in), jnp.float32)
        mods = [Bottleneck(features=cm, strides=2, dtype=jnp.float32),
                Bottleneck(features=cm, strides=1, dtype=jnp.float32)]
        y = x
        vs, blocks = [], []
        for j, mod in enumerate(mods):
            v = mod.init(jax.random.fold_in(key, j), y, train=False)
            # Randomize BN stats so folding is actually exercised.
            stats = jax.tree_util.tree_map(
                lambda a: a + 0.1 * jax.random.normal(
                    jax.random.fold_in(key, 50 + j), a.shape),
                v["batch_stats"])
            stats = jax.tree_util.tree_map(jnp.abs, stats)
            v = {"params": v["params"], "batch_stats": stats}
            vs.append(v)
            p, s = v["params"], v["batch_stats"]
            folded = [fold_bn(p[cn]["kernel"], p[bn]["scale"], p[bn]["bias"],
                              s[bn]["mean"], s[bn]["var"], 1e-5)
                      for cn, bn in (("conv1", "bn1"), ("conv2", "bn2"),
                                     ("conv3", "bn3"))]
            (w1, b1), (w2, b2), (w3, b3) = folded
            if "downsample_conv" in p:
                wd, bd = fold_bn(
                    p["downsample_conv"]["kernel"],
                    p["downsample_bn"]["scale"], p["downsample_bn"]["bias"],
                    s["downsample_bn"]["mean"], s["downsample_bn"]["var"],
                    1e-5)
                blocks.append((w1[0, 0], b1, w2, b2, w3[0, 0], b3,
                               wd[0, 0], bd))
            else:
                blocks.append((w1[0, 0], b1, w2, b2, w3[0, 0], b3))
            y = mod.apply(v, y, train=False)

        out = fused_bottleneck_stage(x, tuple(blocks), stride=2,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(y),
                                   atol=1e-4)
