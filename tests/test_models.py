"""Model tests: flax SSGResNet structure + torch->flax conversion parity.

The torch twin (eval mode, fp32, CPU) is the numerical oracle for the flax
model (SURVEY.md §4.1) — random weights, identical outputs required.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ssg_tpu import models
from ssg_tpu.models.convert import torch_to_flax
from ssg_tpu.oracle.resnet_torch import (
    TorchBottleneck,
    TorchSSGResNet,
    torch_resnet50_ssg,
)


@pytest.mark.parametrize("num_features,num_classes", [(0, 0), (64, 10)])
def test_torch_flax_parity_small_bottleneck(rng, num_features, num_classes):
    # Tiny bottleneck ResNet (1 block per stage): exercises conv1/bn1/
    # maxpool, downsample, part pooling, feat/feat_bn/classifier heads with
    # CPU-sane cost; resnet50 parity goes through the same code paths.
    tm = TorchSSGResNet(
        layers=(1, 1, 1, 1), block=TorchBottleneck,
        num_features=num_features, num_classes=num_classes,
    )
    tm.eval()
    # Randomize BN running stats so conversion of stats is actually tested.
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    fm = models.SSGResNet(
        stage_sizes=(1, 1, 1, 1),
        num_features=num_features, num_classes=num_classes,
        dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    variables = torch_to_flax(tm.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)

    x = rng.normal(size=(2, 64, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    out = fm.apply(variables, jnp.asarray(x), train=False)

    # Tolerance: torch-CPU vs XLA conv stacks accumulate ~1e-4..1e-3 abs
    # noise through the 2048-wide Dense + BN + L2-normalize; this checks
    # conversion correctness, not bitwise determinism.
    np.testing.assert_allclose(
        np.asarray(out["embeddings"]), ref["embeddings"].numpy(), atol=2e-3,
    )
    if num_classes:
        np.testing.assert_allclose(
            np.asarray(out["logits"]), ref["logits"].numpy(), atol=5e-3,
        )


def test_flax_model_shapes_and_train_mode(rng):
    model = models.create("resnet50", num_features=128, num_classes=16,
                          dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 64, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["embeddings"].shape == (3, 2, 128)
    assert out["logits"].shape == (3, 2, 16)
    # Eval embeddings are L2-normalized.
    norms = jnp.linalg.norm(out["embeddings"], axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, rtol=1e-4)
    # Train mode: mutable batch_stats, raw embeddings, dropout rng.
    out2, updated = model.apply(
        variables, x, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert "batch_stats" in updated
    assert not np.allclose(
        np.asarray(jnp.linalg.norm(out2["embeddings"], axis=-1)), 1.0
    )


def test_model_factory():
    assert models.names() == [
        "inception", "resnet101", "resnet152", "resnet18", "resnet34", "resnet50",
    ]
    with pytest.raises(KeyError):
        models.create("vgg16")


def test_torchvision_style_checkpoint_loads():
    # Plain torchvision-resnet50-style keys (backbone only + fc) convert too.
    tm = torch_resnet50_ssg()
    sd = {k.removeprefix("backbone."): v for k, v in tm.state_dict().items()
          if k.startswith("backbone.")}
    sd["fc.weight"] = torch.zeros(1000, 2048)
    sd["fc.bias"] = torch.zeros(1000)
    variables = torch_to_flax(sd)
    assert "conv1" in variables["params"]["backbone"]
    assert "layer4_2" in variables["params"]["backbone"]
    assert variables["params"]["backbone"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert variables["batch_stats"]["backbone"]["bn1"]["mean"].shape == (64,)


def test_flax_torch_roundtrip():
    """flax -> torch -> flax must be the identity (layouts and naming)."""
    from ssg_tpu.models.convert import flax_to_torch

    model = models.create("resnet18", num_features=8, num_classes=5,
                          num_parts=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 64, 32, 3), jnp.float32), train=False)
    sd = flax_to_torch(jax.tree.map(np.asarray, variables))
    assert "backbone.conv1.weight" in sd
    assert sd["backbone.conv1.weight"].shape == (64, 3, 7, 7)
    assert "backbone.layer1.0.conv1.weight" in sd
    back = torch_to_flax(sd)
    flat_a = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, variables))[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    b_by_path = {jax.tree_util.keystr(p): v for p, v in flat_b}
    for path, a in flat_a:
        key = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(a, b_by_path[key], err_msg=key)


@pytest.mark.parametrize("arch", ["resnet18", "resnet34", "resnet50",
                                  "resnet101", "resnet152", "inception"])
def test_every_factory_arch_forward(arch):
    """Each registry entry initializes and runs the SSG 3-part contract."""
    kwargs = dict(num_features=8, num_parts=3, dtype=jnp.float32)
    if arch == "inception":
        kwargs.update(depth=2, width=8)
    model = models.create(arch, **kwargs)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 32, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["embeddings"].shape == (3, 1, 8)


def test_stem_s2d_matches_canonical_conv(rng):
    """Space-to-depth stem (StemConv.s2d) is the exact same conv: same
    params, same output to fp tolerance, for any even input size."""
    import jax
    import jax.numpy as jnp

    from ssg_tpu.models.resnet import StemConv

    x = jnp.asarray(rng.normal(size=(2, 64, 32, 3)).astype(np.float32))
    ref_mod = StemConv(s2d=False)
    variables = ref_mod.init(jax.random.PRNGKey(0), x)
    ref = ref_mod.apply(variables, x)
    got = StemConv(s2d=True).apply(variables, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)

    # Odd spatial sizes fall back to the canonical path (no crash).
    x_odd = jnp.asarray(rng.normal(size=(1, 31, 17, 3)).astype(np.float32))
    v2 = StemConv(s2d=False).init(jax.random.PRNGKey(1), x_odd)
    np.testing.assert_allclose(
        np.asarray(StemConv(s2d=True).apply(v2, x_odd)),
        np.asarray(StemConv(s2d=False).apply(v2, x_odd)), atol=2e-4,
    )


def test_stem_s2d_bf16_policy(rng):
    """StemConv must follow the model's compute-dtype policy (bf16 inputs
    meet bf16 kernels) on both stem paths — regression for a dtype mismatch
    that only surfaced under dtype=bfloat16."""
    import jax
    import jax.numpy as jnp

    from ssg_tpu import models

    for s2d in (False, True):
        m = models.create("resnet50", num_features=0, num_parts=3,
                          dtype=jnp.bfloat16, stem_s2d=s2d)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 16, 3)),
                   train=False)
        out = m.apply(v, jnp.zeros((2, 32, 16, 3)), train=False)
        assert out["embeddings"].dtype == jnp.float32  # heads stay fp32
