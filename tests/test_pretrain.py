"""Supervised source pretraining: loss decreases, checkpoint written,
and the produced variables drop into the SSG loop (the workflow the
reference assumes via --resume)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssg_tpu.data import datasets
from ssg_tpu.models.resnet import BasicBlock, SSGResNet
from ssg_tpu.train.pretrain import PretrainConfig, run_pretrain


def _tiny_setup(tmp_path, epochs=2):
    src = datasets.create("market1501", scale="tiny", seed=4)
    orig_render = src.render
    src.render = lambda fnames: orig_render(fnames)[:, ::4, ::4, :]
    num_ids = len({p for _, p, _ in src.train})
    model = SSGResNet(stage_sizes=(1, 1), block=BasicBlock, num_features=16,
                      num_classes=num_ids, dtype=jnp.float32)
    # P x K epochs are num_ids * K indices long (open-reid semantics), so a
    # tiny dataset needs several epochs for a learning signal.
    cfg = PretrainConfig(
        epochs=epochs, batch_size=16, num_instances=4, height=64, width=32,
        print_freq=100, logs_dir=str(tmp_path), lr=1e-3,
        lr_decay_epochs=(100,),
    )
    return src, model, cfg


def test_pretrain_learns_and_checkpoints(tmp_path, capsys):
    src, model, cfg = _tiny_setup(tmp_path, epochs=3)

    losses = []

    class Probe:
        def metric(self, **kv):
            if kv.get("kind") == "train_step":
                losses.append(kv["loss"])

    state, variables = run_pretrain(model, src, cfg, logger=Probe())
    assert (tmp_path / "source_checkpoint").exists()
    first, last = np.mean(losses[:3]), np.mean(losses[-3:])
    assert last < first  # learning happened
    assert "params" in variables and "batch_stats" in variables


def test_pretrain_cli_smoke(tmp_path):
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    import pretraining

    orig = sys.stdout
    try:
        rc = pretraining.main([
            "--dataset", "market1501", "--scale", "tiny", "--epochs", "1",
            "--batch_size", "16", "--num_instances", "2", "--arch", "resnet18",
            "--num_features", "16", "--height", "64", "--width", "32",
            "--dtype", "float32", "--logs_dir", str(tmp_path),
        ])
    finally:
        sys.stdout = orig
    assert rc == 0
    assert (tmp_path / "source_checkpoint").exists()


def test_pretrain_oim_mode(tmp_path):
    """--loss oim: the OIM LUT threads through the train state (matched
    prototypes move off zero and stay L2-normalized), the loss decreases,
    and no classifier heads are required (num_classes=0)."""
    src = datasets.create("market1501", scale="tiny", seed=4)
    orig_render = src.render
    src.render = lambda fnames: orig_render(fnames)[:, ::4, ::4, :]
    model = SSGResNet(stage_sizes=(1, 1), block=BasicBlock, num_features=16,
                      num_classes=0, dtype=jnp.float32)
    cfg = PretrainConfig(
        epochs=3, batch_size=16, num_instances=4, height=64, width=32,
        print_freq=100, logs_dir=str(tmp_path), lr=1e-3,
        lr_decay_epochs=(100,), loss="oim",
    )

    losses = []

    class Probe:
        def metric(self, **kv):
            if kv.get("kind") == "train_step":
                losses.append(kv["loss"])

    state, variables = run_pretrain(model, src, cfg, logger=Probe())
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    lut = np.asarray(state.lut)
    num_ids = len({p for _, p, _ in src.train})
    assert lut.shape == (num_ids, 16)
    norms = np.linalg.norm(lut, axis=1)
    touched = norms > 0
    assert touched.any()  # prototypes were updated
    np.testing.assert_allclose(norms[touched], 1.0, rtol=1e-5)
