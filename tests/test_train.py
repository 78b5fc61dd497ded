"""Trainer + SSG loop integration tests (tiny model/data, CPU-sane).

Covers SURVEY.md §4.2: the end-to-end iteration on synthetic data, plus the
train step's learning signal (loss decreases on an easy task).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ssg_tpu.data import datasets
from ssg_tpu.train.ssg_loop import SSGConfig, run_ssg
from ssg_tpu.train.trainer import Trainer, create_train_state, make_train_step


def test_train_step_reduces_loss(rng):
    from ssg_tpu.models.resnet import BasicBlock, SSGResNet

    model = SSGResNet(stage_sizes=(1, 1), block=BasicBlock, num_features=32,
                      dtype=jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=(2, 32, 16, 3),
        learning_rate=1e-3,
    )
    step = make_train_step(model, num_parts=3, height=32, width=16)

    # Easy task: 4 ids with very distinct images, P x K = 4 x 4.
    base = (rng.random((4, 32, 16, 3)) * 255).astype(np.uint8)
    images = np.repeat(base, 4, axis=0)
    labels = np.tile(np.repeat(np.arange(4), 4)[None], (3, 1))

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        key, k = jax.random.split(key)
        state, metrics = step(state, jnp.asarray(images), jnp.asarray(labels), k)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ssg_loop_end_to_end(tmp_path):
    from ssg_tpu.models.resnet import BasicBlock, SSGResNet

    tgt = datasets.create("market1501", scale="tiny", seed=2)
    model = SSGResNet(stage_sizes=(1, 1), block=BasicBlock, num_features=16,
                      dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 64, 32, 3)), train=False
    )
    cfg = SSGConfig(
        iterations=1, epochs=1, batch_size=16, num_instances=2,
        k1=8, k2=3, rho=0.02, min_samples=2, height=64, width=32,
        logs_dir=str(tmp_path), print_freq=1,
    )
    # Shrink images for speed: wrap render to downscale.
    orig_render = tgt.render
    tgt.render = lambda fnames: orig_render(fnames)[:, ::4, ::4, :]

    state, history = run_ssg(model, variables, tgt, cfg)
    assert len(history) == 1
    assert "mAP" in history[0]
    assert (tmp_path / "checkpoint").exists()


def test_ssg_loop_resume_continues_iteration(tmp_path):
    """resume_from restores params/opt_state and continues at iteration+1
    (SURVEY.md §5 checkpoint/resume row)."""
    from ssg_tpu.models.resnet import BasicBlock, SSGResNet

    tgt = datasets.create("market1501", scale="tiny", seed=2)
    model = SSGResNet(stage_sizes=(1, 1), block=BasicBlock, num_features=16,
                      dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 64, 32, 3)), train=False
    )
    cfg = SSGConfig(
        iterations=2, epochs=1, batch_size=16, num_instances=2,
        k1=8, k2=3, rho=0.02, min_samples=2, height=64, width=32,
        logs_dir=str(tmp_path), print_freq=1,
    )
    orig_render = tgt.render
    tgt.render = lambda fnames: orig_render(fnames)[:, ::4, ::4, :]

    one_iter = SSGConfig(**{**cfg.__dict__, "iterations": 1})
    run_ssg(model, variables, tgt, one_iter)

    _, history = run_ssg(model, variables, tgt, cfg,
                         resume_from=str(tmp_path / "checkpoint"))
    assert [h["iteration"] for h in history] == [1]  # skipped iteration 0


def test_checkpoint_roundtrip(tmp_path, rng):
    from ssg_tpu.utils.serialization import load_checkpoint, save_checkpoint

    state = {
        "params": {"w": rng.normal(size=(4, 4)).astype(np.float32)},
        "iteration": np.int32(3),
    }
    save_checkpoint(state, is_best=True, fpath=str(tmp_path / "ck"))
    back = load_checkpoint(str(tmp_path / "ck"))
    np.testing.assert_array_equal(back["params"]["w"], state["params"]["w"])
    best = load_checkpoint(str(tmp_path / "model_best"))
    assert int(best["iteration"]) == 3


def test_train_step_remat_matches(rng):
    """remat=True must not change the update (same loss, same params)."""
    from ssg_tpu.models.resnet import BasicBlock, SSGResNet
    from ssg_tpu.train.trainer import create_train_state, make_train_step

    model = SSGResNet(stage_sizes=(1, 1), block=BasicBlock, num_features=8,
                      dtype=jnp.float32)
    images = (np.abs(rng.normal(size=(8, 64, 32, 3))) * 80).astype(np.uint8)
    labels = np.tile(np.repeat(np.arange(2), 4)[None], (3, 1))

    outs = []
    for remat in (False, True):
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   input_shape=(2, 64, 32, 3))
        step = make_train_step(model, num_parts=3, height=64, width=32,
                               remat=remat)
        state, m = step(state, jnp.asarray(images), jnp.asarray(labels),
                        jax.random.PRNGKey(1))
        outs.append((float(m["loss"]), state.params))
    assert abs(outs[0][0] - outs[1][0]) <= 1e-5 * max(abs(outs[0][0]), 1.0)
    a = jax.tree.leaves(outs[0][1])
    b = jax.tree.leaves(outs[1][1])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_copy_state_dict_skips_mismatched_heads():
    from ssg_tpu.utils import copy_state_dict

    dst = {
        "backbone": {"w": np.zeros((4, 4), np.float32)},
        "classifier": {"kernel": np.zeros((4, 10), np.float32)},
    }
    src = {
        "backbone": {"w": np.ones((4, 4), np.float32)},
        "classifier": {"kernel": np.ones((4, 7), np.float32)},  # other ids
        "module.extra": np.ones((2,), np.float32),
    }
    out = copy_state_dict(src, dst, strip="module.")
    np.testing.assert_array_equal(out["backbone"]["w"], 1.0)  # copied
    np.testing.assert_array_equal(out["classifier"]["kernel"],
                                  dst["classifier"]["kernel"])  # kept
    # Keys the target model lacks are skipped (reference semantics) —
    # injecting them would make flax model.apply fail on unexpected params.
    assert "extra" not in out

    import pytest as _pytest

    with _pytest.raises(KeyError):
        copy_state_dict({"classifier": {"kernel": np.ones((4, 7))}},
                        {"classifier": {"kernel": np.zeros((4, 10))}})


def test_join_rule_semantics():
    """Whole-body row decides membership; each group densely remapped with
    part noise preserved (the [MED] join rule, factored for testability)."""
    from ssg_tpu.train.ssg_loop import join_rule

    labels = np.array([
        [0, -1, 2, 2, 5],
        [1, 1, -1, 0, 0],
        [-1, 0, 0, 0, 1],
    ], dtype=np.int32)
    keep, kept_idx, kept = join_rule(labels)
    np.testing.assert_array_equal(keep, [True, False, True, True, True])
    np.testing.assert_array_equal(kept_idx, [0, 2, 3, 4])
    np.testing.assert_array_equal(kept[0], [0, 1, 1, 2])   # dense remap
    np.testing.assert_array_equal(kept[1], [1, -1, 0, 0])  # part noise kept
    np.testing.assert_array_equal(kept[2], [-1, 0, 0, 1])


def test_rho_is_traced_no_recompile(rng):
    """rho scheduling must reuse the compiled analytics graph — a new rho
    value per iteration would otherwise recompile (minutes on remote TPU)."""
    from ssg_tpu import api

    feats = jnp.asarray(rng.normal(size=(3, 64, 16)).astype(np.float32))
    api.cluster_groups(feats, k1=6, k2=2, rho=0.02, min_samples=2)
    n_compiled = api._analytics_impl._cache_size()
    labels_lo, _, _ = api.cluster_groups(feats, k1=6, k2=2, rho=0.005,
                                         min_samples=2)
    labels_hi, _, _ = api.cluster_groups(feats, k1=6, k2=2, rho=0.08,
                                         min_samples=2)
    assert api._analytics_impl._cache_size() == n_compiled
    # Larger rho -> larger eps -> at least as many non-noise points.
    assert (labels_hi[0] >= 0).sum() >= (labels_lo[0] >= 0).sum()
