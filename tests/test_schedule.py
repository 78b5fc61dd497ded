"""LR schedule surface (train/schedule.py): epoch-indexed lr, injected
into the optimizer state without recompiling the train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssg_tpu.train.schedule import lr_at, make_optimizer, set_learning_rate
from ssg_tpu.train.trainer import Trainer, create_train_state, make_train_step


def test_lr_at_constant_and_step():
    assert lr_at(0, 1e-3) == 1e-3
    assert lr_at(99, 1e-3) == 1e-3
    # torch StepLR semantics: x gamma every step_size epochs from epoch 0.
    assert lr_at(39, 1e-3, "step", step_size=40) == 1e-3
    assert lr_at(40, 1e-3, "step", step_size=40) == pytest.approx(1e-4)
    assert lr_at(80, 1e-3, "step", step_size=40) == pytest.approx(1e-5)


def test_lr_at_warmup():
    # Linear warmup reaches base_lr at the last warmup epoch.
    got = [lr_at(e, 1e-2, "step", step_size=40, warmup_epochs=4)
           for e in range(5)]
    np.testing.assert_allclose(got, [2.5e-3, 5e-3, 7.5e-3, 1e-2, 1e-2])


def test_lr_at_rejects_unknown():
    with pytest.raises(ValueError):
        lr_at(0, 1e-3, "cosine")


def test_set_learning_rate_updates_injected_state():
    params = {"w": jnp.ones((3,))}
    tx = make_optimizer(1e-3)
    opt_state = tx.init(params)

    class S:
        def __init__(self, opt_state):
            self.opt_state = opt_state

        def replace(self, opt_state):
            return S(opt_state)

    s2 = set_learning_rate(S(opt_state), 5e-4)
    assert float(s2.opt_state.hyperparams["learning_rate"]) == pytest.approx(5e-4)


def test_set_learning_rate_noop_without_injection():
    import optax

    state = object.__new__(type("S", (), {"opt_state": None}))
    state.opt_state = optax.adamw(1e-3).init({"w": jnp.ones((2,))})
    from ssg_tpu.train.schedule import set_learning_rate

    assert set_learning_rate(state, 1.0) is state


def test_trainer_epoch_lr_changes_update_magnitude(rng):
    """Same batch, lr then lr/10: the param delta shrinks accordingly —
    proof the injected lr reaches the jitted step without recompiling."""
    from ssg_tpu.models.resnet import BasicBlock, SSGResNet

    model = SSGResNet(stage_sizes=(1, 1), block=BasicBlock, num_features=8,
                      dtype=jnp.float32)
    step = make_train_step(model, num_parts=3, height=32, width=16)
    images = (rng.random((8, 32, 16, 3)) * 255).astype(np.uint8)
    labels = np.tile((np.arange(8) // 4)[None], (3, 1))
    batch = [(images, labels)]

    def delta(lr):
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   input_shape=(2, 32, 16, 3),
                                   learning_rate=1e-3)
        before = jax.tree.map(np.asarray, state.params)
        trainer = Trainer(step, print_freq=100)
        state = trainer.train(0, state, iter(batch), jax.random.PRNGKey(1),
                              lr=lr)
        return np.max(np.abs(
            np.concatenate([
                (np.asarray(a) - b).ravel()
                for a, b in zip(jax.tree.leaves(state.params),
                                jax.tree.leaves(before))
            ])
        ))

    d_hi, d_lo = delta(1e-3), delta(1e-7)
    assert d_lo < d_hi / 100
