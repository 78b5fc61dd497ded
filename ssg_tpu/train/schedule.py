"""Learning-rate schedule surface for the SSG fine-tune loop.

The reference family uses torch epoch-based schedulers (StepLR at fixed
epochs in the open-reid baseline; SSG's own fine-tune lr is a constant
small Adam lr — SURVEY.md §3.1 [LOW], reconstruction documented in
PARITY.md). The TPU rebuild keeps the jitted train step LR-agnostic:
``optax.inject_hyperparams`` makes the learning rate a leaf of the
optimizer state, and the host sets it once per epoch from ``lr_at`` —
exactly torch's epoch-indexed semantics, with no steps-per-epoch plumbing
and no recompilation (same shapes, new scalar).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def make_optimizer(learning_rate: float, weight_decay: float = 5e-4):
    """AdamW with the learning rate injected as optimizer-state leaf
    (host-settable per epoch via ``set_learning_rate``)."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate, weight_decay=weight_decay
    )


def lr_at(
    epoch: int,
    base_lr: float,
    schedule: str = "constant",
    step_size: int = 40,
    gamma: float = 0.1,
    warmup_epochs: int = 0,
) -> float:
    """Epoch-indexed learning rate.

    - linear warmup over ``warmup_epochs`` (0 disables),
    - then ``constant`` or ``step`` (torch StepLR: x ``gamma`` every
      ``step_size`` epochs, counted from epoch 0).
    """
    if warmup_epochs > 0 and epoch < warmup_epochs:
        return base_lr * (epoch + 1) / warmup_epochs
    if schedule == "constant":
        return base_lr
    if schedule == "step":
        return base_lr * gamma ** (epoch // step_size)
    raise ValueError(f"unknown lr schedule {schedule!r}")


def set_learning_rate(state, lr: float):
    """Return ``state`` with the injected learning rate set to ``lr``.

    No-op (returns state unchanged) when the optimizer was built without
    inject_hyperparams — custom ``tx`` callers keep full control.
    """
    opt_state = state.opt_state
    hp = getattr(opt_state, "hyperparams", None)
    if hp is None or "learning_rate" not in hp:
        return state
    old = hp["learning_rate"]
    new = jnp.asarray(lr, old.dtype)
    sh = getattr(old, "sharding", None)
    if sh is not None and getattr(sh, "mesh", None) is not None and \
            not getattr(old, "is_fully_addressable", True):
        # Multi-host state: the old leaf is replicated over a process-
        # spanning mesh; the replacement must match or the next jitted
        # step sees mixed device sets.
        import numpy as np

        from jax.sharding import PartitionSpec as P

        from ssg_tpu.parallel.multihost import global_put

        new = global_put(sh.mesh, np.asarray(lr, old.dtype), P())
    new_hp = dict(hp)
    new_hp["learning_rate"] = new
    return state.replace(opt_state=opt_state._replace(hyperparams=new_hp))
