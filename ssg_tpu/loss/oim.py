"""Online Instance Matching (OIM) loss, TPU-native.

The open-reid family ships an OIM loss next to triplet ([reid/loss/oim.py],
SURVEY.md §2 #7 — listed [LOW, unused by SSG] but part of the reference
surface): a lookup table (LUT) of one normalized prototype per identity;
logits are the cosine similarities ``x @ lut.T / temperature``; after each
step the matched LUT rows are momentum-updated toward the batch features.

Torch implements the LUT update inside a custom autograd ``backward``.
JAX is functional: ``oim_loss`` returns ``(loss, new_lut)`` and the caller
threads the LUT through its train state like any other mutable collection —
same semantics, no hidden state, jit/grad-safe (the update rides
``stop_gradient``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("temperature", "momentum"))
def oim_loss(
    lut: jax.Array,
    features: jax.Array,
    labels: jax.Array,
    temperature: float = 0.1,
    momentum: float = 0.5,
):
    """Returns (loss, new_lut).

    lut: (num_classes, F) L2-normalized prototypes; features: (B, F)
    L2-normalized; labels: (B,) int in [0, num_classes) — rows with label < 0
    (unlabeled) are excluded from the loss and the update.
    """
    x = features.astype(jnp.float32)
    table = lut.astype(jnp.float32)
    logits = jnp.dot(x, table.T, preferred_element_type=jnp.float32) / temperature
    valid = labels >= 0
    safe_labels = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=1)[:, 0]
    n = jnp.maximum(jnp.sum(valid), 1)
    loss = jnp.sum(jnp.where(valid, nll, 0.0)) / n

    # Momentum update of matched prototypes (no gradient through the LUT).
    # Torch updates sequentially per sample (order-dependent with K>1
    # instances per id); here each matched class moves once toward the mean
    # of its batch features — batch-order-invariant, same fixed point.
    xs = jax.lax.stop_gradient(x)
    counts = jnp.zeros((table.shape[0],), jnp.float32).at[safe_labels].add(
        valid.astype(jnp.float32)
    )
    sums = jnp.zeros_like(table).at[safe_labels].add(
        jnp.where(valid[:, None], xs, 0.0)
    )
    matched = counts > 0
    mean_feat = sums / jnp.maximum(counts, 1.0)[:, None]
    upd = jnp.where(
        matched[:, None], momentum * table + (1.0 - momentum) * mean_feat, table
    )
    norm = jnp.maximum(jnp.linalg.norm(upd, axis=1, keepdims=True), 1e-12)
    new_lut = jnp.where(matched[:, None], upd / norm, upd)
    return loss, jax.lax.stop_gradient(new_lut)


class OIMLoss:
    """Stateful convenience wrapper: holds the LUT between calls."""

    def __init__(self, num_features: int, num_classes: int,
                 temperature: float = 0.1, momentum: float = 0.5):
        self.temperature = float(temperature)
        self.momentum = float(momentum)
        self.lut = jnp.zeros((num_classes, num_features), jnp.float32)

    def __call__(self, features, labels):
        loss, self.lut = oim_loss(
            self.lut, features, labels,
            temperature=self.temperature, momentum=self.momentum,
        )
        return loss
