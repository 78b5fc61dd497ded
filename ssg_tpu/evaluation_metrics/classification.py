"""Top-k classification accuracy, mirroring the reference's
[reid/evaluation_metrics/classification.py] ``accuracy(output, target,
topk)`` (SURVEY.md §2 #8) as one jitted reduction."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("topk",))
def _accuracy(output, target, topk: tuple):
    maxk = max(topk)
    _, pred = jax.lax.top_k(output, maxk)  # (B, maxk)
    correct = pred == target[:, None]
    return tuple(
        jnp.mean(jnp.any(correct[:, :k], axis=1).astype(jnp.float32)) for k in topk
    )


def accuracy(output, target, topk: tuple = (1,)):
    """Fraction of rows whose target is within the top-k logits, per k."""
    res = _accuracy(jnp.asarray(output), jnp.asarray(target), tuple(topk))
    return [float(r) for r in res]
