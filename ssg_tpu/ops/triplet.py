"""Batch-hard triplet loss, fully in-XLA.

Mirrors the reference's ``TripletLoss`` ([reid/loss/triplet.py], SURVEY.md
§2 #7): per anchor, the hardest positive (max distance, same pseudo-id) and
hardest negative (min distance, different pseudo-id) within the P x K batch,
fed to a margin ranking loss. The mining is pure masked reductions over the
batch distance matrix — no host round-trip, differentiable end-to-end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_hard_triplet_loss(
    embeddings: jax.Array,
    labels: jax.Array,
    margin: float = 0.3,
    eps: float = 1e-12,
) -> tuple[jax.Array, jax.Array]:
    """Returns (loss, prec) — prec = fraction of anchors with d_an > d_ap,
    the reference's printed triplet accuracy.

    Rows with label < 0 (per-branch noise in the SSG multi-group scheme —
    an image may be clustered for the whole body but noise for a part) are
    masked out: they are neither anchors nor positives/negatives, and the
    mean runs over anchors that have both a positive and a negative.
    """
    x = embeddings.astype(jnp.float32)
    sq = (
        jnp.sum(x * x, 1, keepdims=True)
        + jnp.sum(x * x, 1, keepdims=True).T
        - 2.0
        * jnp.dot(
            x,
            x.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    d = jnp.sqrt(jnp.maximum(sq, eps))  # clamped sqrt, as the reference

    valid = labels >= 0
    pair_valid = valid[:, None] & valid[None, :]
    pos = (labels[:, None] == labels[None, :]) & pair_valid
    neg = (labels[:, None] != labels[None, :]) & pair_valid
    big = jnp.float32(1e9)
    d_ap = jnp.max(jnp.where(pos, d, -big), axis=1)
    d_an = jnp.min(jnp.where(neg, d, big), axis=1)

    not_self = ~jnp.eye(labels.shape[0], dtype=bool)
    anchor = valid & jnp.any(pos & not_self, axis=1) & jnp.any(neg, axis=1)
    n_anchor = jnp.maximum(jnp.sum(anchor), 1)

    # MarginRankingLoss(margin) with y=1 on (d_an, d_ap), over live anchors.
    per = jnp.maximum(d_ap - d_an + margin, 0.0)
    loss = jnp.sum(jnp.where(anchor, per, 0.0)) / n_anchor
    prec = jnp.sum(jnp.where(anchor, (d_an > d_ap).astype(jnp.float32), 0.0)) / n_anchor
    return loss, prec
