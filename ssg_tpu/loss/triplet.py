"""Class-shaped wrapper over the in-XLA batch-hard triplet loss.

The reference exposes a torch module ``TripletLoss(margin)`` whose
``__call__(embeddings, labels) -> (loss, prec)`` does batch-hard mining
([reid/loss/triplet.py], SURVEY.md §2 #7). This mirrors that call shape on
top of ssg_tpu.ops.triplet (pure function, jit/grad-safe).
"""

from __future__ import annotations

from ssg_tpu.ops.triplet import batch_hard_triplet_loss


class TripletLoss:
    def __init__(self, margin: float = 0.3):
        self.margin = float(margin)

    def __call__(self, embeddings, labels):
        return batch_hard_triplet_loss(embeddings, labels, margin=self.margin)
