"""Loss surface, mirroring the reference's [reid/loss/__init__.py]
(SURVEY.md §2 #7): ``TripletLoss`` (batch-hard) and ``OIMLoss`` (open-reid
family's online instance matching, shipped alongside triplet)."""

from ssg_tpu.loss.oim import OIMLoss, oim_loss
from ssg_tpu.loss.triplet import TripletLoss
from ssg_tpu.ops.triplet import batch_hard_triplet_loss

__all__ = ["TripletLoss", "OIMLoss", "oim_loss", "batch_hard_triplet_loss"]
