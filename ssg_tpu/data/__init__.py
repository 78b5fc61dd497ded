"""Data subsystem: datasets, preprocessing, sampling.

TPU-first replacements for the reference's [reid/datasets/*.py] +
[reid/utils/data/*.py] (expected paths — SURVEY.md §2 #11–12): batch-
vectorized decode/resize/normalize that runs fused on device instead of
per-image PIL work in DataLoader workers.
"""

from ssg_tpu.data import datasets
from ssg_tpu.data.sampler import RandomIdentitySampler
from ssg_tpu.data.preprocessor import Preprocessor
