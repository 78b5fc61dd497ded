"""ssg_tpu — TPU-native Self-Similarity Grouping (SSG) framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
SHI-Labs/Self-Similarity-Grouping (ICCV 2019, arXiv:1811.10144):
unsupervised cross-domain person re-identification via iterative
self-similarity grouping.

Public API (mirrors the reference surface, see SURVEY.md §1 and PARITY.md
for the full component map):

- ``ssg_tpu.api.extract_features``  — jit-compiled multi-branch extraction
  (``mesh=`` for data-parallel)
- ``ssg_tpu.api.re_ranking``        — k-reciprocal re-ranking, on-device
- ``ssg_tpu.api.cluster``           — DBSCAN with auto-eps, on-device
- ``ssg_tpu.api.cluster_groups``    — fused per-iteration analytics
- ``ssg_tpu.api.train``             — the SSG self-training loop
- ``ssg_tpu.train.pretrain``        — supervised source pretraining
- ``ssg_tpu.models.create``         — model factory (resnet18..152, inception)
- ``ssg_tpu.data.datasets.create``  — dataset factory (market1501/dukemtmc/
  msmt17/cuhk03; ``data.prepare`` ingests the raw distributions)
- ``ssg_tpu.parallel``              — mesh scale-out: sharded analytics and
  the streaming large-N clustering pipeline

The reference repo mount was empty at build time (see SURVEY.md caveat);
parity ground truth is the CPU oracle stack in ``ssg_tpu.oracle``
(numpy k-reciprocal, sklearn DBSCAN, torch-CPU ResNet-50).
"""

__version__ = "0.1.0"
