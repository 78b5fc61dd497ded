"""SSG++ tests: one-shot subset, affiliation rules, semi loop end-to-end."""

import numpy as np

import jax
import jax.numpy as jnp

from ssg_tpu.data import datasets
from ssg_tpu.train.semi import affiliate_clusters, one_shot_subset


def test_one_shot_subset_one_per_id():
    ds = datasets.create("market1501", scale="tiny")
    subset = one_shot_subset(ds.train, seed=0)
    pids = [ds.train[i][1] for i in subset]
    assert sorted(pids) == sorted({p for _, p, _ in ds.train})
    assert all(ds.train[i][1] == pid for i, pid in subset.items())
    # Deterministic.
    assert subset == one_shot_subset(ds.train, seed=0)


def test_affiliation_rules():
    labels = np.array([0, 0, 0, 1, 1, 2, 2, -1, -1])
    one_shot = {0: 10, 3: 11, 5: 12, 6: 13, 8: 14}
    out = affiliate_clusters(labels, one_shot)
    # Cluster 0: single one-shot id 10 -> all members.
    assert list(out[:3]) == [10, 10, 10]
    # Cluster 1: one-shot at idx 3 only -> members inherit 11.
    assert list(out[3:5]) == [11, 11]
    # Cluster 2 has two conflicting one-shot ids -> ambiguous; only the
    # one-shot images themselves keep their labels.
    assert out[5] == 12 and out[6] == 13
    # Noise: unknown except the one-shot image itself.
    assert out[7] == -1 and out[8] == 14


def test_semi_loop_end_to_end(tmp_path):
    from ssg_tpu.models.resnet import BasicBlock, SSGResNet
    from ssg_tpu.train.ssg_loop import SSGConfig, run_ssg

    tgt = datasets.create("market1501", scale="tiny", seed=2)
    num_ids = len({p for _, p, _ in tgt.train})
    model = SSGResNet(stage_sizes=(1, 1), block=BasicBlock, num_features=16,
                      num_classes=num_ids, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 64, 32, 3)), train=False
    )
    cfg = SSGConfig(
        iterations=1, epochs=1, batch_size=16, num_instances=2,
        k1=8, k2=3, rho=0.02, min_samples=2, height=64, width=32,
        logs_dir=str(tmp_path), print_freq=1,
    )
    orig_render = tgt.render
    tgt.render = lambda fnames: orig_render(fnames)[:, ::4, ::4, :]
    one_shot = one_shot_subset(tgt.train, seed=0)
    state, history = run_ssg(
        model, variables, tgt, cfg, one_shot=one_shot, ce_weight=0.5
    )
    assert len(history) == 1 and "mAP" in history[0]
