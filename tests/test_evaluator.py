"""Evaluator end-to-end (reference Evaluator.evaluate shape, SURVEY.md §3.5):
multi-part feature extraction, plain and re-ranked evaluation, logger
metrics."""

import numpy as np

import jax
import jax.numpy as jnp

from ssg_tpu.api import Evaluator
from ssg_tpu.data import datasets
from ssg_tpu.models.resnet import BasicBlock, SSGResNet


def _setup():
    ds = datasets.create("market1501", scale="tiny", seed=7)
    orig_render = ds.render
    ds.render = lambda fnames: orig_render(fnames)[:, ::4, ::4, :]
    model = SSGResNet(stage_sizes=(1, 1), block=BasicBlock, num_features=16,
                      dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 64, 32, 3)), train=False)
    return ds, model, variables


def test_evaluator_plain_and_reranked():
    ds, model, variables = _setup()
    ev = Evaluator(model, variables, batch_size=16)

    captured = []

    class Probe:
        def metric(self, **kv):
            captured.append(kv)

    res = ev.evaluate(ds, logger=Probe())
    assert 0.0 <= res["mAP"] <= 1.0
    assert res["cmc"].shape[0] == 100
    assert np.all(np.diff(res["cmc"]) >= -1e-6)  # CMC is cumulative
    assert any(kv.get("kind") == "eval" for kv in captured)

    res_rr = ev.evaluate(ds, rerank=True)
    assert 0.0 <= res_rr["mAP"] <= 1.0  # re-ranked path runs end to end


def test_evaluator_single_part_selection():
    ds, model, variables = _setup()
    for part in ("whole", "up", "down"):
        res = Evaluator(model, variables, batch_size=16, part=part).evaluate(ds)
        assert 0.0 <= res["mAP"] <= 1.0
