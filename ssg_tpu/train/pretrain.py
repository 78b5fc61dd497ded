"""Supervised source pretraining.

The reference workflow starts from a ResNet-50 re-ID model supervised-trained
on the source dataset (SURVEY.md §0 step 1; the reference consumes it via
``--resume``, training it with the open-reid baseline). This module makes the
workflow self-contained: P x K batches over true source identities, the same
jitted train step as the SSG loop with per-branch batch-hard triplet PLUS
per-branch cross-entropy on identity labels (the classic softmax+triplet
re-ID baseline), step-decayed learning rate, Orbax checkpoint at the end.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssg_tpu.data.preprocessor import Preprocessor
from ssg_tpu.data.sampler import RandomIdentitySampler
from ssg_tpu.train.trainer import Trainer, create_train_state, make_train_step
from ssg_tpu.utils.serialization import save_checkpoint


@dataclasses.dataclass
class PretrainConfig:
    epochs: int = 70
    batch_size: int = 64
    num_instances: int = 4
    margin: float = 0.3
    ce_weight: float = 1.0
    # "softmax": per-branch CE on identity logits (classifier heads).
    # "oim": Online Instance Matching on the whole-body embedding
    # (loss/oim.py) — the open-reid softmax-free baseline; the model needs
    # no classifier heads (num_classes=0). Triplet runs in both modes.
    loss: str = "softmax"
    oim_temperature: float = 0.1
    oim_momentum: float = 0.5
    lr: float = 3.5e-4
    weight_decay: float = 5e-4
    lr_decay_epochs: tuple = (40, 60)  # step-decay x0.1 (re-ID convention)
    num_parts: int = 3
    height: int = 256
    width: int = 128
    print_freq: int = 10
    seed: int = 0
    logs_dir: str = "logs"


def run_pretrain(model, src, config: PretrainConfig | None = None,
                 logger=None, variables=None):
    """Supervised training on source identities. Returns (state, variables).

    ``model`` must have ``num_classes == src.num_train_ids`` classifier heads
    (the CE term) — embeddings train through the triplet term either way.
    """
    cfg = config or PretrainConfig()
    rng = jax.random.PRNGKey(cfg.seed)

    # Dense 0..K-1 identity labels (open-reid relabel convention).
    pids = sorted({p for _, p, _ in src.train})
    to_dense = {p: i for i, p in enumerate(pids)}
    items = [(f, to_dense[p], c) for f, p, c in src.train]

    steps_per_epoch = max(len(items) // cfg.batch_size, 1)
    boundaries = {
        e * steps_per_epoch: 0.1 for e in cfg.lr_decay_epochs
    }
    tx = optax.adamw(
        optax.piecewise_constant_schedule(cfg.lr, boundaries),
        weight_decay=cfg.weight_decay,
    )
    if variables is None:
        variables = model.init(
            rng, jnp.zeros((2, cfg.height, cfg.width, 3), jnp.float32),
            train=False,
        )
    lut = None
    if cfg.loss == "oim":
        out = jax.eval_shape(
            lambda v, x: model.apply(v, x, train=False),
            variables, jnp.zeros((2, cfg.height, cfg.width, 3), jnp.float32),
        )
        feat_dim = out["embeddings"].shape[-1]
        lut = jnp.zeros((len(pids), feat_dim), jnp.float32)
    state = create_train_state(
        model, rng, input_shape=(2, cfg.height, cfg.width, 3), tx=tx,
        variables=variables, lut=lut,
    )
    step = make_train_step(
        model, margin=cfg.margin, num_parts=cfg.num_parts,
        ce_weight=cfg.ce_weight if cfg.loss != "oim" else 0.0,
        height=cfg.height, width=cfg.width,
        oim_weight=1.0 if cfg.loss == "oim" else 0.0,
        oim_temperature=cfg.oim_temperature, oim_momentum=cfg.oim_momentum,
    )
    trainer = Trainer(step, print_freq=cfg.print_freq, logger=logger)

    sampler = RandomIdentitySampler(items, num_instances=cfg.num_instances,
                                    seed=cfg.seed)
    pre = Preprocessor(src, items=[(f, 0, 0) for f, _, _ in items],
                       batch_size=cfg.batch_size)
    labels_all = np.asarray([p for _, p, _ in items], dtype=np.int32)

    def batch_iter():
        for idx in sampler.batches(cfg.batch_size):
            images, _, _ = pre.gather(idx)
            pid_row = labels_all[idx][None]
            # num_parts triplet rows + one CE identity row (same labels:
            # supervised pretraining trains every branch on true ids).
            yield images, np.concatenate(
                [np.repeat(pid_row, cfg.num_parts, axis=0), pid_row], axis=0
            )

    for epoch in range(cfg.epochs):
        rng, k = jax.random.split(rng)
        state = trainer.train(epoch, state, batch_iter(), k)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    save_checkpoint(
        {"params": state.params, "batch_stats": state.batch_stats,
         "opt_state": state.opt_state, "epoch": cfg.epochs},
        is_best=True, fpath=f"{cfg.logs_dir}/source_checkpoint",
    )
    return state, variables
