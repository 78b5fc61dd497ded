"""Training loop: per-branch batch-hard triplet on pseudo-labels.

Rebuilds the reference's [reid/trainers.py] (SURVEY.md §2 #5, §3.4) the TPU
way: ONE jitted train step containing the on-device augmentation
(crop/flip/normalize), the 3-branch forward, a batch-hard triplet loss per
feature branch against that branch's own pseudo-label set, the backward pass
and the optax update — no host round-trips inside the epoch loop. The host
only renders uint8 batches and feeds them.

bf16 policy: backbone compute bf16 (set via model dtype), params/optimizer
fp32, losses fp32 (SURVEY.md §7f).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from ssg_tpu.data import transforms
from ssg_tpu.ops.triplet import batch_hard_triplet_loss
from ssg_tpu.utils.meters import AverageMeter


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    # OIM lookup table (num_classes, F), threaded functionally through the
    # step when the OIM loss is enabled (loss/oim.py); None otherwise.
    lut: Any = None


def create_train_state(
    model,
    rng: jax.Array,
    input_shape=(2, 256, 128, 3),
    tx: optax.GradientTransformation | None = None,
    learning_rate: float = 6e-5,
    weight_decay: float = 5e-4,
    variables: dict | None = None,
    lut: Any = None,
) -> TrainState:
    """Initialize (or adopt converted torch) variables + optimizer.

    Optimizer default: AdamW(6e-5, wd 5e-4) — the open-reid family's
    self-training setting (SURVEY.md §3.1 [LOW]; configurable).
    """
    if variables is None:
        variables = model.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)
    if tx is None:
        from ssg_tpu.train.schedule import make_optimizer

        # inject_hyperparams: the lr lives in the optimizer state, so the
        # SSG loop can apply epoch-indexed schedules (train/schedule.py)
        # without recompiling the step.
        tx = make_optimizer(learning_rate, weight_decay=weight_decay)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        lut=lut,
        tx=tx,
    )


def make_train_step(
    model,
    margin: float = 0.3,
    num_parts: int = 3,
    ce_weight: float = 0.0,
    height: int = 256,
    width: int = 128,
    remat: bool = False,
    oim_weight: float = 0.0,
    oim_temperature: float = 0.1,
    oim_momentum: float = 0.5,
) -> Callable:
    """Build the jitted SSG train step.

    Step signature: ``step(state, images_u8 (B,H,W,3), labels, rng) ->
    (state, metrics)``. ``labels[g]``, g < num_parts, is branch g's
    pseudo-label set (SURVEY.md §3.4). When ``ce_weight > 0`` and the model
    has classifier heads, ``labels`` carries one extra row
    ``labels[num_parts]`` of true identity labels (-1 = unknown, masked) and
    a per-branch cross-entropy on it is added — the SSG++ supervised term
    (ssg_tpu/train/semi.py).

    ``oim_weight > 0`` adds the open-reid Online Instance Matching loss
    (loss/oim.py; SURVEY.md §2 #7 [LOW] surface) on the L2-normalized
    whole-body embedding against the same identity row ``labels[num_parts]``;
    ``state.lut`` must be a (num_classes, F) table (create_train_state's
    ``lut=``) — it is momentum-updated through the state each step.
    """

    # donate_argnums: the old state's param/opt buffers are dead after the
    # update — letting XLA write the new state in place halves peak HBM for
    # the optimizer step.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, images_u8, labels, rng):
        k_aug, k_drop = jax.random.split(rng)
        x = transforms.train_transform(k_aug, images_u8, height, width)

        def apply_fn(params, x):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": k_drop},
            )

        if remat:
            # Rematerialize backbone activations in the backward pass:
            # trades ~30% extra FLOPs for O(sqrt(depth)) activation memory —
            # the HBM lever for large P x K batches (SURVEY.md §7 bf16/memory
            # row; jax.checkpoint is the idiomatic XLA mechanism).
            apply_fn = jax.checkpoint(apply_fn)

        def loss_fn(params):
            out, updates = apply_fn(params, x)
            emb = out["embeddings"]  # (num_parts, B, F)
            total = 0.0
            precs = []
            for g in range(num_parts):
                loss_g, prec_g = batch_hard_triplet_loss(emb[g], labels[g], margin)
                total = total + loss_g
                precs.append(prec_g)
            if ce_weight > 0.0 and "logits" in out:
                id_labels = labels[num_parts]
                mask = id_labels >= 0
                for g in range(num_parts):
                    ce = optax.softmax_cross_entropy_with_integer_labels(
                        out["logits"][g], jnp.maximum(id_labels, 0)
                    )
                    total = total + ce_weight * jnp.sum(
                        jnp.where(mask, ce, 0.0)
                    ) / jnp.maximum(jnp.sum(mask), 1)
            new_lut = state.lut
            if oim_weight > 0.0:
                from ssg_tpu.loss.oim import oim_loss

                w = emb[0].astype(jnp.float32)  # whole-body branch
                w = w / jnp.maximum(
                    jnp.linalg.norm(w, axis=1, keepdims=True), 1e-12
                )
                oim, new_lut = oim_loss(
                    state.lut, w, labels[num_parts],
                    temperature=oim_temperature, momentum=oim_momentum,
                )
                total = total + oim_weight * oim
            return total, (updates, jnp.stack(precs), new_lut)

        (loss, (updates, precs, new_lut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=updates["batch_stats"], lut=new_lut)
        return state, {"loss": loss, "prec": jnp.mean(precs)}

    return step


class Trainer:
    """Epoch loop with the reference's meters/printing (SURVEY.md §3.4).

    With ``mesh`` set, each batch is placed sharded over the mesh's data
    axis before the step — the ``nn.DataParallel`` replacement (SURVEY.md §2
    parallelism row): params replicated, batch split, XLA inserts the
    gradient all-reduce. The caller replicates the state (parallel.dp).
    """

    def __init__(self, step_fn: Callable, print_freq: int = 10, logger=None,
                 mesh=None):
        self.step_fn = step_fn
        self.print_freq = print_freq
        self.logger = logger
        self.mesh = mesh

    def _place(self, images):
        if self.mesh is None:
            return jnp.asarray(images)
        # global_put via dp.shard_batch: device_put on a single-process
        # mesh, per-process addressable slices on a DCN (multi-host) mesh —
        # every process renders the identical batch and ships its shard.
        from ssg_tpu.parallel.dp import shard_batch

        return shard_batch(self.mesh, images)

    def _rep(self, x):
        """Replicate small per-step operands (labels, rng) over the mesh."""
        if self.mesh is None:
            return jnp.asarray(x)
        from ssg_tpu.parallel.dp import replicate

        return replicate(self.mesh, x)

    def train(self, epoch: int, state: TrainState, batch_iter, rng: jax.Array,
              lr: float | None = None, prefetch_depth: int = 2):
        """``batch_iter`` yields (images_u8, labels (num_parts, B)) host
        arrays. Returns the updated state. ``lr`` (optional): set the
        injected learning rate for this epoch (train/schedule.py).
        ``prefetch_depth``: batches rendered ahead on a producer thread
        (decode releases the GIL, overlapping with step dispatch); 0
        disables."""
        if lr is not None:
            from ssg_tpu.train.schedule import set_learning_rate

            state = set_learning_rate(state, lr)
        if prefetch_depth > 0:
            from ssg_tpu.data.prefetch import prefetch

            batch_iter = prefetch(batch_iter, depth=prefetch_depth)
        losses, precs, batch_time = AverageMeter(), AverageMeter(), AverageMeter()
        end = time.time()
        pending = []  # device-side metrics; synced only at print_freq so
        # step dispatch stays asynchronous (no per-step block_until_ready)
        for i, (images, labels) in enumerate(batch_iter):
            rng, k = jax.random.split(rng)
            state, metrics = self.step_fn(
                state, self._place(images), self._rep(labels), self._rep(k)
            )
            pending.append((i, images.shape[0], metrics))
            batch_time.update(time.time() - end)
            end = time.time()
            if (i + 1) % self.print_freq == 0:
                self._drain(epoch, pending, losses, precs)
                print(
                    f"Epoch: [{epoch}][{i + 1}]\t"
                    f"Time {batch_time.val:.3f} ({batch_time.avg:.3f})\t"
                    f"Loss {losses.val:.3f} ({losses.avg:.3f})\t"
                    f"Prec {precs.val:.2%} ({precs.avg:.2%})"
                )
        self._drain(epoch, pending, losses, precs)
        return state

    def _drain(self, epoch, pending, losses, precs):
        for i, bs, metrics in pending:
            loss = float(metrics["loss"])
            prec = float(metrics["prec"])
            losses.update(loss, bs)
            precs.update(prec, bs)
            if self.logger is not None:
                self.logger.metric(
                    kind="train_step", epoch=epoch, step=i, loss=loss, prec=prec
                )
        pending.clear()
