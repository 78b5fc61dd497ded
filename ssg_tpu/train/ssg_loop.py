"""The SSG self-training loop: extract -> re-rank -> cluster -> fine-tune.

Rebuild of the reference's [selftraining.py] main loop (SURVEY.md §3.1),
with the entire per-iteration analytics block (distance, k-reciprocal,
eps, DBSCAN x 3 feature groups) on device — the reference's host-side
serial bottleneck (SURVEY.md §3.1 note).

Pseudo-label join rule: an image participates in fine-tuning when it is
non-noise in EVERY feature group (SURVEY.md §3.1 [MED]); each branch is
then trained against its own group's labels, remapped to a dense range.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import numpy as np

from ssg_tpu import api
from ssg_tpu.data.preprocessor import Preprocessor
from ssg_tpu.data.sampler import RandomIdentitySampler
from ssg_tpu.train.schedule import lr_at
from ssg_tpu.train.trainer import Trainer, create_train_state, make_train_step
from ssg_tpu.utils.serialization import load_checkpoint, save_checkpoint


@dataclasses.dataclass
class SSGConfig:
    """Flags mirror the reference's argparse set (SURVEY.md §5 config row)."""

    iterations: int = 30
    epochs: int = 70
    batch_size: int = 64
    num_instances: int = 4  # K in the P x K sampler
    k1: int = 20
    k2: int = 6
    lambda_value: float = 0.1
    rho: float = 1.6e-3
    # Per-iteration eps-quantile growth: rho_it = rho * (1+rho_growth)^it.
    # 0 = the reference's fixed rho. Small positive values grow clusters
    # over iterations — the keep-rate lever when the whole-body join rule
    # starves fine-tuning at small target scales (ROADMAP "keep-rate").
    rho_growth: float = 0.0
    min_samples: int = 4
    margin: float = 0.3
    lr: float = 6e-5
    # LR schedule (train/schedule.py): constant is the documented
    # reconstruction default (PARITY.md); 'step' gives the open-reid
    # family's StepLR, applied within each clustering iteration.
    lr_schedule: str = "constant"
    lr_step_size: int = 40
    lr_gamma: float = 0.1
    warmup_epochs: int = 0
    weight_decay: float = 5e-4
    num_parts: int = 3
    height: int = 256
    width: int = 128
    print_freq: int = 10
    seed: int = 0
    eval_rerank: bool = False
    logs_dir: str = "logs"
    data_parallel: bool = False  # mesh over all devices: sharded extract,
    # streaming per-group clustering AND data-parallel fine-tuning (batch
    # split over the data axis, params replicated) — the multi-chip path


def _dense_remap_keep_noise(labels: np.ndarray) -> np.ndarray:
    """Remap non-negative labels to 0..K-1 (order-preserving); -1 stays -1."""
    uniq = np.unique(labels[labels >= 0])
    lut = {int(v): i for i, v in enumerate(uniq)}
    return np.asarray(
        [lut[int(v)] if v >= 0 else -1 for v in labels], dtype=np.int32
    )


def join_rule(labels: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """SSG pseudo-label join: the whole-body group (row 0) decides dataset
    membership; part groups keep their own labels with noise as -1, masked
    inside that branch's triplet loss (SURVEY.md §3.1 [MED]; the all-groups
    intersection starves training whenever one part clusters sparsely).

    Args:   labels (num_groups, N) int32, -1 = DBSCAN noise.
    Returns (keep mask (N,), kept_idx, kept_labels (num_groups, K) densely
    remapped per group with noise preserved).
    """
    keep = labels[0] >= 0
    kept_idx = np.flatnonzero(keep)
    kept_labels = np.stack([_dense_remap_keep_noise(l[keep]) for l in labels])
    return keep, kept_idx, kept_labels


def run_ssg(model, variables, tgt, config: SSGConfig | None = None, logger=None,
            evaluate_every: int = 1, one_shot: dict[int, int] | None = None,
            ce_weight: float = 0.0, resume_from: str | None = None):
    """Run SSG adaptation of ``model`` (initialized with source-trained
    ``variables``) on target dataset ``tgt``. Returns (state, history).

    SSG++ ([semitraining.py] rebuild): pass ``one_shot`` ({train index ->
    true pid}, see train/semi.one_shot_subset) and ``ce_weight`` > 0; the
    model must have classifier heads sized to the identity count.

    ``resume_from``: path of a loop checkpoint (params + opt_state +
    iteration, as written each iteration below) — continues from the next
    clustering iteration with the optimizer state intact (SURVEY.md §5
    checkpoint/resume row).
    """
    from ssg_tpu.train.semi import affiliate_clusters

    cfg = config or SSGConfig()
    semi = one_shot is not None and ce_weight > 0.0
    rng = jax.random.PRNGKey(cfg.seed)
    start_iter = 0
    if resume_from is not None:
        ckpt = load_checkpoint(resume_from)
        variables = {"params": ckpt["params"],
                     "batch_stats": ckpt["batch_stats"]}
        start_iter = int(ckpt["iteration"]) + 1
        print(f"Resumed from {resume_from}: continuing at iteration {start_iter}")
    state = create_train_state(
        model, rng, variables=variables,
        learning_rate=cfg.lr, weight_decay=cfg.weight_decay,
        input_shape=(2, cfg.height, cfg.width, 3),
    )
    if resume_from is not None and "opt_state" in ckpt:
        # Orbax returns plain lists/dicts; rebuild the optimizer pytree
        # structure from the freshly-created state (leaf order is stable:
        # dicts flatten key-sorted on both sides, sequences keep order).
        treedef = jax.tree.structure(state.opt_state)
        leaves = jax.tree.leaves(ckpt["opt_state"])
        restored = jax.tree.unflatten(treedef, leaves)
        restored = jax.tree.map(
            lambda ref, val: jax.numpy.asarray(val, ref.dtype),
            state.opt_state, restored,
        )
        state = state.replace(opt_state=restored)
    mesh = None
    if cfg.data_parallel:
        from ssg_tpu.parallel import make_mesh
        from ssg_tpu.parallel.dp import replicate

        mesh = make_mesh()
        if cfg.batch_size % mesh.size:
            raise ValueError(
                f"--batch_size {cfg.batch_size} must be divisible by the "
                f"mesh size {mesh.size} under --data_parallel"
            )
        # Params/opt_state replicated once; every train step then runs
        # SPMD with the batch split over the data axis.
        state = replicate(mesh, state)
        print(f"data-parallel over {mesh.size} devices")

    step = make_train_step(
        model, margin=cfg.margin, num_parts=cfg.num_parts,
        height=cfg.height, width=cfg.width,
        ce_weight=ce_weight if semi else 0.0,
    )
    trainer = Trainer(step, print_freq=cfg.print_freq, logger=logger,
                      mesh=mesh)
    history = []
    best_map = -1.0

    for it in range(start_iter, cfg.iterations):
        t_iter = time.time()
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        # 1) Extract multi-branch features for the unlabeled target train set.
        pre = Preprocessor(tgt, items=tgt.train, batch_size=cfg.batch_size)
        feats, _, cams, fnames = api.extract_features(model, variables, pre,
                                                      mesh=mesh)
        n = feats.shape[1]

        # 2) Per feature group: k-reciprocal re-rank + auto-eps DBSCAN, all
        #    on device (SURVEY.md §3.1a-c) — one fused graph single-device,
        #    the streaming mesh pipeline under data_parallel.
        t_cluster = time.time()
        rho_it = cfg.rho * (1.0 + cfg.rho_growth) ** it
        if mesh is not None:
            import numpy as _np

            from ssg_tpu.parallel import streaming_cluster_groups

            # All groups in ONE device program (one dispatch instead of
            # num_parts; per-group results identical to separate calls).
            glabels, counts, epss = streaming_cluster_groups(
                feats, mesh, k1=cfg.k1, k2=cfg.k2,
                lambda_value=cfg.lambda_value, rho=rho_it,
                min_samples=cfg.min_samples,
            )
            labels = _np.asarray(glabels)
        else:
            labels, counts, epss = api.cluster_groups(
                feats, k1=cfg.k1, k2=cfg.k2, lambda_value=cfg.lambda_value,
                rho=rho_it, min_samples=cfg.min_samples,
            )
        cluster_info = list(zip(counts, epss))
        t_cluster = time.time() - t_cluster

        # 3) Join rule (see join_rule): whole-body group decides membership,
        #    part groups keep their own labels with noise masked per branch.
        keep, kept_idx, kept_labels = join_rule(labels)
        if semi:
            # SSG++: extra label row of affiliated true identities (CE term).
            id_labels = affiliate_clusters(labels[0], one_shot)
            kept_labels = np.concatenate(
                [kept_labels, id_labels[kept_idx][None]], axis=0
            )
            if logger is not None:
                logger.metric(
                    kind="affiliation", iteration=it,
                    supervised=int((id_labels[kept_idx] >= 0).sum()),
                )
        keep_rate = float(keep.sum()) / max(n, 1)
        for g, (nc, eps) in enumerate(cluster_info):
            print(
                f"Iteration {it} group {g}: {nc} clusters, eps={eps:.4f}, "
                f"kept {keep.sum()}/{n} images ({keep_rate:.0%}, "
                f"{t_cluster:.1f}s on device)"
            )
        if logger is not None:
            logger.metric(
                kind="cluster", iteration=it,
                clusters=[int(c) for c, _ in cluster_info],
                eps=[float(e) for _, e in cluster_info],
                kept=int(keep.sum()), total=int(n),
                keep_rate=keep_rate, rho=rho_it,
                cluster_seconds=t_cluster,
            )
        if keep.sum() < cfg.num_instances * 2:
            print(f"Iteration {it}: too few clustered images; skipping training")
            continue

        # 4) Fine-tune: P x K batches over whole-body pseudo-ids, per-branch
        #    triplet against each branch's own labels (SURVEY.md §3.4).
        kept_items = [
            (fnames[i], int(kept_labels[0, j]), int(cams[i]))
            for j, i in enumerate(kept_idx)
        ]
        sampler = RandomIdentitySampler(
            kept_items, num_instances=cfg.num_instances, seed=cfg.seed + it
        )
        if len(sampler) < cfg.batch_size:
            # P x K epochs are num_ids * K long; fewer clusters than P means
            # zero full batches and silent no-op training. Surface it.
            print(
                f"Iteration {it}: only {len(sampler)} P x K samples for "
                f"batch_size {cfg.batch_size} — lower --batch_size or raise "
                f"--rho; skipping training"
            )
            continue
        sub_pre = Preprocessor(tgt, items=[(fnames[i], 0, 0) for i in kept_idx],
                               batch_size=cfg.batch_size)

        def batch_iter(epoch_seed):
            # Epoch order keyed on (seed, iteration, epoch): resumed runs
            # replay identical epochs regardless of sampler history.
            for idx in sampler.batches(cfg.batch_size, seed=epoch_seed):
                images, _, _ = sub_pre.gather(idx)
                yield images, kept_labels[:, idx]

        for epoch in range(cfg.epochs):
            rng, k = jax.random.split(rng)
            lr = lr_at(epoch, cfg.lr, cfg.lr_schedule, cfg.lr_step_size,
                       cfg.lr_gamma, cfg.warmup_epochs)
            state = trainer.train(
                epoch, state, batch_iter(cfg.seed + 1000 * it + epoch), k,
                lr=lr,
            )

        # 5) Evaluate + checkpoint per iteration (SURVEY.md §3.1 tail).
        entry = {"iteration": it, "clusters": cluster_info,
                 "kept": int(keep.sum()), "seconds": time.time() - t_iter}
        if tgt.query and (it % evaluate_every == 0 or it == cfg.iterations - 1):
            ev = api.Evaluator(
                model,
                {"params": state.params, "batch_stats": state.batch_stats},
                batch_size=cfg.batch_size, mesh=mesh,
            )
            res = ev.evaluate(tgt, rerank=cfg.eval_rerank, logger=logger)
            entry["mAP"] = res["mAP"]
            entry["rank1"] = float(res["cmc"][0])
            is_best = res["mAP"] > best_map
            best_map = max(best_map, res["mAP"])
        else:
            is_best = False
        save_checkpoint(
            {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "iteration": it,
            },
            is_best,
            fpath=f"{cfg.logs_dir}/checkpoint",
        )
        history.append(entry)

    return state, history
