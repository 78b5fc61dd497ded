#!/usr/bin/env python
"""SSG self-training CLI — the reference's [selftraining.py] entry point
rebuilt for TPU (SURVEY.md §3.1). Flag names mirror the reference's argparse
set where they exist (SURVEY.md §5 config row).

Example (synthetic data, small scale):
  python selftraining.py --src_dataset market1501 --tgt_dataset dukemtmc \
      --scale tiny --iteration 2 --epochs 2 --batch_size 32
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native Self-Similarity Grouping")
    p.add_argument("--src_dataset", type=str, default="market1501")
    p.add_argument("--tgt_dataset", type=str, default="dukemtmc")
    p.add_argument("--data_dir", type=str, default=None,
                   help="root with <dataset>/images; synthetic if absent")
    p.add_argument("--scale", type=str, default="small",
                   help="synthetic dataset scale: tiny|small|full|<fraction>")
    p.add_argument("--logs_dir", type=str, default="logs/ssg")
    p.add_argument("--arch", type=str, default="resnet50")
    p.add_argument("--num_features", type=int, default=0)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--last_stride", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_instances", type=int, default=4)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--lr", type=float, default=6e-5)
    p.add_argument("--lr_schedule", type=str, default="constant",
                   choices=["constant", "step"],
                   help="epoch-indexed lr schedule within each iteration")
    p.add_argument("--lr_step_size", type=int, default=40,
                   help="StepLR period in epochs (lr_schedule=step)")
    p.add_argument("--lr_gamma", type=float, default=0.1)
    p.add_argument("--warmup_epochs", type=int, default=0,
                   help="linear lr warmup epochs (0 disables)")
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--margin", type=float, default=0.3)
    p.add_argument("--epochs", type=int, default=70)
    p.add_argument("--iteration", type=int, default=30)
    p.add_argument("--k1", type=int, default=20)
    p.add_argument("--k2", type=int, default=6)
    p.add_argument("--lambda_value", type=float, default=0.1)
    p.add_argument("--rho", type=float, default=1.6e-3)
    p.add_argument("--rho_growth", type=float, default=0.0,
                   help="per-iteration eps-quantile growth: rho_it = "
                        "rho*(1+g)^it; grows clusters over iterations "
                        "(keep-rate lever; 0 = reference fixed rho)")
    p.add_argument("--min_samples", type=int, default=4)
    p.add_argument("--num_parts", type=int, default=3)
    p.add_argument("--print_freq", type=int, default=10)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--resume", type=str, default="",
                   help="checkpoint: orbax dir or torch .pth(.tar)")
    p.add_argument("--resume_loop", type=str, default="",
                   help="loop checkpoint dir (params+opt_state+iteration) "
                        "to continue an interrupted SSG run")
    p.add_argument("--evaluate", action="store_true",
                   help="eval only (reference --evaluate short-circuit)")
    p.add_argument("--rerank", action="store_true",
                   help="k-reciprocal re-ranking at test time")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--data_parallel", action="store_true",
                   help="mesh over all devices: sharded extraction + "
                        "streaming mesh clustering (multi-chip)")
    p.add_argument("--multihost", action="store_true",
                   help="join the multi-process runtime before touching "
                        "devices (jax.distributed; Cloud TPU pods "
                        "auto-discover). Combine with --data_parallel for "
                        "the DCN x ICI global mesh (BASELINE config 5)")
    p.add_argument("--dist_coordinator", type=str, default=None,
                   help="host:port for explicit clusters (else auto)")
    p.add_argument("--dist_num_processes", type=int, default=None)
    p.add_argument("--dist_process_id", type=int, default=None)
    return p


def maybe_init_multihost(args) -> None:
    if getattr(args, "multihost", False):
        from ssg_tpu.parallel import initialize_multihost

        initialize_multihost(coordinator=args.dist_coordinator,
                             num_processes=args.dist_num_processes,
                             process_id=args.dist_process_id)


def load_model_and_variables(args):
    from ssg_tpu import models
    from ssg_tpu.models.convert import load_torch_checkpoint

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = models.create(
        args.arch, num_features=args.num_features, dropout=args.dropout,
        num_parts=args.num_parts, last_stride=args.last_stride, dtype=dtype,
    )
    if args.resume and (args.resume.endswith(".pth") or args.resume.endswith(".tar")):
        variables = jax.tree.map(jnp.asarray, load_torch_checkpoint(args.resume))
    elif args.resume:
        from ssg_tpu.utils.serialization import load_checkpoint

        ckpt = load_checkpoint(args.resume)
        variables = jax.tree.map(
            jnp.asarray,
            {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]},
        )
    else:
        variables = model.init(
            jax.random.PRNGKey(args.seed),
            jnp.zeros((2, args.height, args.width, 3), jnp.float32),
            train=False,
        )
    return model, variables


def main(argv=None):
    args = build_parser().parse_args(argv)
    maybe_init_multihost(args)
    from ssg_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from ssg_tpu import api
    from ssg_tpu.data import datasets
    from ssg_tpu.train.ssg_loop import SSGConfig, run_ssg
    from ssg_tpu.utils.logging import Logger

    os.makedirs(args.logs_dir, exist_ok=True)
    logger = Logger(os.path.join(args.logs_dir, "log.txt"))
    sys.stdout = logger
    print(" ".join(sys.argv))
    print(f"devices: {jax.devices()}")

    root = os.path.join(args.data_dir, args.tgt_dataset) if args.data_dir else None
    tgt = datasets.create(args.tgt_dataset, root=root, scale=args.scale,
                          seed=args.seed)
    print(f"target {args.tgt_dataset}: train={len(tgt.train)} "
          f"query={len(tgt.query)} gallery={len(tgt.gallery)}")

    model, variables = load_model_and_variables(args)

    if args.evaluate:
        api.Evaluator(model, variables, batch_size=args.batch_size).evaluate(
            tgt, rerank=args.rerank, logger=logger
        )
        return 0

    cfg = SSGConfig(
        iterations=args.iteration, epochs=args.epochs,
        batch_size=args.batch_size, num_instances=args.num_instances,
        k1=args.k1, k2=args.k2, lambda_value=args.lambda_value,
        rho=args.rho, rho_growth=args.rho_growth,
        min_samples=args.min_samples, margin=args.margin,
        lr=args.lr, lr_schedule=args.lr_schedule,
        lr_step_size=args.lr_step_size, lr_gamma=args.lr_gamma,
        warmup_epochs=args.warmup_epochs,
        weight_decay=args.weight_decay, num_parts=args.num_parts,
        height=args.height, width=args.width, print_freq=args.print_freq,
        seed=args.seed, eval_rerank=args.rerank, logs_dir=args.logs_dir,
        data_parallel=args.data_parallel,
    )
    _, history = run_ssg(model, variables, tgt, cfg, logger=logger,
                         resume_from=args.resume_loop or None)
    if history and "mAP" in history[-1]:
        print(f"final mAP {history[-1]['mAP']:.1%}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
