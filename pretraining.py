#!/usr/bin/env python
"""Supervised source pretraining CLI — produces the source-trained
checkpoint the SSG loop resumes from (SURVEY.md §0 step 1; the reference
consumes such a checkpoint via selftraining.py --resume).

Example (synthetic data, small scale):
  python pretraining.py --dataset market1501 --scale tiny --epochs 2
  python selftraining.py --resume logs/pretrain/source_checkpoint ...
"""

from __future__ import annotations

import argparse
import os
import sys

import jax


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Supervised source pretraining")
    p.add_argument("--dataset", type=str, default="market1501")
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--scale", type=str, default="small")
    p.add_argument("--logs_dir", type=str, default="logs/pretrain")
    p.add_argument("--arch", type=str, default="resnet50")
    p.add_argument("--num_features", type=int, default=0)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_instances", type=int, default=4)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--lr", type=float, default=3.5e-4)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--margin", type=float, default=0.3)
    p.add_argument("--ce_weight", type=float, default=1.0)
    p.add_argument("--loss", type=str, default="softmax",
                   choices=["softmax", "oim"],
                   help="identity loss: per-branch softmax CE (classifier "
                        "heads) or OIM on the whole-body embedding "
                        "(open-reid's softmax-free baseline, loss/oim.py)")
    p.add_argument("--oim_temperature", type=float, default=0.1)
    p.add_argument("--oim_momentum", type=float, default=0.5)
    p.add_argument("--epochs", type=int, default=70)
    p.add_argument("--num_parts", type=int, default=3)
    p.add_argument("--print_freq", type=int, default=10)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--evaluate_on", type=str, default="",
                   help="optional dataset to evaluate on after training")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ssg_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from ssg_tpu import api, models
    from ssg_tpu.data import datasets
    from ssg_tpu.train.pretrain import PretrainConfig, run_pretrain
    from ssg_tpu.utils.logging import Logger

    os.makedirs(args.logs_dir, exist_ok=True)
    logger = Logger(os.path.join(args.logs_dir, "log.txt"))
    sys.stdout = logger
    print(" ".join(sys.argv))

    root = os.path.join(args.data_dir, args.dataset) if args.data_dir else None
    src = datasets.create(args.dataset, root=root, scale=args.scale,
                          seed=args.seed)
    num_ids = len({p for _, p, _ in src.train})
    print(f"source {args.dataset}: train={len(src.train)} ids={num_ids}")

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = models.create(
        args.arch, num_features=args.num_features, dropout=args.dropout,
        # OIM replaces the softmax classifier: no logits heads needed.
        num_classes=num_ids if args.loss == "softmax" else 0,
        num_parts=args.num_parts, dtype=dtype,
    )
    cfg = PretrainConfig(
        epochs=args.epochs, batch_size=args.batch_size,
        num_instances=args.num_instances, margin=args.margin,
        ce_weight=args.ce_weight, lr=args.lr,
        weight_decay=args.weight_decay, num_parts=args.num_parts,
        height=args.height, width=args.width, print_freq=args.print_freq,
        seed=args.seed, logs_dir=args.logs_dir,
        loss=args.loss, oim_temperature=args.oim_temperature,
        oim_momentum=args.oim_momentum,
    )
    _, variables = run_pretrain(model, src, cfg, logger=logger)
    print(f"saved {args.logs_dir}/source_checkpoint")

    if args.evaluate_on:
        tgt = datasets.create(args.evaluate_on, scale=args.scale,
                              seed=args.seed)
        api.Evaluator(model, variables, batch_size=args.batch_size).evaluate(
            tgt, logger=logger
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
