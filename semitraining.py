#!/usr/bin/env python
"""SSG++ semi-supervised CLI — the reference's [semitraining.py] entry point
rebuilt for TPU (SURVEY.md §2 #2): SSG plus a one-shot labeled target subset
(one labeled image per identity) that affiliates clusters with identities and
adds a supervised cross-entropy term.

Example:
  python semitraining.py --tgt_dataset market1501 --scale tiny \
      --iteration 1 --epochs 1 --ce_weight 0.5
"""

from __future__ import annotations

import os
import sys

import jax

from selftraining import build_parser, load_model_and_variables


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--ce_weight", type=float, default=0.5,
                        help="weight of the one-shot supervised CE term")
    parser.add_argument("--one_shot_seed", type=int, default=0)
    args = parser.parse_args(argv)
    from selftraining import maybe_init_multihost

    maybe_init_multihost(args)

    from ssg_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from ssg_tpu import api
    from ssg_tpu.data import datasets
    from ssg_tpu.train.semi import one_shot_subset
    from ssg_tpu.train.ssg_loop import SSGConfig, run_ssg
    from ssg_tpu.utils.logging import Logger

    os.makedirs(args.logs_dir, exist_ok=True)
    logger = Logger(os.path.join(args.logs_dir, "log.txt"))
    sys.stdout = logger
    print(" ".join(sys.argv))

    root = os.path.join(args.data_dir, args.tgt_dataset) if args.data_dir else None
    tgt = datasets.create(args.tgt_dataset, root=root, scale=args.scale,
                          seed=args.seed)
    one_shot = one_shot_subset(tgt.train, seed=args.one_shot_seed)
    # CE class indices must be dense 0..K-1; real benchmark pids are sparse
    # (e.g. Market ids run to 1501), so remap the one-shot labels.
    dense = {p: i for i, p in enumerate(sorted({pid for _, pid, _ in tgt.train}))}
    one_shot = {idx: dense[pid] for idx, pid in one_shot.items()}
    num_ids = len(dense)
    print(f"target {args.tgt_dataset}: train={len(tgt.train)} "
          f"one-shot={len(one_shot)} ids={num_ids}")

    # SSG++ needs classifier heads sized to the identity count.
    args.num_features = args.num_features or 0
    from ssg_tpu import models
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = models.create(
        args.arch, num_features=args.num_features, dropout=args.dropout,
        num_parts=args.num_parts, num_classes=num_ids,
        last_stride=args.last_stride, dtype=dtype,
    )
    if args.resume:
        _, variables = load_model_and_variables(args)
        # Resumed checkpoints may lack classifier heads, or carry heads sized
        # to the SOURCE identity count (pretraining checkpoints) — keep the
        # fresh target-sized heads in either case.
        init = model.init(
            jax.random.PRNGKey(args.seed),
            jnp.zeros((2, args.height, args.width, 3), jnp.float32),
            train=False,
        )

        from ssg_tpu.utils.serialization import copy_state_dict

        params = copy_state_dict(variables["params"], dict(init["params"]))
        variables = {"params": params, "batch_stats": variables["batch_stats"]}
    else:
        variables = model.init(
            jax.random.PRNGKey(args.seed),
            jnp.zeros((2, args.height, args.width, 3), jnp.float32),
            train=False,
        )

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
    _, history = run_ssg(
        model, variables, tgt, cfg, logger=logger,
        one_shot=one_shot, ce_weight=args.ce_weight,
        resume_from=args.resume_loop or None,
    )
    if history and "mAP" in history[-1]:
        print(f"final mAP {history[-1]['mAP']:.1%}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
