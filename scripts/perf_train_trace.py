#!/usr/bin/env python
"""Per-op profile of the SSG train step (real TPU).

Companion to perf_extract_trace.py: answers where the fwd+bwd time goes
(VERDICT round-1 weak #4 second half — train ~15% MFU). Aggregates traced
device-op time by output shape/dtype so f32 materializations, layout
copies and poorly-fused epilogues are visible at a glance.
"""

import glob
import gzip
import json
import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ssg_tpu import models
from ssg_tpu.train.trainer import create_train_state, make_train_step
from ssg_tpu.utils.cache import enable_compilation_cache
from ssg_tpu.utils import profiling

LOGDIR = "/tmp/ssg_train_trace"


def main():
    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    model = models.create("resnet50", num_features=0, num_parts=3,
                          dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0))
    step = make_train_step(model, num_parts=3)
    k = jax.random.PRNGKey(1)
    images = jax.random.randint(k, (batch, 256, 128, 3), 0, 256, jnp.uint8)
    labels = jnp.tile(jnp.repeat(jnp.arange(batch // 4), 4)[None, :], (3, 1))
    state, metrics = step(state, images, labels, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics)

    n = 8
    with profiling.trace(LOGDIR):
        for i in range(n):
            state, metrics = step(state, images, labels,
                                  jax.random.fold_in(k, i))
        jax.block_until_ready(metrics)
    print("trace captured", flush=True)

    paths = sorted(glob.glob(f"{LOGDIR}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace json found")
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    all_ev = trace.get("traceEvents", [])
    # Lane layout (measured): device pid carries "XLA Modules" (one event
    # per executed program = true device step time) and "XLA Ops" (every
    # leaf HLO op, each annotated with bytes_accessed/model_flops). The
    # jit_step launch events live on a HOST lane — aggregating around them
    # was the round-2 double-count pitfall; leaf ops on the device ops
    # lane carry no nesting, so a straight sum is correct.
    tidnames = {}
    for e in all_ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tidnames[(e["pid"], e["tid"])] = e["args"].get("name")
    try:
        ops_lane = next(k for k, v in tidnames.items() if v == "XLA Ops")
        mods_lane = next(k for k, v in tidnames.items() if v == "XLA Modules")
    except StopIteration:
        print("no XLA device lanes in trace")
        return
    ev = [e for e in all_ev if e.get("ph") == "X" and e.get("dur")]
    steps = [e for e in ev if (e["pid"], e["tid"]) == mods_lane
             and e["name"].startswith("jit_step")]
    step_total = sum(e["dur"] for e in steps) / max(len(steps), 1)
    leaf = [e for e in ev if (e["pid"], e["tid"]) == ops_lane
            and not e["name"].startswith(("jit_", "while", "conditional",
                                          "call"))]
    BW, PK = 819e9, 197e12  # v5e HBM B/s, bf16 FLOP/s
    agg = {}
    for e in leaf:
        a = e.get("args") or {}
        d = agg.setdefault(e["name"].split(".")[0], [0, 0, 0])
        d[0] += e["dur"]
        d[1] += int(a.get("bytes_accessed", 0) or 0)
        d[2] += int(a.get("model_flops", 0) or 0)
    tt = sum(v[0] for v in agg.values())
    tb = sum(v[1] for v in agg.values())
    tf_ = sum(v[2] for v in agg.values())
    print(f"step device total {step_total / 1e3:.2f} ms (batch={batch}, "
          f"{batch / (step_total * 1e-6):,.0f} imgs/s)")
    print(f"leaf sum {tt / 1e3 / n:.2f} ms/step, {tb / n / 2**30:.2f} "
          f"GiB/step -> {tb / (tt * 1e-6) / 1e9:.0f} GB/s aggregate "
          f"({tb / (tt * 1e-6) / BW:.0%} of HBM roofline), "
          f"{tf_ / (tt * 1e-6) / 1e12:.1f} TFLOP/s "
          f"({tf_ / (tt * 1e-6) / PK:.0%} MFU)")
    print(f"{'op':30s} {'ms/st':>7s} {'GiB/st':>7s} {'GB/s':>6s} "
          f"{'bw%':>5s} {'mxu%':>5s}")
    for name, (t, b, f_) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:14]:
        sec = t * 1e-6
        print(f"{name[:30]:30s} {t / 1e3 / n:7.2f} {b / n / 2**30:7.2f} "
              f"{b / sec / 1e9:6.0f} {b / sec / BW:5.0%} {f_ / sec / PK:5.0%}")


if __name__ == "__main__":
    main()
