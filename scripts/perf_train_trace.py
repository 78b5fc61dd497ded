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
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    # Device-op lane: the pid/tid of the jit_step executables; aggregate
    # only TOP-LEVEL intervals on it (nested scopes like named
    # subcomputations would otherwise double-count — the round-2 pitfall).
    steps = [e for e in events if e["name"].startswith("jit_step")]
    if not steps:
        print("no jit_step events in trace")
        return
    lane = (steps[0].get("pid"), steps[0].get("tid"))
    step_total = sum(e["dur"] for e in steps)
    inner = sorted(
        (e for e in events
         if (e.get("pid"), e.get("tid")) == lane
         and not e["name"].startswith(("jit_", "$", "PjitFunction"))),
        key=lambda e: e["ts"])
    top, end = [], -1
    for e in inner:
        if e["ts"] >= end:
            top.append(e)
            end = e["ts"] + e["dur"]
    by_shape, total = {}, 0
    for e in top:
        meta = (e.get("args") or {}).get("long_name", "")
        m = re.match(r"%\S+ = (\S+?)\{", meta)
        shape = m.group(1) if m else e["name"].split(".")[0]
        by_shape[shape] = by_shape.get(shape, 0) + e["dur"]
        total += e["dur"]
    print(f"step total {step_total / n / 1e3:.2f} ms; top-level op sum "
          f"{total / n / 1e3:.2f} ms/step (batch={batch})")
    for shape, dur in sorted(by_shape.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{dur / n / 1e3:8.3f} ms/step  {shape}")


if __name__ == "__main__":
    main()
