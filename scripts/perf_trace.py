#!/usr/bin/env python
"""Capture a jax.profiler trace of the fused analytics graph (bench shapes)
and print a per-op time summary from the trace."""

import glob
import gzip
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ssg_tpu.api import cluster_groups
from ssg_tpu.utils.cache import enable_compilation_cache
from ssg_tpu.utils import profiling

N, F, G = 3368, 2048, 3
LOGDIR = "/tmp/ssg_trace"


def main():
    enable_compilation_cache()
    k = jax.random.PRNGKey(0)
    centers = jax.random.normal(jax.random.fold_in(k, 1), (G, 300, F))
    assign = jax.random.randint(jax.random.fold_in(k, 2), (G, N), 0, 300)
    feats = jnp.take_along_axis(
        centers, assign[..., None].repeat(F, -1), axis=1
    ) + 0.3 * jax.random.normal(jax.random.fold_in(k, 3), (G, N, F))
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    feats.block_until_ready()

    cluster_groups(feats)  # warm
    with profiling.trace(LOGDIR):
        cluster_groups(feats)
    print("trace captured", flush=True)

    # Summarize: find trace.json.gz and aggregate device-op durations.
    paths = glob.glob(f"{LOGDIR}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace json found:", glob.glob(f"{LOGDIR}/**/*", recursive=True)[:10])
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    # Keep device-lane events (TPU op streams have 'run_id'/'kernel' args or
    # names that aren't python functions); aggregate by name prefix.
    agg = {}
    for e in events:
        name = e["name"].split(".")[0][:48]
        agg[name] = agg.get(name, 0) + e["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
    total = sum(agg.values())
    print(f"total traced op-time {total / 1e3:.1f} ms")
    for name, dur in top:
        print(f"{dur / 1e3:9.2f} ms  {name}")


if __name__ == "__main__":
    main()
