#!/usr/bin/env python
"""Per-phase device-time attribution of the streaming pipeline (real TPU).

VERDICT r2 next #3: wall-clock through the tunnel transport is quantized
(three different programs measured exactly 17.50 s), so phase decisions
must come from a jax.profiler device trace. The pipeline's fori/while
loops are wrapped in jax.named_scope (parallel/streaming.py) — this script
captures one steady-state streaming_cluster run and aggregates TOP-LEVEL
device-op intervals by scope prefix (top-level interval merging avoids the
nested-event double-count that voided the round-2 attempt).

Usage: perf_streaming_trace.py [N] [chunk] [band_cap]
"""

import glob
import gzip
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ssg_tpu.parallel import make_mesh
from ssg_tpu.parallel.streaming import streaming_cluster
from ssg_tpu.utils.cache import enable_compilation_cache
from ssg_tpu.utils import profiling

LOGDIR = "/tmp/ssg_streaming_trace"

PHASES = ("s_p1_ranklists", "s_p1_recip", "s_p2_vstripe", "s_p2_qe",
          "s_p3_coarse", "s_p3_fine_adj", "s_p4_adj", "s_p4_dbscan")


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    band_cap = int(sys.argv[3]) if len(sys.argv) > 3 else -1
    band_cap = None if band_cap < 0 else band_cap  # -1 = auto-scale
    import numpy as np

    k = jax.random.PRNGKey(0)
    ids = max(n // 12, 2)
    centers = jax.random.normal(jax.random.fold_in(k, 1), (ids, 2048))
    assign = jax.random.randint(jax.random.fold_in(k, 2), (n,), 0, ids)
    feats = centers[assign] + 0.3 * jax.random.normal(
        jax.random.fold_in(k, 3), (n, 2048))
    feats = (feats / jnp.linalg.norm(feats, axis=1, keepdims=True)).astype(
        jnp.float32)
    mesh = make_mesh(1)
    kw = dict(k1=20, k2=6, rho=1.6e-3, min_samples=4, chunk=chunk,
              band_cap=band_cap)
    labels, n_clusters, eps = streaming_cluster(feats, mesh, **kw)
    np.asarray(labels)  # host readback = the reliable completion barrier
    print(f"warmed: {int(n_clusters)} clusters", flush=True)

    with profiling.trace(LOGDIR):
        labels, n_clusters, eps = streaming_cluster(feats, mesh, **kw)
        np.asarray(labels)
    print("trace captured", flush=True)

    report(LOGDIR, n, chunk, band_cap)


def report(logdir, n=0, chunk=0, band_cap=0):
    """Aggregate leaf device-op time by named_scope from the newest trace.

    Lane layout (measured in this environment): the device pid carries an
    "XLA Modules" thread (one event per executed program = true device
    program duration) and an "XLA Ops" thread (every HLO op, including
    parent while/cond events that OVERLAP their body ops — those parents
    are excluded so nothing double-counts). The named_scope path arrives
    in each op's args.tf_op.
    """
    import re

    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace json found")
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    all_ev = trace.get("traceEvents", [])
    dev_pids = {e["pid"] for e in all_ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "device:" in str(e.get("args", {}).get("name", ""))}
    events = [e for e in all_ev
              if e.get("ph") == "X" and e.get("dur")
              and e.get("pid") in dev_pids]
    prog = [e for e in events if e["name"].startswith("jit_")]
    if prog:
        print(f"program total {sum(e['dur'] for e in prog) / 1e6:.2f} s")
    leaf = [e for e in events
            if not e["name"].startswith(("jit_", "while", "conditional",
                                         "call"))]
    by_phase, by_op, total = {}, {}, 0
    for e in leaf:
        tf = str((e.get("args") or {}).get("tf_op", ""))
        m = re.findall(r"s_[pe]\w+", tf)
        phase = m[-1] if m else "(other)"  # deepest scope (sub-phases nest)
        by_phase[phase] = by_phase.get(phase, 0) + e["dur"]
        by_op[(phase, e["name"].split(".")[0])] = \
            by_op.get((phase, e["name"].split(".")[0]), 0) + e["dur"]
        total += e["dur"]
    print(f"leaf device op sum {total / 1e6:.2f} s "
          f"(N={n}, chunk={chunk}, band_cap={band_cap})")
    for phase, dur in sorted(by_phase.items(), key=lambda kv: -kv[1]):
        print(f"{dur / 1e6:8.3f} s  {phase}")
    print("---- top ops ----")
    for (phase, op), dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{dur / 1e6:8.3f} s  {phase:16s} {op}")


if __name__ == "__main__":
    main()
