"""Device-trace aggregation for jax.profiler captures.

Lane layout (measured in this environment's TPU traces): the device pid
carries an "XLA Modules" thread (one event per executed program — the true
device program duration) and an "XLA Ops" thread (every leaf HLO op,
annotated with args.tf_op carrying the jax.named_scope path plus
bytes_accessed / model_flops). jit_* launch events live on HOST lanes;
aggregating around them double-counts nested intervals (the round-2
pitfall — docs/train_profile.md). Leaf ops on the device ops lane carry no
nesting, so straight sums are exact; parent while/conditional/call events
overlap their body ops and are excluded.
"""

from __future__ import annotations

import glob
import gzip
import json
import re


def load_latest(logdir: str) -> dict | None:
    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        return None
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def _lanes(trace):
    tidnames = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tidnames[(e["pid"], e["tid"])] = e["args"].get("name")
    ops = next((k for k, v in tidnames.items() if v == "XLA Ops"), None)
    mods = next((k for k, v in tidnames.items() if v == "XLA Modules"), None)
    return ops, mods


def report_by_scope(logdir: str, scope_re: str = r"[a-z]+_\w+",
                    top_ops: int = 20, divisor: int = 1) -> None:
    """Print device time grouped by named_scope matched with ``scope_re``.

    ``divisor``: number of repetitions in the traced region (per-call
    figures are printed when > 1).
    """
    trace = load_latest(logdir)
    if trace is None:
        print("no trace json found")
        return
    ops_lane, mods_lane = _lanes(trace)
    if ops_lane is None:
        print("no XLA Ops device lane in trace")
        return
    ev = [e for e in trace["traceEvents"]
          if e.get("ph") == "X" and e.get("dur")]
    mods = [e for e in ev if (e["pid"], e["tid"]) == mods_lane]
    if mods:
        tot = sum(e["dur"] for e in mods) / divisor
        print(f"device program total {tot / 1e6:.3f} s per call "
              f"({len(mods)} module runs)")
    leaf = [e for e in ev if (e["pid"], e["tid"]) == ops_lane
            and not e["name"].startswith(("jit_", "while", "conditional",
                                          "call"))]
    pat = re.compile(scope_re)
    by_phase, by_op, total = {}, {}, 0
    for e in leaf:
        tf = str((e.get("args") or {}).get("tf_op", ""))
        m = pat.search(tf)
        phase = m.group(0) if m else "(other)"
        by_phase[phase] = by_phase.get(phase, 0) + e["dur"]
        key = (phase, e["name"].split(".")[0])
        by_op[key] = by_op.get(key, 0) + e["dur"]
        total += e["dur"]
    print(f"leaf device op sum {total / divisor / 1e6:.3f} s per call")
    for phase, dur in sorted(by_phase.items(), key=lambda kv: -kv[1]):
        print(f"{dur / divisor / 1e3:10.2f} ms  {phase}")
    print("---- top ops ----")
    for (phase, op), dur in sorted(by_op.items(),
                                   key=lambda kv: -kv[1])[:top_ops]:
        print(f"{dur / divisor / 1e3:10.3f} ms  {phase:16s} {op}")
