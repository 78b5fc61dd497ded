#!/bin/bash
# Measurement battery for TPU-outage recovery: poll until the axon backend
# initializes, then run every pending round-3 measurement sequentially.
# Each stage gets a generous timeout and logs to $LOG; a stage failure
# (the environment's intermittent UNAVAILABLE faults) does not stop the
# battery. Never kills a process mid-op beyond the per-stage timeout.
set -u
cd /root/repo
LOG=${1:-/tmp/battery.log}
: > "$LOG"

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print(jnp.ones((8,8)).sum(), jax.devices())" >> "$LOG" 2>&1
}

echo "[battery] waiting for TPU backend..." >> "$LOG"
tries=0
until probe; do
  tries=$((tries + 1))
  if [ "$tries" -ge 90 ]; then
    echo "[battery] gave up after $tries probes" >> "$LOG"
    exit 1
  fi
  sleep 300
done
echo "[battery] backend up after $tries failed probes; sleeping 60s" >> "$LOG"
sleep 60

run() {
  echo "===== [battery] $* =====" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "[battery] exit=$? : $*" >> "$LOG"
  sleep 30
}

run python scripts/perf_streaming.py 16384 1024
run python scripts/perf_streaming_trace.py 16384 1024
run python bench.py
run python scripts/perf_streaming.py 24576 1024
run python scripts/perf_iteration.py 16384
run python scripts/perf_rerank_eval.py 3368 15000
echo "[battery] DONE" >> "$LOG"
