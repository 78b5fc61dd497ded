#!/bin/bash
# Round-5 chip measurement queue (VERDICT tasks #2/#4/#5/#7).
cd /root/repo
L=logs/perf_r5
run() { echo "=== $* ($(date +%H:%M:%S)) ==="; timeout 3600 python "$@"; echo "=== exit $? ==="; }
run scripts/perf_iteration.py 16384 128 256 1  > $L/iteration_fused.log 2>&1
run scripts/perf_iteration.py 16384 128 256 0  > $L/iteration_unfused.log 2>&1
run scripts/perf_fallback.py 16384             > $L/fallback.log 2>&1
run scripts/perf_rerank_eval.py 3368 15913     > $L/rerank_market.log 2>&1
run scripts/perf_rerank_eval.py 6144 36864     > $L/rerank_msmt.log 2>&1
run scripts/perf_train_fp8.py 256 30           > $L/train_fp8.log 2>&1
echo DONE > $L/BATCH_DONE
