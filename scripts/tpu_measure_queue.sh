#!/bin/bash
# TPU measurement ladder (VERDICT round-3 items 1+7) — run the moment the
# tunnel answers.  Serialize: ONE TPU process at a time, and pause the
# CPU-side head-to-head (scripts/with_h2h_paused.sh) so host timing is clean:
#
#   bash scripts/with_h2h_paused.sh bash scripts/tpu_measure_queue.sh
#
# Both benches print incrementally and tee to logs, so a timeout still
# leaves partial per-policy results.
set -x
mkdir -p artifacts/r4_measurements
timeout 5400 python scripts/bench_eval_policy.py 20 2>&1 | tee artifacts/r4_measurements/eval_policy.log
timeout 4500 python scripts/bench_fused_kernel.py 50 2>&1 | tee artifacts/r4_measurements/fused_kernel_grid.log
