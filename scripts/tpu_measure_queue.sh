#!/bin/bash
# TPU measurement ladder (VERDICT round-3 items 1+7) — run the moment the
# tunnel answers.  Serialize: ONE TPU process at a time.
set -x
mkdir -p artifacts/r4_measurements
timeout 3000 python scripts/bench_eval_policy.py 20 2>&1 | tee artifacts/r4_measurements/eval_policy.log
timeout 3000 python scripts/bench_fused_kernel.py 50 2>&1 | tee artifacts/r4_measurements/fused_kernel_grid.log
