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

# The ladder writes artifacts/measured_policy.json (the winning
# production-expressible policy); it is the framework-wide lowering default
# from the moment it exists (layers.measured_policy_default), so commit it —
# every later step in this queue (headline bench, flagship train) and every
# future run then uses the measured winner.
if [[ -f artifacts/measured_policy.json ]]; then
  git add artifacts/measured_policy.json artifacts/r4_measurements/eval_policy.log
  git commit -m "Set measured lowering policy default from on-TPU eval ladder" || true
fi

timeout 4500 python scripts/bench_fused_kernel.py 50 2>&1 | tee artifacts/r4_measurements/fused_kernel_grid.log

# Hedge steps: useful TPU output even if the operator session dies before it
# can analyze the ladder.  (1) a headline bench.py run under the current
# production-default policy, (2) a bounded, resumable flagship-shape training
# kickoff (VERDICT round-3 item 3) — the long pole, needs no judgment call.
timeout 1800 python bench.py 2>&1 | tee artifacts/r4_measurements/bench_default.log

# (3) short on-TPU VS-CMDE run (VERDICT r4 item 5): train with the sigma_y
# anneal TB-visible, checkpoint, then test-mode restore through the harness.
# Short and fixed-cost, so it runs BEFORE the long flagship stage.
timeout 2400 python main.py \
    --config configs/artifacts/texture64_sr_dv.py \
    --config.training.n_iters=1500 \
    --mode train --log_path artifacts/vscmde_tpu 2>&1 | tee artifacts/r4_measurements/vscmde_train.log
timeout 1200 python main.py \
    --config configs/artifacts/texture64_sr_dv.py \
    --mode test --log_path artifacts/vscmde_tpu 2>&1 | tee artifacts/r4_measurements/vscmde_test.log

# (4) the flagship 160px training kickoff — the long pole, last.
FLAGSHIP_TIMEOUT=${QUEUE_FLAGSHIP_TIMEOUT:-10800} \
  bash scripts/tpu_flagship_train.sh 2>&1 | tee /tmp/flagship160.log
