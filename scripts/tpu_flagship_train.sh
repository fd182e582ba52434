#!/bin/bash
# Flagship-shape TPU training (VERDICT round-3 item 3): the headline 160px
# 8x-SR CMDE recipe (reference configs/ve/inverse_problems/super_resolution/
# celebA_ours_NDV_160.py shape) on the offline texture160 dataset.
#
# Bounded + resumable: the trainer auto-resumes from the newest checkpoint in
# the log dir, so re-running after a timeout/outage simply continues.  Run it
# under the h2h pause wrapper while the CPU head-to-head is alive:
#
#   nohup bash scripts/with_h2h_paused.sh bash scripts/tpu_flagship_train.sh \
#       > /tmp/flagship160.log 2>&1 &  echo $! > /tmp/flagship.pid
#
# Env knobs:
#   FLAGSHIP_ITERS    total train iters (default 20000; config default 60000)
#   FLAGSHIP_TIMEOUT  seconds before the train phase is cut (default 14400)
set -x
cd "$(dirname "$0")/.."
ITERS=${FLAGSHIP_ITERS:-20000}
TRAIN_TIMEOUT=${FLAGSHIP_TIMEOUT:-14400}

timeout "$TRAIN_TIMEOUT" python main.py \
    --config configs/artifacts/texture160_sr_cmde.py \
    --config.training.n_iters="$ITERS" \
    --mode train --log_path artifacts/flagship160

# Sample + metric the result through the real test harness regardless of
# whether training ran to ITERS or was cut by the timeout (auto-restores the
# newest checkpoint).
timeout 3600 python main.py \
    --config configs/artifacts/texture160_sr_cmde.py \
    --mode test --log_path artifacts/flagship160
