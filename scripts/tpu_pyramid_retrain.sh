#!/bin/bash
# TPU pyramid retrain (VERDICT round-3 item 4): extend both Haar VS-CMDE
# detail scales well past the 8k-step CPU checkerboard regime, then re-chain
# with --mode multi_scale_test (which records metrics.json: PSNR/SSIM of the
# chained pyramid vs GT and vs the DC-only control).
#
# Resumable: each scale auto-resumes from its newest checkpoint, so re-running
# after an outage continues from where it stopped.
#
#   nohup bash scripts/with_h2h_paused.sh bash scripts/tpu_pyramid_retrain.sh \
#       > /tmp/pyramid_tpu.log 2>&1 &  echo $! > /tmp/pyramid.pid
#
# Env knobs:  PYR_ITERS (default 30000)   PYR_TIMEOUT per scale (default 5400)
set -x
cd "$(dirname "$0")/.."
ITERS=${PYR_ITERS:-30000}
SCALE_TIMEOUT=${PYR_TIMEOUT:-5400}

for s in 32 64; do
  timeout "$SCALE_TIMEOUT" python main.py \
      --config "configs/artifacts/texture64_haar_scales.py:$s" \
      --config.training.n_iters="$ITERS" \
      --mode train --log_path "artifacts/texture64_pyramid/scale_$s"
done

timeout 2400 python main.py \
    --config configs/artifacts/texture64_multiscale_master.py \
    --mode multi_scale_test --log_path artifacts/texture64_pyramid/pyramid_test
