#!/bin/bash
# Round-5 pyramid finisher: scale_64 (and scale_32) detail training at B16
# (~3.2x more optimizer steps/hour than B64 on this 1-core host), with a
# mid-round chain test so the round records a quality trajectory even if
# the VM dies.  Fully resumable: every stage auto-resumes from the newest
# orbax checkpoint.
set -x
cd /root/repo
# CPU training: never touch the (wedged) axon TPU plugin; main.py re-asserts
# this via jax.config so the sitecustomize plugin cannot override it.
export JAX_PLATFORMS=cpu
S=/tmp/pyr5_status
MS=artifacts/texture64_pyramid/pyramid_test/multi_scale
echo "pyr5 start $(date)" > "$S"

# Phase A: scale_64 at B16, 3h (resumes from ckpt 10000)
timeout 10800 python main.py --config configs/artifacts/texture64_haar_scales.py:64 \
  --config.training.batch_size=16 --config.training.n_iters=30000 \
  --mode train --log_path artifacts/texture64_pyramid/scale_64
echo "phaseA rc=$? $(date)" >> "$S"

# Chain test 1 (mid-round evidence point)
timeout 2400 python main.py --config configs/artifacts/texture64_multiscale_master.py \
  --mode multi_scale_test --log_path artifacts/texture64_pyramid/pyramid_test
echo "chain1 rc=$? $(date)" >> "$S"
cp "$MS/metrics.json" "$MS/metrics_r5_phaseA.json" 2>/dev/null

# Phase B: scale_32 at B16, 1.5h (resumes from ckpt 14000)
timeout 5400 python main.py --config configs/artifacts/texture64_haar_scales.py:32 \
  --config.training.batch_size=16 --config.training.n_iters=30000 \
  --mode train --log_path artifacts/texture64_pyramid/scale_32
echo "phaseB rc=$? $(date)" >> "$S"

# Phase C: scale_64 at B16, 3h more
timeout 10800 python main.py --config configs/artifacts/texture64_haar_scales.py:64 \
  --config.training.batch_size=16 --config.training.n_iters=30000 \
  --mode train --log_path artifacts/texture64_pyramid/scale_64
echo "phaseC rc=$? $(date)" >> "$S"

# Final chain test
timeout 2400 python main.py --config configs/artifacts/texture64_multiscale_master.py \
  --mode multi_scale_test --log_path artifacts/texture64_pyramid/pyramid_test
echo "chain2 rc=$? $(date)" >> "$S"
cp "$MS/metrics.json" "$MS/metrics_r5_final.json" 2>/dev/null
echo "ALL DONE $(date)" >> "$S"
