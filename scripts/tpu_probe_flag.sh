#!/bin/bash
# Probe the TPU every ~10 min; write /tmp/tpu_up.flag and exit 0 when it
# answers (scripts/tpu_queue_watch.sh waits on that flag and then runs the
# measurement ladder with the CPU trainer paused).  The cadence is a
# trade-off on this ONE-core host: each probe costs ~15s of CPU for the
# jax import, so a 2-min cadence would steal ~6% of the trainer's cycles
# during a multi-hour outage; 10 min costs ~2% and delays queue start by
# at most 10 min.
while true; do
  if timeout 120 python -c "import jax; d=jax.devices(); assert d[0].platform!='cpu'; print('TPU UP:', d)" 2>/tmp/tpu_probe4.err; then
    echo "TPU ANSWERED at $(date)" | tee /tmp/tpu_up.flag
    exit 0
  fi
  echo "$(date): still down" >> /tmp/tpu_probe4.log
  sleep 600
done
