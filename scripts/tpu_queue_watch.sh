#!/bin/bash
# Wait for the TPU probe flag, then run the measurement ladder once.
# Serializes: one TPU process at a time; pauses the CPU h2h job meanwhile.
cd /root/repo
while [[ ! -f /tmp/tpu_up.flag ]]; do sleep 60; done
echo "flag seen at $(date)" > /tmp/tpu_queue_started
bash scripts/with_h2h_paused.sh bash scripts/tpu_measure_queue.sh > /tmp/tpu_queue.log 2>&1
echo "queue done rc=$? at $(date)" >> /tmp/tpu_queue_started
