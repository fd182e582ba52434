#!/bin/bash
# Periodically commit training/measurement evidence under artifacts/ so a VM
# crash or an early round-end snapshot can never erase it again (this
# happened at the end of rounds 3 AND 4: the best chain metrics landed after
# the snapshot commit).  Only commits when something under artifacts/ (or a
# BENCH_*/MULTICHIP_* file) actually changed; skips orbax tmp dirs, which
# are renamed atomically on completion.
#
#   nohup bash scripts/evidence_autocommit.sh > /tmp/evidence_ac.log 2>&1 &
#
# Env knobs: EVIDENCE_INTERVAL seconds between scans (default 1800).
set -u
cd "$(dirname "$0")/.."
INTERVAL=${EVIDENCE_INTERVAL:-1800}

while true; do
  sleep "$INTERVAL"
  # stage evidence paths only — never source code (those commits are
  # deliberate and message-worthy); exclude in-flight orbax tmp dirs
  git add -A artifacts/ BENCH_*.json MULTICHIP_*.json 2>/dev/null
  # rolling orbax checkpoints churn ~30MB each save; committing every scan
  # would bloat history.  Final checkpoints are committed deliberately at
  # stage ends; this loop protects the small evidence (metrics, PNGs, logs,
  # event files).
  git reset -q -- 'artifacts/**/checkpoints/**' 'artifacts/**/*.orbax-checkpoint-tmp*' 2>/dev/null
  if ! git diff --cached --quiet; then
    git commit -q -m "Snapshot training and measurement artifacts" \
      && echo "$(date): committed evidence snapshot"
  fi
done
