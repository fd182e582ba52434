#!/bin/bash
# Run a command with the long-running head-to-head training job (pid in
# /tmp/h2h.pid) SIGSTOPped, so TPU-side wall-clock measurements on this
# one-core machine aren't distorted by host CPU contention.  Resumes the
# job on exit no matter how the wrapped command ends.
#
# The pid file may point at a shell wrapper whose python child lives in a
# DIFFERENT process group (`timeout` setpgid's itself), so signalling the
# recorded pid alone leaves the actual CPU hog running.  We therefore walk
# the full descendant tree.  STOP is interleaved with the walk: each pid is
# STOPped the moment it is dequeued, and only then are its children listed —
# a stopped parent cannot fork, so no process created mid-walk can escape
# the pause.  The stopped pids are recorded (in stop order) for CONT.
#
# Usage: scripts/with_h2h_paused.sh <command> [args...]
set -u
H2H_PID=""
if [[ -f /tmp/h2h.pid ]]; then
  H2H_PID="$(cat /tmp/h2h.pid)"
  if ! kill -0 "$H2H_PID" 2>/dev/null; then
    H2H_PID=""
  fi
fi

STOPPED_PIDS=()

# BFS from $1: STOP each pid as it is dequeued, THEN enumerate its children
# (which can no longer change), and record the pid for later CONT.
stop_tree() {
  local queue=("$1")
  STOPPED_PIDS=()
  while ((${#queue[@]})); do
    local pid="${queue[0]}"
    queue=("${queue[@]:1}")
    kill -STOP "$pid" 2>/dev/null && STOPPED_PIDS+=("$pid")
    local kids
    kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
    for k in $kids; do queue+=("$k"); done
  done
}

resume() {
  if [[ -n "$H2H_PID" && ${#STOPPED_PIDS[@]} -gt 0 ]]; then
    local p
    for p in "${STOPPED_PIDS[@]}"; do
      kill -CONT "$p" 2>/dev/null
    done
    echo "[with_h2h_paused] resumed ${#STOPPED_PIDS[@]} pids of tree $H2H_PID" >&2
  fi
}
trap resume EXIT INT TERM

if [[ -n "$H2H_PID" ]]; then
  stop_tree "$H2H_PID"
  echo "[with_h2h_paused] paused ${#STOPPED_PIDS[@]} pids of tree $H2H_PID" >&2
fi

"$@"
