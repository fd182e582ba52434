#!/bin/bash
# Run a command with the long-running head-to-head training job (pid in
# /tmp/h2h.pid) SIGSTOPped, so TPU-side wall-clock measurements on this
# one-core machine aren't distorted by host CPU contention.  Resumes the
# job on exit no matter how the wrapped command ends.
#
# The pid file may point at a shell wrapper whose python child lives in a
# DIFFERENT process group (`timeout` setpgid's itself), so signalling the
# recorded pid alone leaves the actual CPU hog running.  We therefore walk
# the full descendant tree and signal every pid, parent-first for STOP (so
# no new children appear mid-walk) and in the same order for CONT.
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

# Echo pid and all its live descendants, parent before child (BFS).
descendants() {
  local queue=("$1")
  while ((${#queue[@]})); do
    local pid="${queue[0]}"
    queue=("${queue[@]:1}")
    echo "$pid"
    local kids
    kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
    for k in $kids; do queue+=("$k"); done
  done
}

signal_tree() {
  local sig="$1" root="$2" p
  for p in $(descendants "$root"); do
    kill -"$sig" "$p" 2>/dev/null
  done
}

resume() {
  if [[ -n "$H2H_PID" ]]; then
    signal_tree CONT "$H2H_PID"
    echo "[with_h2h_paused] resumed tree of $H2H_PID" >&2
  fi
}
trap resume EXIT INT TERM

if [[ -n "$H2H_PID" ]]; then
  signal_tree STOP "$H2H_PID"
  echo "[with_h2h_paused] paused tree of $H2H_PID" >&2
fi

"$@"
