#!/bin/bash
# Run a command with the long-running head-to-head training job (pid in
# /tmp/h2h.pid) SIGSTOPped, so TPU-side wall-clock measurements on this
# one-core machine aren't distorted by host CPU contention.  Resumes the
# job on exit no matter how the wrapped command ends.
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

resume() {
  if [[ -n "$H2H_PID" ]]; then
    kill -CONT "$H2H_PID" 2>/dev/null && echo "[with_h2h_paused] resumed $H2H_PID" >&2
  fi
}
trap resume EXIT INT TERM

if [[ -n "$H2H_PID" ]]; then
  kill -STOP "$H2H_PID" 2>/dev/null && echo "[with_h2h_paused] paused $H2H_PID" >&2
fi

"$@"
