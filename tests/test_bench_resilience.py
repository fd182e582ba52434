"""bench.py must survive a wedged TPU backend (VERDICT round-3 weak #2).

The tunneled backend has failed with ``UNAVAILABLE: Unable to initialize
backend 'axon'`` in 2 of 3 rounds (BENCH_r03.json rc=1, no data).  The
orchestrator in bench.py retries in fresh subprocesses and, on final
failure, must still emit ONE parseable JSON line with an ``error`` field
and the last-known-good number — and exit 0.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(extra_env, timeout=300):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_RETRY_BACKOFF="0",
        **extra_env,
    )
    return subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )


def _last_json_line(stdout):
    lines = [l for l in stdout.strip().splitlines() if l.strip()]
    assert lines, "bench.py printed nothing to stdout"
    return json.loads(lines[-1])


@pytest.mark.slow
def test_simulated_backend_outage_still_emits_json():
    proc = _run({"BENCH_SIMULATE": "unavailable", "BENCH_RETRY_ATTEMPTS": "2"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = _last_json_line(proc.stdout)
    assert rec["metric"] == "celebA160_SR_CMDE_pc1000_sampling"
    assert rec["value"] is None
    assert "UNAVAILABLE" in rec["error"]
    # BENCH_r02.json carries the last judged number; it must surface here.
    lkg = rec["last_known_good"]
    assert lkg is not None and lkg["value"] > 0, rec
    # And the retry actually happened (2 attempts visible in stderr).
    assert "retry 2/2" in proc.stderr or "attempt 2" in proc.stderr, proc.stderr[-2000:]


@pytest.mark.slow
def test_simulated_hang_is_killed_and_reported():
    proc = _run(
        {
            "BENCH_SIMULATE": "hang",
            "BENCH_RETRY_ATTEMPTS": "1",
            "BENCH_ATTEMPT_TIMEOUT": "30",
        },
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = _last_json_line(proc.stdout)
    assert rec["value"] is None
    assert "hung" in rec["error"]
