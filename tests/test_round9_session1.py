"""Round-9 regression tests: the VERDICT r8 / ADVICE r8 fixes stay fixed.

* bench.py refuses to run under ``--strict`` when the 1-min loadavg
  exceeds the gate (VERDICT r8 ask #5) — a committed sidecar can never
  silently carry contaminated numbers.
* the SemDeDup assignment stage is plan-pinned shuffle-free in
  tests/test_plans.py::test_semdedup_assignment_is_shuffle_free.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_strict_refuses_on_load():
    """With the gate forced to 0, any real machine is 'loaded', so
    --strict must exit 2 BEFORE starting a JVM or touching fixtures."""
    env = dict(os.environ, SPARK_GRAFT_BENCH_LOAD_MAX="0")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--strict"],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert proc.returncode == 2, (proc.returncode, proc.stderr[-500:])
    assert "refusing under --strict" in proc.stderr


def test_bench_gate_constant_from_env():
    """LOAD_GATE_MAX is env-overridable (CI boxes have different idle
    floors) and defaults to 2.0."""
    import bench

    assert bench.LOAD_GATE_MAX == float(
        os.environ.get("SPARK_GRAFT_BENCH_LOAD_MAX", "2.0")
    )
