"""bench.py output contract (VERDICT r07 What's-wrong #1).

The external driver records the TAIL of bench.py's output and parses
the last line as JSON; round 7's artifact was `parsed: null` because
state-store abort stack traces flooded the capture window. This test
runs the real bench entry point in a subprocess — including the
eviction query whose stop used to spew — and pins the contract:

- exit code 0;
- the LAST stdout line parses as JSON with the summary fields;
- stdout/stderr carry none of the abort-spew signatures.

sf0.001 + a two-query subset keeps it a ~40s integration test while
still covering the exact failure path (session startup + the
ProcessingTimeTimeout stop).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SPEW_SIGNATURES = (
    "CANNOT_WRITE_STATE_STORE",
    "HDFSBackedStateStore",
    "Aborting commit",
    "Error aborting",
    "ERROR DataWritingSparkTask",
    "ERROR Executor",
)


def test_bench_last_line_is_parseable_json(tmp_path):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_OUT=str(tmp_path / "bench_out.json"),
        SPARK_GRAFT_CPUS="8",
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "bench.py"),
            "--queries",
            "q1_pricing_summary",
            "streaming_daily_rollup_evicted",
        ],
        capture_output=True,
        text=True,
        timeout=570,
        cwd=REPO,
        env=env,
    )
    assert proc.returncode == 0, (proc.stdout + proc.stderr)[-4000:]
    combined = proc.stdout + "\n" + proc.stderr
    for sig in _SPEW_SIGNATURES:
        assert sig not in combined, f"{sig!r} in bench output:\n{combined[-4000:]}"
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    summary = json.loads(lines[-1])  # the driver's parse target
    assert summary["unit"] == "sec"
    assert summary["n_queries"] == 2
    assert summary["value"] > 0
    detail = json.loads((tmp_path / "bench_out.json").read_text())
    assert set(detail["queries"]) == {
        "q1_pricing_summary",
        "streaming_daily_rollup_evicted",
    }


def test_bench_detail_records_construction_split(tmp_path):
    """Round 12 (VERDICT r11 directive #1): single-tree runs record the
    construction component of each reported min-total window so driver
    drift can be attributed without a re-run. Same total-window
    semantics — construct is an inner split point, never > total."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_OUT=str(tmp_path / "bench_out.json"),
        SPARK_GRAFT_CPUS="8",
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "bench.py"),
            "--queries",
            "q1_pricing_summary",
        ],
        capture_output=True,
        text=True,
        timeout=570,
        cwd=REPO,
        env=env,
    )
    assert proc.returncode == 0, (proc.stdout + proc.stderr)[-4000:]
    detail = json.loads((tmp_path / "bench_out.json").read_text())
    assert set(detail["construct"]) == {"q1_pricing_summary"}
    c = detail["construct"]["q1_pricing_summary"]
    assert 0 <= c <= detail["queries"]["q1_pricing_summary"]
    # the driver's parse target (last stdout line) is unchanged
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    summary = json.loads(lines[-1])
    assert "construct" not in summary
