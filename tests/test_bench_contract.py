"""bench.py is a driver contract: it must print ONE JSON line with the
headline timings. A breakage here silently costs the round's benchmark
record, so smoke-run it at the tiny SF."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_bench_emits_one_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
        cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [
        ln for ln in out.stdout.splitlines() if ln.startswith("{")
    ]
    assert len(json_lines) == 1, out.stdout[-2000:]
    rec = json.loads(json_lines[0])
    assert rec["metric"] == "headline_queries_total"
    assert rec["unit"] == "sec" and rec["value"] > 0
    assert rec["queries"] and all(v >= 0 for v in rec["queries"].values())
    # the driver captures only the tail of stdout: the result must be
    # the final line and short enough to survive a 2,000-char capture
    assert out.stdout.rstrip().splitlines()[-1] == json_lines[0]
    assert len(json_lines[0]) < 1800, len(json_lines[0])
