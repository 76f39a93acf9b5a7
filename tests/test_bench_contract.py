"""bench.py contract guard: the driver runs it per-round and parses ONE
JSON line from stdout. A broken import, a stray print, or a malformed
payload silently loses the round's benchmark — so run it for real (at
sf0.001 to keep it fast) and validate the shape."""

from __future__ import annotations

import pytest

import json
import os
import subprocess
import sys


# r15: slow shard — excluded from the default pytest run (see
# pytest.ini); run the full suite with -m "slow or not slow".
pytestmark = pytest.mark.slow

def test_bench_emits_single_json_line():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "4"
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd="/tmp",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got {len(lines)}"
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert len(payload["queries"]) >= 20
    assert all(v >= 0 for v in payload["queries"].values())
    assert payload["probe_retried"] is False  # gate only arms at sf0.1
    assert payload["probe_reprobes"] == 0
    assert payload["noisy_box"] is False
