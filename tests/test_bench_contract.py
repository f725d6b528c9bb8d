"""bench.py contract: the driver runs it per-round and parses ONE JSON line
from stdout — guard that end to end (subprocess, like the driver)."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_one_json_line():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["PYTHONPATH"] = "/root/repo"
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [line for line in out.stdout.strip().splitlines() if line.strip()]
    payload = json.loads(lines[-1])
    assert payload["unit"] == "sec"
    assert payload["sf"] == "0.001"
    assert isinstance(payload["value"], (int, float))
    from yelp_business_data_pipeline_spark.plans import QUERIES

    assert set(payload["queries"]) == set(QUERIES)
    assert all(v >= 0 for v in payload["queries"].values())
