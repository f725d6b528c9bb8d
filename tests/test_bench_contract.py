"""bench.py contract: the driver runs it per-round and parses JSON from a
bounded tail-capture of stdout — guard that end to end (subprocess, like
the driver). The LAST line is a <120-char summary object (the capture can
cut the head of the full per-query line; it must always end with a
complete parseable object), the line before it the full per-query map."""

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
    summary = json.loads(lines[-1])
    assert len(lines[-1]) < 120, "summary line must survive any tail window"
    assert summary["unit"] == "sec"
    assert summary["sf"] == "0.001"
    assert isinstance(summary["value"], (int, float))
    assert "queries" not in summary  # summary stays head-truncation-proof

    payload = json.loads(lines[-2])
    assert payload["unit"] == "sec" and payload["sf"] == "0.001"
    assert payload["value"] == summary["value"]
    from yelp_business_data_pipeline_spark.plans import QUERIES

    assert set(payload["queries"]) == set(QUERIES)
    assert summary["n_queries"] == len(payload["queries"])
    assert all(v >= 0 for v in payload["queries"].values())
