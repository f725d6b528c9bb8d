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
        # 1800 s (r12): this test guards the OUTPUT CONTRACT (the two
        # JSON lines the driver parses), not a performance SLA — the
        # perf bar is the committed BASELINE.md min-of-3 table + the
        # driver's own 2x rule. The previous 900 s was calibrated for
        # 88 queries on the faster r10 container; the registry now runs
        # 100 queries x median-of-3/5 sampling (~460 timed actions, each
        # paying the local[32] job floor), and the r12-documented
        # shared-host noise band (OPTIMIZATION_r12.md "Measurement
        # conditions") put quiet-window walls at ~700-800 s and noisy
        # ones at ~1050 s — a 900 s ceiling flapped on noise, not on
        # regressions.
        timeout=1800,
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
