"""bench.py contract: the driver runs it per-round and parses JSON from a
bounded tail-capture of stdout — guard that end to end (subprocess, like
the driver). The LAST line is a <120-char summary object (the capture can
cut the head of the full per-query line; it must always end with a
complete parseable object), the line before it the full per-query map.

r13 (VERDICT r12 item 1): the r12 version ran ALL 100 queries x
median-of-3/5 at sf0.001 (~700-1050 s wall), which blew past the driver's
verify window and killed its pytest attestation. The contract under test
is the OUTPUT FORMAT, not the registry size, so this now smokes a
representative SUBSET via SPARK_GRAFT_BENCH_ONLY (additions-only env in
bench.py; unset — the driver's case — bench.py behaviour is unchanged).
The full-registry run stays available as a tool
(`python bench.py`, tools/refresh_baseline.py) and the driver's own
BENCH_r13 run exercises registry completeness every round.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

# Representative subset: a plain SQL aggregate, a sub-second query (takes
# the median-of-5 path), an Arrow-kernel query, a builder with internal
# collects/checkpoints, a graph iterative, and an oracle-gated panel.
SMOKE = [
    "pricing_summary",
    "sessionize_events",
    "minhash_lsh_pairs_xxhash64",
    "perplexity_bucket_panel",
    "connected_components_friend_graph",
    "text_fingerprints_panel",
]


def test_bench_emits_one_json_line():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(SMOKE)
    env["PYTHONPATH"] = "/root/repo"
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True,
        text=True,
        env=env,
        # Subset wall is ~60-120 s (6 queries x 3-5 samples + warmups +
        # session startup); 420 s leaves the documented shared-host noise
        # band (OPTIMIZATION_r12.md "Measurement conditions") plenty of
        # headroom without risking the driver's verify window.
        timeout=420,
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
    assert set(payload["queries"]) == set(SMOKE)
    assert summary["n_queries"] == len(payload["queries"])
    assert all(v >= 0 for v in payload["queries"].values())


def test_bench_subset_rejects_unknown_query():
    """SPARK_GRAFT_BENCH_ONLY validates names BEFORE starting a session —
    a typo fails in seconds with the offending names, never a silent
    partial bench."""
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_BENCH_ONLY"] = "pricing_summary,no_such_query"
    env["PYTHONPATH"] = "/root/repo"
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
        cwd="/root/repo",
    )
    assert out.returncode != 0
    assert "no_such_query" in out.stderr
