#!/usr/bin/env python
"""Run the FULL oracle pack at sf1 (round-5 extension of the scale story).

The driver's correctness gate runs at sf0.01; the sf1 probe (bench_
scale_probe.py) measured wall-time growth but not correctness at scale.
This script closes that gap: every oracle-backed query is compared
against its DuckDB twin on the generated .scaledata/sf1 tables (6M-row
lineitem, 1M-row events) — the same compare the driver makes, 100x the
gate's data. Cross-engine drift that only appears at volume (sum
ordering, overflow, rounding at bigger magnitudes) shows up here.

Prints one JSON line: {"metric": "oracle_parity_sf1", "pass": N,
"fail": M, "failures": {...}}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_business_data_pipeline_spark.plans import QUERIES  # noqa: E402
from yelp_business_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaledata", "sf1"
    )
    if not os.path.isdir(base):
        raise SystemExit(f"missing {base} — run tools/gen_scaledata.py first")
    from tests.oracle_harness import compare

    spark = get_spark(app_name="oracle-sf1")
    results: dict[str, str] = {}
    n_pass = 0
    # chunked runs (the full 50-oracle sweep is ~15 min; dev-loop tool
    # timeouts are shorter): ORACLE_SF1_SHARD="i/n" keeps every n-th
    # oracle starting at i (0-based) — union of shards == full sweep
    shard = os.environ.get("ORACLE_SF1_SHARD")
    si, sn = (int(x) for x in shard.split("/")) if shard else (0, 1)
    names = [n for n in sorted(QUERIES) if QUERIES[n].oracle is not None]
    for name in names[si::sn]:
        try:
            ok, msg = compare(name, base, spark)
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            ok, msg = False, f"{type(e).__name__}: {e}"
        if ok:
            n_pass += 1
        else:
            results[name] = msg[:300]
        print(f"# {name}: {'ok' if ok else 'FAIL ' + msg[:120]}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "metric": "oracle_parity_sf1",
                "pass": n_pass,
                "fail": len(results),
                "failures": results,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
