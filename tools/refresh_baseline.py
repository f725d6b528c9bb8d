#!/usr/bin/env python
"""Refresh the committed per-query baseline table: run bench.py N times
(serialized — run this with NOTHING else on the container), collect each
run's full-precision BENCH_LOCAL.json, and print the min-of-N per-query
markdown table plus run totals, ready to paste into BASELINE.md.

Usage: python tools/refresh_baseline.py [n_runs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs: list[dict] = []
    for i in range(n):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            cwd=REPO,
            check=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        with open(os.path.join(REPO, "BENCH_LOCAL.json")) as fh:
            payload = json.load(fh)
        runs.append(payload)
        print(f"# run {i + 1}/{n}: total {payload['value']} s", file=sys.stderr)

    names = sorted(runs[0]["queries"])
    best = {q: min(r["queries"][q] for r in runs) for q in names}
    totals = ", ".join(f"{r['value']:.1f}" for r in runs)
    print(f"Run totals: {totals} s; min-of-{n} per-query sum "
          f"**{sum(best.values()):.2f} s / {len(names)} queries**.\n")
    print("| query | min-of-%d s |" % n)
    print("|---|---|")
    for q in names:
        print(f"| {q} | {best[q]:.2f} |")


if __name__ == "__main__":
    main()
