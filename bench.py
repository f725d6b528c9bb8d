#!/usr/bin/env python
"""Benchmark the headline queries.

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each query is timed as a single action into the ``noop`` sink — unlike
``count()`` (which lets Catalyst prune every computed column and
under-measures), noop materializes all output columns without writing
bytes. A warmup query amortizes session/JIT startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import time

from yelp_business_data_pipeline_spark.plans import QUERIES
from yelp_business_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # SPARK_GRAFT_BENCH_ONLY (r13, additions-only): comma-separated query
    # names restricting the run to a subset. Unset (the driver's case) the
    # behaviour is byte-identical to before: every registered query, same
    # methodology, same two JSON lines. The subset exists so the pytest
    # contract test can smoke the OUTPUT CONTRACT in minutes instead of
    # running all 100 queries x median-of-3/5 inside the driver's verify
    # window (VERDICT r12 item 1); tools may also use it to isolate a
    # query family without editing this file.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = sorted(set(names) - set(QUERIES))
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY: unknown queries {unknown}")
        selected = {n: QUERIES[n] for n in names}
    else:
        selected = dict(QUERIES)
    spark = get_spark(app_name="bench")

    def run(name: str) -> None:
        QUERIES[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Warmup: JVM/codegen/readers — then the Python/Arrow worker pool.
    # Spawning 32 Python workers (each importing numpy/pandas) costs ~4-5 s
    # once per SparkContext; without this, that one-off lands on whichever
    # Arrow-kernel query happens to run first (measured: lsh_ann_topk's
    # median jumping 2.6 -> 6.4 s depending on interleaving). Workers are
    # reused afterwards (spark.python.worker.reuse), so steady-state numbers
    # are what the per-query timings should reflect.
    run("topk_orders_per_segment")
    run("ann_cosine_topk_arrow")
    # The cross-polytope kernel (24 rotate->argmax tables + multiprobe)
    # compiles/caches separately from the plain matmul path above —
    # lsh_ann_topk flagged >2x its committed baseline in two consecutive
    # driver benches (r7, r8) while isolated 5-run probes medianed it in
    # budget: first-run codegen/JIT landing inside a single run's
    # 3-sample median. One throwaway run moves that one-off here.
    run("lsh_ann_topk")
    # Same signature on the IVF kernel (sample-collect -> numpy k-means
    # quantizer train + assignment argmin pass): ivf_ann_topk flagged
    # 1.5-1.9x its committed baseline in the r8 AND r9 driver benches —
    # VERDICT r9 item 3 extends the warm-up to it.
    run("ivf_ann_topk")

    # Median of 3: the first run pays one-off costs (file-index build per
    # table, codegen cache) and any run can catch a GC/scheduler hiccup —
    # the median absorbs a single outlier in either direction, so
    # round-over-round deltas reflect real regressions, not the +-10%
    # shared-hardware noise that best-of-2 left in.
    import statistics

    timings: dict[str, float] = {}
    for name in sorted(selected):
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(name)
            samples.append(time.perf_counter() - t0)
        # Noise floor (VERDICT r9 item 8): sub-second queries have flapped
        # +-2x across driver benches three rounds running (graph_two_hop
        # 0.36 -> 0.73, integrity_orphan 0.36 -> 0.65) — at that runtime a
        # single scheduler/GC hiccup IS the median of 3. Queries whose
        # 3-sample median lands under 1 s take two more samples and report
        # the median of 5; the extra cost is bounded by the very property
        # that triggers it (<1 s each).
        if statistics.median(samples) < 1.0:
            for _ in range(2):
                t0 = time.perf_counter()
                run(name)
                samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)

    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "query_pack_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # Truncation-proofing, round 3 (BENCH_r04/r05/r06 `parsed` came back
    # null every time: the driver's bounded tail-capture cuts the HEAD of
    # the full per-query line no matter how compact it gets). Strategy:
    # persist the full-precision payload to BENCH_LOCAL.json, print the
    # full compact line for humans/tools, then print a <120-char
    # summary-only JSON line LAST — whatever window the capture keeps, it
    # always ends with a complete parseable object carrying the headline
    # metric (total/n/sf).
    compact = dict(payload, queries={k: round(v, 2) for k, v in timings.items()})
    # Subset runs write a separate sidecar so a smoke/contract run can never
    # clobber the full-registry BENCH_LOCAL.json a baseline refresh reads.
    sidecar = "BENCH_LOCAL_SUBSET.json" if only else "BENCH_LOCAL.json"
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), sidecar)
    try:
        with open(out_path, "w") as fh:
            json.dump(payload, fh)
    except OSError:
        pass  # read-only checkout: stdout lines are still the contract
    print(json.dumps(compact, separators=(",", ":")))
    summary = {
        "metric": "query_pack_total_runtime",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "sf": sf,
    }
    print(json.dumps(summary, separators=(",", ":")))


if __name__ == "__main__":
    main()
