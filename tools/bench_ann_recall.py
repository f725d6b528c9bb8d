#!/usr/bin/env python
"""ANN quality-at-scale probe (VERDICT r10 item 8): recall@10 and
candidate coverage for the three ANN scale paths — IVF, PQ-ADC,
cross-polytope LSH — against the exact brute-force top-k, at
.scaledata/sf0.1 AND .scaledata/sf1 (tools/gen_scaledata.py data, so
ratios isolate scale, not generator drift).

The pytest recall floors run at sf0.001/sf0.01; this probe MEASURES the
same numbers at 6x and 60x that corpus so the quality-at-scale claim in
SCALE.md is a committed table row, not an extrapolation.

Coverage definitions (all "fraction of query-corpus pairs actually
scored before ranking"):
- ivf:   mean over queries of (mass of the nprobe probed lists) / n_c —
         derived from the SAME centroid table + assignment the query
         uses (no second training run);
- lsh:   distinct candidate pairs / (n_q * n_c) via
         cross_polytope_candidates with the registered table/probe
         config;
- pq:    1.0 by construction (ADC scans every 16x-compressed code) —
         the honest number reported is the exact-rerank fraction R/n_c.

Prints one JSON line:
  {"metric": "ann_recall_scale", "sf_dirs": [...], "rows":
    {"<query>@<sf>": {"recall": r, "coverage": c, "n_exact": n,
                      "wall_s": t}}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from yelp_business_data_pipeline_spark.plans import QUERIES
from yelp_business_data_pipeline_spark.plans.extensions import ann_cosine_topk
from yelp_business_data_pipeline_spark.session import get_spark


def _pairs(df):
    return {(r.q_id, r.c_id) for r in df.collect()}


def _ivf_coverage(spark, sf_dir: str) -> float:
    """Probed-list mass fraction under the registered ivf_ann_topk
    config (n_lists=32, iters=5, nprobe=8), reusing the deterministic
    trainer so the lists ARE the query's lists."""
    from pyspark.sql import functions as F

    from yelp_business_data_pipeline_spark.operators import similarity as sim
    from yelp_business_data_pipeline_spark.operators.ivf import (
        ivf_index,
        train_ivf_centroids,
    )
    from yelp_business_data_pipeline_spark.plans.registry import tbl

    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double_vec(F.col("embedding")).alias("v")
    )
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), "v")
    c = e.filter(F.col("vec_id") >= 5).select(F.col("vec_id").alias("c_id"), "v")
    cent = train_ivf_centroids(c, "c_id", "v", n_lists=32, iters=5)
    idx = ivf_index(c, cent, "c_id", "v")
    mass = {r[0]: r[1] for r in idx.groupBy("list_id").count().collect()}
    n_c = sum(mass.values())
    cent_rows = sorted((r.list_id, r.cv) for r in cent.collect())
    cm = np.asarray([v for _, v in cent_rows])
    lids = [i for i, _ in cent_rows]
    covs = []
    for r in q.collect():
        d = ((cm - np.asarray(r.v)) ** 2).sum(axis=1)
        probe = [lids[i] for i in np.argsort(d, kind="stable")[:8]]
        covs.append(sum(mass.get(p, 0) for p in probe) / n_c)
    return float(np.mean(covs))


def _lsh_coverage(spark, sf_dir: str) -> float:
    from pyspark.sql import functions as F

    from yelp_business_data_pipeline_spark.operators import similarity as sim
    from yelp_business_data_pipeline_spark.plans.registry import tbl

    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double_vec(F.col("embedding")).alias("v")
    )
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), "v")
    c = e.filter(F.col("vec_id") >= 5).select(F.col("vec_id").alias("c_id"), "v")
    n_cand = sim.cross_polytope_candidates(
        q, c, dim=64, n_tables=24, n_probes=4
    ).count()
    return n_cand / (q.count() * c.count())


def main() -> None:
    dirs = sys.argv[1:] or [".scaledata/sf0.1", ".scaledata/sf1"]
    spark = get_spark(app_name="ann-recall-scale")
    rows: dict[str, dict] = {}
    for sf_dir in dirs:
        if not os.path.isdir(sf_dir):
            raise SystemExit(f"missing {sf_dir} — run tools/gen_scaledata.py first")
        tag = os.path.basename(sf_dir.rstrip("/"))
        exact = _pairs(ann_cosine_topk(spark, sf_dir))
        n_c = None
        for name in ("ivf_ann_topk", "pq_ann_topk", "lsh_ann_topk"):
            t0 = time.monotonic()
            got = _pairs(QUERIES[name].spark(spark, sf_dir))
            wall = time.monotonic() - t0
            if name == "ivf_ann_topk":
                cov = _ivf_coverage(spark, sf_dir)
            elif name == "lsh_ann_topk":
                cov = _lsh_coverage(spark, sf_dir)
            else:  # pq: ADC scans all codes; rerank fraction is the knob
                if n_c is None:
                    n_c = (
                        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                        .filter("vec_id >= 5")
                        .count()
                    )
                cov = 1.0  # see module docstring; rerank = 100 / n_c
            rows[f"{name}@{tag}"] = {
                "recall": round(len(exact & got) / len(exact), 4),
                "coverage": round(cov, 4),
                "n_exact": len(exact),
                "wall_s": round(wall, 2),
            }
            if name == "pq_ann_topk":
                rows[f"{name}@{tag}"]["rerank_frac"] = round(100 / n_c, 6)
    print(
        json.dumps(
            {"metric": "ann_recall_scale", "sf_dirs": dirs, "rows": rows},
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
