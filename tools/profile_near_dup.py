#!/usr/bin/env python
"""Stage-level wall profile of the fuzzy-dedup composition (VERDICT r11
item 6): near_dup_clusters_panel is the heaviest probe row (19.6 s sf0.1
/ 24.4 s sf1 in the r11 table) and the CC round-jobs were suspected to
dominate. Measure, per SF dir:

  1. LSH banded candidates        (minhash_lsh_candidates, count)
  2. exact-Jaccard verify         (candidates -> verified pairs, count)
  3. CC hashmin                   (connected_components, precontract off)
  4. CC hashmin + precontract     (per-partition union-find first)
  5. full composed panel          (fuzzy_dedup_clusters -> histogram)

Stages 1-2 are timed OVER materialized upstream inputs (localCheckpoint)
so each number is that stage alone, not the chain re-run. CC variants
are asserted label-identical. Run SOLO; numbers go to BASELINE.md.

Usage: python tools/profile_near_dup.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from yelp_business_data_pipeline_spark.operators.components import (  # noqa: E402
    connected_components,
)
from yelp_business_data_pipeline_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_candidates,
)
from yelp_business_data_pipeline_spark.session import get_spark  # noqa: E402

N_RUNS = int(os.environ.get("PROFILE_RUNS", "3"))


def timed(fn):
    best = float("inf")
    out = None
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def profile(spark, sf_dir: str) -> None:
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
        .localCheckpoint()
    )
    n_docs = docs.count()

    t_lsh, _ = timed(lambda: minhash_lsh_candidates(docs, "doc_id", "text").count())
    cands = minhash_lsh_candidates(docs, "doc_id", "text").localCheckpoint()
    n_cands = cands.count()

    toks = docs.select(
        F.col("doc_id"), F.array_distinct(F.split(F.col("text"), " ")).alias("_toks")
    ).localCheckpoint()
    toks.count()

    def verify():
        paired = cands.join(
            toks.select(F.col("doc_id").alias("doc_a"), F.col("_toks").alias("_ta")), "doc_a"
        ).join(
            toks.select(F.col("doc_id").alias("doc_b"), F.col("_toks").alias("_tb")), "doc_b"
        )
        jac = F.round(
            F.size(F.array_intersect("_ta", "_tb")).cast("double")
            / F.size(F.array_union("_ta", "_tb")),
            6,
        )
        return paired.filter(jac >= 0.5).select("doc_a", "doc_b")

    t_verify, _ = timed(lambda: verify().count())
    pairs = verify().localCheckpoint()
    n_pairs = pairs.count()

    t_cc, _ = timed(
        lambda: connected_components(pairs, "doc_a", "doc_b").count()
    )
    t_ccp, _ = timed(
        lambda: connected_components(pairs, "doc_a", "doc_b", precontract=True).count()
    )
    base = sorted(
        map(tuple, connected_components(pairs, "doc_a", "doc_b").collect())
    )
    pre = sorted(
        map(
            tuple,
            connected_components(pairs, "doc_a", "doc_b", precontract=True).collect(),
        )
    )
    assert base == pre, "precontract changed CC labels"

    from yelp_business_data_pipeline_spark.plans import QUERIES

    t_panel, _ = timed(
        lambda: QUERIES["near_dup_clusters_panel"].spark(spark, sf_dir).collect()
    )

    print(
        f"{sf_dir}: docs={n_docs} cands={n_cands} pairs={n_pairs}\n"
        f"  lsh={t_lsh:.2f}s verify={t_verify:.2f}s "
        f"cc={t_cc:.2f}s cc+precontract={t_ccp:.2f}s panel={t_panel:.2f}s"
    )


def main() -> None:
    dirs = sys.argv[1:] or [
        os.path.join(REPO, ".scaledata", "sf0.1"),
        os.path.join(REPO, ".scaledata", "sf1"),
    ]
    spark = get_spark()
    for d in dirs:
        profile(spark, d)
    spark.stop()


if __name__ == "__main__":
    main()
