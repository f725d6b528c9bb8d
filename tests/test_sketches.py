"""Re-aggregatable HLL sketches: merge-of-parts == whole (within HLL
error), surviving a parquet round-trip — the rollup-table contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.sketches import (
    grouped_distinct_sketches,
    merge_distinct_estimate,
)


def test_sketch_merge_matches_global(spark, sf_dir, tmp_path):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = o.select(F.countDistinct("o_custkey")).collect()[0][0]

    # Build per-priority sketches (the rollup grain) and PERSIST them —
    # binary sketch columns must survive parquet.
    rollup_path = str(tmp_path / "rollup")
    grouped_distinct_sketches(o, ["o_orderpriority"], "o_custkey").write.parquet(rollup_path)
    rollup = spark.read.parquet(rollup_path)

    # Merge months later without raw data: estimate within HLL error.
    est = merge_distinct_estimate(rollup).collect()[0].distinct_estimate
    assert abs(est - exact) / exact <= 0.05, (est, exact)

    # Re-grouping to a coarser grain also works (here: everything into one
    # bucket via a constant) and rows reconcile.
    rows = merge_distinct_estimate(
        rollup.withColumn("all", F.lit(1)), ["all"]
    ).collect()
    assert rows[0].n_rows == o.count()

    # Estimates are order/partitioning-insensitive: shuffled input, same
    # sketch union result.
    est2 = merge_distinct_estimate(
        grouped_distinct_sketches(o.repartition(13), ["o_orderpriority"], "o_custkey")
    ).collect()[0].distinct_estimate
    assert est2 == est


def test_heavy_hitters_superset_guarantee(spark, sf_dir):
    from yelp_business_data_pipeline_spark.operators.sketches import (
        frequent_tokens,
        verified_heavy_hitters,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    total = toks.count()
    exact = {
        r.tok
        for r in toks.groupBy("tok").count().filter(F.col("count") > 0.01 * total).collect()
    }
    assert exact, "expected some >1% tokens in the corpus"
    approx = set(frequent_tokens(d, "text", 0.01))
    assert exact <= approx  # freqItems guarantee: superset of true heavy hitters

    verified = {r.tok for r in verified_heavy_hitters(d, "text", 0.01).collect()}
    assert verified == exact  # candidates + exact count = exact answer
