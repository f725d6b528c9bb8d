"""Partitioned writes + partition pruning (SURVEY.md §1.4: review by
year(date), business by state; §4 'partitioned + sorted-on-PK writes').

Pins the scale property: a filter on the partition column must appear as a
PartitionFilter (pruned at planning, zero data read from other partitions),
not a post-scan filter.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.sources.writers import write_overwrite

from .test_plans import plan_str


def test_partition_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_year")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    write_overwrite(o, out, partition_by=["order_year"])

    df = spark.read.parquet(out).filter(F.col("order_year") == 1997)
    p = plan_str(df, "formatted")
    assert "PartitionFilters" in p
    pf = p.split("PartitionFilters")[1][:120]
    assert "order_year" in pf, pf
    # and the predicate is NOT a row-level pushed filter (it's partition-level)
    got_years = {r.order_year for r in df.select("order_year").distinct().collect()}
    assert got_years == {1997}


def test_dynamic_partition_overwrite(spark, sf_dir, tmp_path):
    out = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "part"])
    write_overwrite(df1, out, partition_by=["part"])
    # overwrite ONLY partition b (partitionOverwriteMode=dynamic in session)
    df2 = spark.createDataFrame([(9, "b")], ["id", "part"])
    write_overwrite(df2, out, partition_by=["part"])
    rows = sorted((r.id, r.part) for r in spark.read.parquet(out).collect())
    assert rows == [(1, "a"), (9, "b")], rows
