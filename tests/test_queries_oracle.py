"""Every registered query must match its DuckDB oracle at sf0.001 (the
driver's gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from yelp_business_data_pipeline_spark.plans import QUERIES

from .oracle_harness import compare


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir):
    ok, msg = compare(name, sf_dir, spark)
    assert ok, f"{name}: {msg}"


def test_approx_aggregates_accuracy(spark, sf_dir):
    """approx_count_distinct within 5% of exact; approx median within 2%."""
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    approx = {r.o_orderpriority: r for r in QUERIES["approx_aggregates"].spark(spark, sf_dir).collect()}
    exact = {
        r.o_orderpriority: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.expr("percentile(o_totalprice, 0.5)").alias("median"),
        )
        .collect()
    }
    for k, e in exact.items():
        a = approx[k]
        assert abs(a.approx_customers - e.n_customers) / e.n_customers <= 0.05
        assert abs(a.approx_median - e.median) / e.median <= 0.02
