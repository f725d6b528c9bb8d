"""iterutil (partitioning-preserving localCheckpoints): the plan-level
claims the iterative operators rely on, pinned.

Under AQE a localCheckpoint's LogicalRDD records UnknownPartitioning, so
every later join re-shuffles it; with AQE disabled around the checkpoint
the hash layout is retained and EnsureRequirements drops the exchange.
These tests pin exactly that (and that the AQE toggle always restores)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.iterutil import (
    _AQE_KEY,
    localcheckpoint_keep_partitioning,
    localcheckpoint_partitioned,
)


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rdd_scan_retains_hash(df, col: str) -> bool:
    # the checkpoint side appears as "Scan ExistingRDD" carrying its
    # partitioning; retained layout prints as hashpartitioning(col, n)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "hashpartitioning" in plan and col in plan


def test_partitioned_checkpoint_join_has_no_exchange_on_checkpoint_side(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        e = spark.range(1000).select(
            (F.col("id") % 100).alias("a"), F.col("id").alias("b")
        )
        cp = localcheckpoint_partitioned(e, "a")
        other = spark.range(5000).select((F.col("id") % 97).alias("a"))
        plan = _executed_plan(cp.join(other, "a"))
        # exactly ONE shuffle exchange: the non-checkpointed side. The
        # checkpointed side re-enters the join exchange-free.
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Scan ExistingRDD" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_plain_localcheckpoint_would_reshuffle(spark):
    # the counterfactual that motivates the helper: same shape through a
    # stock (AQE-on) localCheckpoint shuffles BOTH sides
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        e = spark.range(1000).select(
            (F.col("id") % 100).alias("a"), F.col("id").alias("b")
        )
        cp = e.repartition(8, "a").localCheckpoint()
        other = spark.range(5000).select((F.col("id") % 97).alias("a"))
        plan = _executed_plan(cp.join(other, "a"))
        assert plan.count("Exchange hashpartitioning") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_keep_partitioning_after_aggregate(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = (
            spark.range(1000)
            .select((F.col("id") % 50).alias("k"), F.col("id").alias("v"))
            .groupBy("k")
            .agg(F.sum("v").alias("s"))
        )
        cp = localcheckpoint_keep_partitioning(agg)
        other = spark.range(500).select((F.col("id") % 49).alias("k"))
        plan = _executed_plan(cp.join(other, "k"))
        assert plan.count("Exchange hashpartitioning") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_lazy_checkpoint_counts_correctly_and_cuts_lineage(spark):
    df = spark.range(100).select((F.col("id") * 2).alias("x"))
    cp = localcheckpoint_keep_partitioning(df, eager=False)
    assert cp.count() == 100  # first action materializes the checkpoint
    assert cp.agg(F.sum("x")).first()[0] == 9900
    assert "LogicalRDD" in cp._jdf.queryExecution().optimizedPlan().toString()


def test_aqe_conf_restored_even_on_failure(spark):
    before = spark.conf.get(_AQE_KEY, "true")
    with pytest.raises(Exception):
        # repartition on a nonexistent column raises during plan analysis
        localcheckpoint_partitioned(spark.range(10), "no_such_col")
    assert spark.conf.get(_AQE_KEY, "true") == before


def test_aqe_left_enabled_for_subsequent_queries(spark):
    localcheckpoint_partitioned(
        spark.range(100).select((F.col("id") % 3).alias("a")), "a"
    )
    assert spark.conf.get(_AQE_KEY, "true") == "true"
