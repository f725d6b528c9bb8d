"""Catalog registration (S8) and bucketed co-located joins.

The bucketing test pins the SCALE property itself: a join between two
tables bucketed on the join key must plan with no Exchange (shuffle) on
either side.
"""

from __future__ import annotations

import pytest

from yelp_business_data_pipeline_spark.sources.catalog import (
    refresh,
    register_view,
    save_bucketed,
    save_table,
)

from .test_plans import plan_str


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # managed tables land in spark.sql.warehouse.dir (cwd/spark-warehouse);
    # a stale directory without a catalog entry blocks saveAsTable, so clean
    # both sides before and after
    import shutil
    from pathlib import Path

    def _clean():
        for t in ("tb_orders", "tb_lineitem", "tb_plain"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            loc = Path("spark-warehouse") / t
            if loc.exists():
                shutil.rmtree(loc)

    _clean()
    yield
    _clean()


def test_save_and_sql_roundtrip(spark, sf_dir, warehouse):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    save_table(o.limit(100), "tb_plain")
    refresh(spark, "tb_plain")
    assert spark.sql("SELECT COUNT(*) AS n FROM tb_plain").collect()[0].n == 100
    register_view(o, "v_orders")
    assert spark.sql("SELECT COUNT(*) AS n FROM v_orders").collect()[0].n == o.count()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, warehouse):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    save_bucketed(o, "tb_orders", ["o_orderkey"], n_buckets=4)
    save_bucketed(li, "tb_lineitem", ["o_orderkey"], n_buckets=4)

    # Disable auto-broadcast: at test scale AQE would broadcast the small
    # side and skip the bucketed path; at 100 TB neither side broadcasts —
    # that regime is exactly what bucketing exists for.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("tb_lineitem").join(spark.table("tb_orders"), "o_orderkey")
        p = plan_str(joined, "simple")
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p, p
        assert "Exchange hashpartitioning" not in p, f"bucketed join still shuffles:\n{p}"

        # control: same join on plain parquet shuffles both sides
        joined_plain = li.join(o, "o_orderkey")
        assert "Exchange hashpartitioning" in plan_str(joined_plain, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
