"""Moderate-scale pipeline integration: Yelp-shaped JSON synthesized
deterministically from the sf0.01 testdata tables (1.5k users, 2k
businesses, 15k reviews), run through the full batch pipeline.

Catches the failure class tiny fixtures can't: grain blowups, quadratic
expressions, key-collision dedup bugs, partition explosions.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.pipeline import YelpPaths, run_batch

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def synth_paths(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("yelp_scale")

    users = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .select(
            F.concat(F.lit("u"), F.col("c_custkey")).alias("user_id"),
            F.col("c_name").alias("name"),
            (F.col("c_custkey") % 50).alias("review_count"),
            F.lit("2015-06-01 00:00:00").alias("yelping_since"),
            (F.col("c_custkey") % 7).alias("useful"),
            (F.col("c_custkey") % 3).alias("funny"),
            (F.col("c_custkey") % 5).alias("cool"),
            (F.col("c_custkey") % 11).alias("fans"),
            F.when(F.col("c_custkey") % 4 == 0, F.lit("2019,2020")).otherwise(F.lit("")).alias("elite"),
            # ring friendships keep every friend id resolvable
            F.concat(
                F.lit("u"), (F.col("c_custkey") + 1) % 1500, F.lit(", u"), (F.col("c_custkey") + 2) % 1500
            ).alias("friends"),
        )
    )
    businesses = (
        spark.read.parquet(f"{SF}/part.parquet")
        .join(spark.read.parquet(f"{SF}/nation.parquet"),
              F.col("p_partkey") % 25 == F.col("n_nationkey"))
        .select(
            F.concat(F.lit("b"), F.col("p_partkey")).alias("business_id"),
            F.col("p_name").alias("name"),
            F.lit("1 Main St").alias("address"),
            F.col("n_name").alias("city"),
            F.col("p_brand").alias("state"),
            (F.col("p_partkey") % 90).cast("double").alias("latitude"),
            (F.col("p_partkey") % 180).cast("double").alias("longitude"),
            ((F.col("p_size") % 9) / 2.0 + 1.0).alias("stars"),
            (F.col("p_size") * 3).cast("long").alias("review_count"),
            F.lit(1).cast("long").alias("is_open"),
            F.concat_ws(", ", "p_type", "p_brand").alias("categories"),
            F.struct(
                F.lit("9:0-17:0").alias("Monday"),
                F.lit("22:0-2:0").alias("Tuesday"),
            ).alias("hours"),
            F.struct(
                F.lit("True").alias("HasTV"),
                F.lit("u'average'").alias("NoiseLevel"),
                F.lit("2").alias("RestaurantsPriceRange2"),
            ).alias("attributes"),
        )
    )
    reviews = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            F.concat(F.lit("r"), F.col("o_orderkey")).alias("review_id"),
            F.concat(F.lit("u"), F.col("o_custkey")).alias("user_id"),
            F.concat(F.lit("b"), F.col("o_orderkey") % 2000).alias("business_id"),
            ((F.col("o_orderkey") % 9) / 2.0 + 1.0).alias("stars"),
            (F.col("o_orderkey") % 13).alias("useful"),
            (F.col("o_orderkey") % 4).alias("funny"),
            (F.col("o_orderkey") % 6).alias("cool"),
            F.when(F.col("o_orderkey") % 3 == 0, F.lit("great amazing delicious"))
            .when(F.col("o_orderkey") % 3 == 1, F.lit("terrible awful slow"))
            .otherwise(F.lit("it was fine")).alias("text"),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("date"),
        )
    )
    p = YelpPaths(
        business_raw=str(tmp / "business"),
        review_raw=str(tmp / "review"),
        user_raw=str(tmp / "user"),
        out_dir=str(tmp / "out"),
    )
    businesses.coalesce(2).write.json(p.business_raw)
    reviews.coalesce(2).write.json(p.review_raw)
    users.coalesce(2).write.json(p.user_raw)
    # Spark's json writer emits part-*.json? No: part-* without extension —
    # rename so the *.json glob (the Lambda-parity filter) picks them up.
    import glob as _glob
    import os

    for d in (p.business_raw, p.review_raw, p.user_raw):
        for f in _glob.glob(f"{d}/part-*"):
            if not f.endswith(".json"):
                os.rename(f, f + ".json")
    return p


def test_moderate_scale_batch(spark, synth_paths):
    t0 = time.perf_counter()
    out = run_batch(spark, synth_paths, build_graph=True)
    elapsed = time.perf_counter() - t0

    n_reviews = out["review"].select("review_id").distinct().count()
    assert n_reviews == 15000  # every order became a surviving review

    # user grain: 1500 users x 2 friends
    assert out["user"].count() == 3000
    # business grain: one row per (business, category token)
    n_biz_rows = out["business"].count()
    n_biz = out["business"].select("business_id").distinct().count()
    assert n_biz == 2000
    assert n_biz_rows == 2 * n_biz  # categories = "p_type, p_brand"

    # unified grain must equal reviews x categories(business) x friends(user)
    expected = (
        out["review"]
        .join(out["business"].groupBy("business_id").count().withColumnRenamed("count", "nc"), "business_id")
        .join(out["user"].groupBy("user_id").count().withColumnRenamed("count", "nf"), "user_id")
        .agg(F.sum(F.col("nc") * F.col("nf")))
        .collect()[0][0]
    )
    assert out["unified"].count() == expected

    # graph: every review has endpoints; degree structure intact
    from yelp_business_data_pipeline_spark.operators.graph import reviews_missing_edges

    assert reviews_missing_edges(out["vertices"], out["edges"]).count() == 0

    # throughput sanity: the whole pipeline (3 ETLs + 2 joins + graph) on
    # 15k reviews must stay well under a minute on local[32]
    assert elapsed < 120, f"pipeline took {elapsed:.0f}s at 15k reviews"
