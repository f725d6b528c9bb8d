"""Skew operators: salted join equivalence and salted-agg plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.skew import salted_aggregate, salted_join


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [(k, i) for k in ("hot", "hot", "hot", "hot", "cold") for i in range(10)],
        ["k", "v"],
    )
    small = spark.createDataFrame([("hot", 1.5), ("cold", 2.5), ("unmatched", 9.9)], ["k", "w"])
    plain = {(r.k, r.v, r.w) for r in big.join(small, "k").collect()}
    salted = {(r.k, r.v, r.w) for r in salted_join(big, small, "k", n_salts=4).collect()}
    assert salted == plain


def test_salted_join_left(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    small = spark.createDataFrame([("a", 10.0)], ["k", "w"])
    rows = {(r.k, r.v, r.w) for r in salted_join(big, small, "k", n_salts=3, how="left").collect()}
    assert rows == {("a", 1, 10.0), ("b", 2, None)}


def test_salted_aggregate_two_shuffles(spark, sf_dir):
    from .test_plans import plan_str

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = salted_aggregate(
        o, ["o_orderstatus"], {"n": ("count", "o_orderkey")}, n_salts=8, salt_on=["o_orderkey"]
    )
    p = plan_str(out, "simple")
    # phase 1 shuffles on (key, salt), phase 2 on key
    assert p.count("Exchange hashpartitioning") == 2, p
    got = {r.o_orderstatus: r.n for r in out.collect()}
    want = {r.o_orderstatus: r.n for r in
            o.groupBy("o_orderstatus").agg(F.count("o_orderkey").alias("n")).collect()}
    assert got == want
