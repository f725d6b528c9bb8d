"""Readers and writers: corrupt-record handling, idempotent append,
overwrite, uniqueness validation."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from yelp_business_data_pipeline_spark.operators.cleaning import assert_unique_keys
from yelp_business_data_pipeline_spark.sources import (
    read_json_lines,
    write_append_idempotent,
    write_overwrite,
)

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)


def test_read_json_corrupt_rows_dropped(spark, tmp_path):
    p = tmp_path / "rows.json"
    p.write_text('{"id": 1, "v": "a"}\nTHIS IS NOT JSON\n{"id": 2, "v": "b"}')
    df = read_json_lines(spark, str(p), SCHEMA)
    assert sorted(r.id for r in df.collect()) == [1, 2]
    kept = read_json_lines(spark, str(p), SCHEMA, keep_corrupt=True)
    bad = kept.filter(kept["_corrupt_record"].isNotNull()).collect()
    assert len(bad) == 1 and "NOT JSON" in bad[0]._corrupt_record


def test_write_append_idempotent(spark, tmp_path):
    out = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "a"), (2, "b"), (2, "b")], ["id", "v"])
    write_append_idempotent(df1, out, keys=["id"])
    assert spark.read.parquet(out).count() == 2  # in-batch dup collapsed
    df2 = spark.createDataFrame([(2, "b"), (3, "c")], ["id", "v"])
    write_append_idempotent(df2, out, keys=["id"])
    got = spark.read.parquet(out)
    assert sorted(r.id for r in got.collect()) == [1, 2, 3]
    assert_unique_keys(got, ["id"])


def test_write_overwrite(spark, tmp_path):
    out = str(tmp_path / "t")
    write_overwrite(spark.createDataFrame([(1, "a")], ["id", "v"]), out)
    write_overwrite(spark.createDataFrame([(9, "z")], ["id", "v"]), out)
    rows = spark.read.parquet(out).collect()
    assert [(r.id, r.v) for r in rows] == [(9, "z")]


def test_assert_unique_raises(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b")], ["id", "v"])
    with pytest.raises(ValueError):
        assert_unique_keys(df, ["id"])


def test_export_csv_roundtrip(spark, tmp_path):
    from yelp_business_data_pipeline_spark.sources.writers import export_csv

    out = str(tmp_path / "csv")
    df = spark.createDataFrame([(1, "a", 2.5), (2, "b,with,commas", 3.5)], ["id", "s", "x"])
    export_csv(df, out)
    back = spark.read.option("header", "true").csv(out)
    rows = sorted((r.id, r.s, r.x) for r in back.collect())
    assert rows == [("1", "a", "2.5"), ("2", "b,with,commas", "3.5")]


def test_compact_parquet(spark, tmp_path):
    from yelp_business_data_pipeline_spark.sources.writers import compact_parquet

    out = str(tmp_path / "t")
    # simulate many micro-batch appends -> many small files
    for i in range(6):
        spark.createDataFrame([(i * 10 + j, f"v{i}") for j in range(5)], ["id", "v"]).coalesce(
            2
        ).write.mode("append").parquet(out)
    import glob

    before = len(glob.glob(f"{out}/part-*.parquet"))
    rows_before = sorted(r.id for r in spark.read.parquet(out).collect())
    n = compact_parquet(spark, out, target_mb=128)
    after = len(glob.glob(f"{out}/part-*.parquet"))
    assert n == 1 and after == 1 and after < before
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == rows_before


def test_schema_evolution_on_append(spark, tmp_path):
    """Appended batches may gain columns over time (the reference re-infers
    schemas per batch, silently drifting; this engine reads evolved tables
    explicitly with mergeSchema and fills missing columns with nulls)."""
    out = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], ["id", "v"]).write.mode("append").parquet(out)
    spark.createDataFrame([(2, "b", 9.5)], ["id", "v", "score"]).write.mode("append").parquet(out)
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    rows = {r.id: r for r in merged.collect()}
    assert set(merged.columns) == {"id", "v", "score"}
    assert rows[1].score is None and rows[2].score == 9.5


def test_orc_roundtrip_with_predicate_pushdown(spark, tmp_path):
    """ORC is the other columnar format Spark speaks natively; the engine's
    readers are format-agnostic DataFrame reads, so a user with ORC inputs
    (common on Hive-era lakes) needs no conversion step. Round-trips values
    and keeps filter pushdown in the scan."""
    out = str(tmp_path / "orc_t")
    df = spark.range(0, 1000).selectExpr("id", "CAST(id % 7 AS INT) AS k", "id * 1.5 AS v")
    df.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.count() == 1000
    got = back.filter("k = 3").agg({"v": "sum"}).first()[0]
    want = df.filter("k = 3").agg({"v": "sum"}).first()[0]
    assert got == want
    plan = back.filter("k = 3")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,3)]" in plan


def test_corrupt_dropping_reader_survives_count_and_inference_drops(spark, tmp_path):
    """Regression: the filter-on-corrupt-column form crashed count() under
    column pruning; DROPMALFORMED must count cleanly, and inference mode
    must honor keep_corrupt=False."""
    from pyspark.sql import types as T

    from yelp_business_data_pipeline_spark.sources.readers import read_json_lines

    p = tmp_path / "in"
    p.mkdir()
    (p / "a.json").write_text('{"id": 1, "v": "x"}\n{broken\n{"id": 2, "v": "y"}\n')
    schema = T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.StringType())])
    df = read_json_lines(spark, str(p), schema)
    assert df.count() == 2  # the old formulation raised here
    assert "_corrupt_record" not in df.columns
    inferred = read_json_lines(spark, str(p), None)
    assert inferred.count() == 2
    assert "_corrupt_record" not in inferred.columns
    # quarantine queries on the PERMISSIVE capture path need the cache
    # step Spark's own docs prescribe (corrupt-only projections are
    # disallowed on the raw scan)
    kept = read_json_lines(spark, str(p), schema, keep_corrupt=True).cache()
    try:
        assert kept.filter("_corrupt_record IS NOT NULL").count() == 1
    finally:
        kept.unpersist()
