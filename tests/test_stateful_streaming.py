"""applyInPandasWithState: per-user running profiles accumulate across
micro-batches and survive via the state store."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from yelp_business_data_pipeline_spark.streaming.stateful import running_user_profiles

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type", "value"])
    df.withColumn("ts", F.to_timestamp("ts")).write.mode("append").parquet(path)


def _drain(spark, src, ckpt, out_path):
    # memory sink can't recover from a checkpoint; foreachBatch can — write
    # each update batch to parquet and read the LAST update per user back.
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)

    def _sink(batch_df, epoch_id):
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out_path)

    q = (
        running_user_profiles(stream)
        .writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    all_updates = spark.read.parquet(out_path)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("epoch"), F.desc("n_events"))
    return {
        r.user_id: r
        for r in all_updates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }


def test_state_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    out = str(tmp_path / "updates")
    _write_batch(spark, src, [(1, "2024-01-01 00:00:00", 7, "click", 1.0),
                              (2, "2024-01-01 00:01:00", 7, "view", 2.0),
                              (3, "2024-01-01 00:02:00", 8, "click", 5.0)])
    got = _drain(spark, src, ckpt, out)
    assert got[7].n_events == 2 and got[7].value_sum == 3.0 and got[7].last_event_id == 2
    assert got[8].n_events == 1

    # second drain with a NEW file: state picks up where it left off
    _write_batch(spark, src, [(4, "2024-01-01 00:03:00", 7, "purchase", 10.0)])
    got2 = _drain(spark, src, ckpt, out)
    assert got2[7].n_events == 3 and got2[7].value_sum == 13.0 and got2[7].last_event_id == 4
    assert got2[8].n_events == 1  # untouched user's state preserved


def test_stateful_profile_rounding_not_batch_dependent(spark, tmp_path):
    """Regression: round() was persisted into state each micro-batch, so
    value_sum depended on trigger/file layout. Two sub-rounding events
    split across two files (maxFilesPerTrigger=1) must sum like one."""
    src = str(tmp_path / "ev")
    _write_batch(spark, src, [(1, "2024-01-01 00:00:00", 7, "click", 0.0000004)])
    _write_batch(spark, src, [(2, "2024-01-01 00:00:01", 7, "click", 0.0000004)])
    got = _drain(spark, src, str(tmp_path / "ckpt"), str(tmp_path / "updates"))
    final = got[7]
    assert final.n_events == 2
    assert final.value_sum == round(8e-07, 6)  # NOT 0.0 (per-batch rounding)
