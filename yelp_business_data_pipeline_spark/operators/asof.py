"""As-of (backward temporal) join.

Spark has no native as-of join (guide: 'As-of / range join — Spark lacks a
native one'). This implements the scalable union-window construction rather
than a per-group ``merge_asof`` Pandas UDF:

1. tag both inputs and union them on a common schema;
2. one window over (keys) ordered by (time, side, tiebreak) — right rows
   sort before left rows at equal timestamps, making the match inclusive
   (right.t <= left.t);
3. ``last(value, ignorenulls=True)`` carries the most recent right-side
   payload forward;
4. keep the left rows.

Cost: ONE shuffle on the join keys (the union is shuffle-free), versus a
range-join blowup or a groupBy-collect. Skewed keys are split by AQE since
the window partitions on the same key as any equivalent join would.
DuckDB's native ``ASOF LEFT JOIN`` is the oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach ``payload_cols`` from the right row with the
    greatest ``right_ts <= left_ts`` within the same ``on`` keys (null if no
    prior right row). If several right rows share a timestamp, the greatest
    ``right_tiebreak`` wins (dedup to keep semantics deterministic).
    """
    if right_tiebreak is not None:
        w_dedup = Window.partitionBy(*on, right_ts).orderBy(F.desc(right_tiebreak))
        right = (
            right.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    # All payload columns travel inside ONE struct so a single
    # last(ignorenulls=True) picks the whole matched row atomically: a NULL
    # payload value inside the matched row stays NULL (it is a non-null
    # struct), and every payload column provably comes from the same right
    # row — carrying columns independently would back-fill NULL payloads
    # from older rows and could mix rows.
    r_tagged = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_carry"),
    )
    left_cols = left.columns
    l_tagged = left.select(
        *left_cols,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_carry"].dataType).alias("_carry"),
    )
    # Align schemas: right side gets nulls for left payload columns.
    extra_left = [c for c in left_cols if c not in on]
    r_full = r_tagged.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c in extra_left else F.col(c) for c in left_cols],
        "_t",
        "_side",
        "_carry",
    )
    unioned = l_tagged.unionByName(r_full)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = unioned.withColumn("_carry", F.last(F.col("_carry"), ignorenulls=True).over(w))
    out = unioned.filter(F.col("_side") == 1)
    for c in payload_cols:
        out = out.withColumn(f"asof_{c}", F.col("_carry").getField(c))
    return out.drop("_t", "_side", "_carry")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Forward as-of: attach the right row with the SMALLEST
    ``right_ts >= left_ts`` (pandas merge_asof direction='forward').

    Same union-window construction as backward, mirrored: right rows sort
    AFTER left rows at equal timestamps (inclusive match) and the window
    looks at following rows via a descending sort + last(ignorenulls)
    carry. Deterministic tiebreak keeps the SMALLEST ``right_tiebreak``
    at equal timestamps.
    """
    if right_tiebreak is not None:
        w_dedup = Window.partitionBy(*on, right_ts).orderBy(F.asc(right_tiebreak))
        right = (
            right.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    r_tagged = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_carry"),
    )
    left_cols = left.columns
    l_tagged = left.select(
        *left_cols,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_carry"].dataType).alias("_carry"),
    )
    extra_left = [c for c in left_cols if c not in on]
    r_full = r_tagged.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c in extra_left else F.col(c) for c in left_cols],
        "_t",
        "_side",
        "_carry",
    )
    unioned = l_tagged.unionByName(r_full)
    # Descending time: the "most recent previous" row in this order is the
    # smallest right_ts >= left_ts in real time. _side ascending keeps
    # right rows (0) before left rows (1) at equal t -> inclusive.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.desc("_t"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = unioned.withColumn("_carry", F.last(F.col("_carry"), ignorenulls=True).over(w))
    out = unioned.filter(F.col("_side") == 1)
    for c in payload_cols:
        out = out.withColumn(f"asof_{c}", F.col("_carry").getField(c))
    return out.drop("_t", "_side", "_carry")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Nearest as-of: the right row minimizing ``|right_ts - left_ts|``
    (pandas direction='nearest'; backward wins exact ties, like pandas).

    Composition of the backward and forward passes plus a per-row
    distance pick — two window shuffles on the same keys (AQE reuses the
    partitioning), still no range-join blowup.
    """
    back = asof_join_backward(left, right, on, left_ts, right_ts, [right_ts, *payload_cols], right_tiebreak)
    for c in [right_ts, *payload_cols]:
        back = back.withColumnRenamed(f"asof_{c}", f"_b_{c}")
    fwd = asof_join_forward(left, right, on, left_ts, right_ts, [right_ts, *payload_cols], right_tiebreak)
    for c in [right_ts, *payload_cols]:
        fwd = fwd.withColumnRenamed(f"asof_{c}", f"_f_{c}")
    joined = back.join(fwd, [*left.columns])
    b_gap = F.abs(F.col(left_ts).cast("double") - F.col(f"_b_{right_ts}").cast("double"))
    f_gap = F.abs(F.col(f"_f_{right_ts}").cast("double") - F.col(left_ts).cast("double"))
    use_back = F.col(f"_f_{right_ts}").isNull() | (
        F.col(f"_b_{right_ts}").isNotNull() & (b_gap <= f_gap)
    )
    out = joined
    for c in payload_cols:
        out = out.withColumn(
            f"asof_{c}", F.when(use_back, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}"))
        )
    drop = [f"_b_{c}" for c in [right_ts, *payload_cols]] + [f"_f_{c}" for c in [right_ts, *payload_cols]]
    return out.drop(*drop)


def time_bucket_range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    max_gap: Column,
    bucket: Column,
) -> DataFrame:
    """Range join |left_ts - right_ts| <= max_gap via bucketized equi-join:
    each side joins on (keys, time_bucket) for the bucket and its neighbor,
    then the exact predicate filters. Turns an O(n*m) theta join into an
    equi-join Catalyst can shuffle/broadcast normally — the standard
    interval-join decomposition."""
    lb = left.withColumn("_b", (F.col(left_ts).cast("long") / bucket).cast("long"))
    rb = right.withColumn("_b0", (F.col(right_ts).cast("long") / bucket).cast("long"))
    rx = rb.withColumn("_b", F.explode(F.array(F.col("_b0") - 1, F.col("_b0"), F.col("_b0") + 1))).drop(
        "_b0"
    )
    joined = lb.join(rx, [*on, "_b"])
    gap = F.abs(F.col(left_ts).cast("long") - F.col(right_ts).cast("long"))
    return joined.filter(gap <= max_gap).drop("_b")
