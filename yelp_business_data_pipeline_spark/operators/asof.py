"""As-of (temporal) joins — backward, forward, nearest.

Spark has no native as-of join (guide: 'As-of / range join — Spark lacks a
native one'). This implements the scalable union-window construction rather
than a per-group ``merge_asof`` Pandas UDF:

1. tag both inputs and union them on a common schema;
2. window(s) over (keys) ordered by (time, side) — right rows sort before
   left rows at equal timestamps, making matches inclusive;
3. ``last(carry_struct, ignorenulls=True)`` carries the nearest right-side
   row forward (backward direction: ascending time) and/or backward
   (forward direction: descending time) — BOTH carries come from the SAME
   single union, so `nearest` needs no self-join (a re-join on left columns
   would drop null-bearing left rows and multiply duplicates);
4. keep the left rows: exactly one output row per left row, always.

All payload columns travel inside ONE struct so a single
last(ignorenulls=True) picks the whole matched row atomically: a NULL
payload value inside the matched row stays NULL, and every payload column
provably comes from the same right row.

Null timestamps: right rows with a NULL ``right_ts`` can never match and
are filtered; left rows with a NULL ``left_ts`` sort BEFORE any right row
in both window directions (nulls-first) so they get a NULL match, never a
phantom one.

Cost: ONE shuffle on the join keys (the union is shuffle-free); `nearest`
adds a second sort over the same partitioning, not a second shuffle.
Skewed keys are split by AQE since the window partitions on the same key
as any equivalent join would. DuckDB's native ``ASOF LEFT JOIN`` is the
oracle twin for the backward direction.

Tiebreak rule (all directions, deterministic): when several right rows
share a timestamp, the GREATEST ``right_tiebreak`` wins. (pandas
merge_asof resolves duplicate right keys positionally and differs per
direction; a single explicit rule is reproducible across engines.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Attach ``payload_cols`` (as ``asof_<col>``) from the right row:

    - ``backward``: greatest ``right_ts <= left_ts`` (null if none);
    - ``forward``:  smallest ``right_ts >= left_ts`` (null if none);
    - ``nearest``:  whichever of the two is closer in time; exact ties go
      backward (pandas semantics).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction}")
    internal = {"_t", "_side", "_carry", "_cb", "_cf", "_picked", "_rn"}
    clashes = internal & set(left.columns) | internal & set(right.columns)
    if clashes:
        raise ValueError(
            f"asof_join: input columns {sorted(clashes)} collide with the "
            "operator's internal names; rename them first"
        )
    overwritten = {f"asof_{c}" for c in payload_cols} & set(left.columns)
    if overwritten:
        raise ValueError(
            f"asof_join: output columns {sorted(overwritten)} already exist "
            "on the left input (e.g. from a previous as-of join); rename "
            "them first — silently overwriting would lose that join"
        )
    if right_tiebreak is not None:
        tie_order = F.desc(right_tiebreak)
    else:
        # the docstring PROMISES determinism: without a caller tie-break,
        # duplicate right timestamps would let last() pick whichever row
        # the shuffle placed last — break ties on a content hash of the
        # payload instead (stable across runs and partitionings)
        tie_order = F.desc(F.xxhash64(F.struct(*[F.col(c) for c in payload_cols])))
    w_dedup = Window.partitionBy(*on, right_ts).orderBy(tie_order)
    right = (
        right.withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    right = right.filter(F.col(right_ts).isNotNull())

    # Carry struct always includes the matched right timestamp (_rt) so
    # `nearest` can compare gaps without re-joining.
    r_tagged = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias("_rt"), *[F.col(c) for c in payload_cols]
        ).alias("_carry"),
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

    frame = (Window.unboundedPreceding, Window.currentRow)
    # nulls_first in BOTH directions: a null-ts left row must precede every
    # right row so it carries nothing.
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc_nulls_first(), F.col("_side"))
        .rowsBetween(*frame)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").desc_nulls_first(), F.col("_side"))
        .rowsBetween(*frame)
    )
    if direction in ("backward", "nearest"):
        unioned = unioned.withColumn("_cb", F.last("_carry", ignorenulls=True).over(w_back))
    if direction in ("forward", "nearest"):
        unioned = unioned.withColumn("_cf", F.last("_carry", ignorenulls=True).over(w_fwd))

    out = unioned.filter(F.col("_side") == 1)
    if direction == "backward":
        picked = F.col("_cb")
    elif direction == "forward":
        picked = F.col("_cf")
    else:
        # cast through timestamp first: a DateType (or long-seconds) ts
        # casts to double as NULL / wrong under a direct cast, which would
        # silently make `nearest` forward-preferring — timestamp -> double
        # is the chain every temporal type supports
        def _seconds(c):
            return c.cast("timestamp").cast("double")

        b_gap = _seconds(F.col(left_ts)) - _seconds(F.col("_cb").getField("_rt"))
        f_gap = _seconds(F.col("_cf").getField("_rt")) - _seconds(F.col(left_ts))
        use_back = F.col("_cf").isNull() | (F.col("_cb").isNotNull() & (b_gap <= f_gap))
        picked = F.when(use_back, F.col("_cb")).otherwise(F.col("_cf"))
    out = out.withColumn("_picked", picked)
    for c in payload_cols:
        out = out.withColumn(f"asof_{c}", F.col("_picked").getField(c))
    return out.drop("_t", "_side", "_carry", "_cb", "_cf", "_picked")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of (see :func:`asof_join`)."""
    return asof_join(left, right, on, left_ts, right_ts, payload_cols, right_tiebreak, "backward")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Forward as-of (see :func:`asof_join`)."""
    return asof_join(left, right, on, left_ts, right_ts, payload_cols, right_tiebreak, "forward")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Nearest as-of (see :func:`asof_join`)."""
    return asof_join(left, right, on, left_ts, right_ts, payload_cols, right_tiebreak, "nearest")


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
    interval-join decomposition.

    Preconditions, guarded loudly: ``bucket >= max_gap`` (only the +-1
    neighbor buckets join, so a smaller bucket would silently DROP
    matching pairs at distance > bucket) — enforced with an executor-side
    assert since both are Columns; and the two inputs must not share
    column names beyond ``on`` (the join output would be ambiguous) —
    enforced up front."""
    shared = (set(left.columns) & set(right.columns)) - set(on)
    if shared:
        raise ValueError(
            f"time_bucket_range_join: inputs share non-key columns "
            f"{sorted(shared)} (including identical ts names); rename one "
            "side first — the join output would be ambiguous"
        )
    lb = left.withColumn("_b", (F.col(left_ts).cast("long") / bucket).cast("long"))
    rb = right.withColumn("_b0", (F.col(right_ts).cast("long") / bucket).cast("long"))
    rx = rb.withColumn("_b", F.explode(F.array(F.col("_b0") - 1, F.col("_b0"), F.col("_b0") + 1))).drop(
        "_b0"
    )
    joined = lb.join(rx, [*on, "_b"])
    gap = F.abs(F.col(left_ts).cast("long") - F.col(right_ts).cast("long"))
    bucket_ok = F.assert_true(
        bucket >= max_gap,
        F.lit(
            "time_bucket_range_join: bucket < max_gap would silently drop "
            "pairs at distance > bucket; use bucket >= max_gap"
        ),
    )
    return joined.filter(bucket_ok.isNull() & (gap <= max_gap)).drop("_b")
