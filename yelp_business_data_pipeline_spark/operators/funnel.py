"""Ordered-funnel conversion and cohort retention over an event stream.

The reference's analytics layer is dashboard-shaped (Athena/QuickSight,
reference README.md:259-307); funnels and retention matrices are the two
standard event-analytics queries that layer cannot express without window
support. Both are implemented as single-shuffle window/agg plans over the
``events`` table — the shapes a product-analytics engine (or a training-run
telemetry pipeline) runs at 100 TB.

Scale notes
-----------
``funnel_conversion``: ONE data shuffle, on the user key. The k chained
step timestamps are k window expressions over the SAME
``partitionBy(user)`` window — each depends on the previous, so Catalyst
chains k Window operators, but they all reuse the one hash partitioning
(per-partition evaluation, no re-shuffle; verified: the whole plan has 2
Exchanges — the user-key shuffle and the final 1-row aggregate). The
per-user collapse groupBy(user) also reuses that partitioning. Step count
changes operator count, not shuffle count.

``retention_matrix``: two shuffles — the per-user first-activity groupBy
and the (cohort, offset) count — plus a user-keyed self-join that AQE
co-partitions with the first groupBy. Distinct-active-users is computed
with ``countDistinct`` AFTER collapsing to (cohort, offset, user) grain,
so the wide shuffle carries one row per active (user, week), never raw
events.

Determinism: both outputs are pure functions of the input multiset — no
sampling, no time.now(), no partition-order dependence (mins and counts are
commutative).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Ordered funnel: how many users reach step k AFTER completing steps
    1..k-1 in order (strictly increasing timestamps).

    Semantics (the explicit rule, reproducible across engines):

    - a user's step-1 time is their EARLIEST ``steps[0]`` event;
    - step k's time is the earliest ``steps[k]`` event STRICTLY AFTER the
      user's step-(k-1) time — simultaneous events do not advance a funnel
      (no intra-timestamp ordering exists in the data);
    - ``within`` (an INTERVAL string, e.g. ``'7 days'``) additionally
      requires every later step to land within that horizon of step 1;
    - users with a NULL ``user_col`` are dropped (no identity, no funnel).

    Returns one row per step: ``step`` (1-based), ``step_name``,
    ``n_users`` reached, ``pct_of_first`` (rounded 6 dp; 0-row step 1 →
    NULL, never a divide-by-zero).
    """
    if not steps:
        raise ValueError("funnel_conversion: steps must be non-empty")
    w = Window.partitionBy(user_col)
    df = events.filter(F.col(user_col).isNotNull())
    prev: Column | None = None
    step_cols = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == F.lit(step)
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
            if within is not None:
                cond = cond & (
                    F.col(ts_col) <= F.col("__t0") + F.expr(f"INTERVAL {within}")
                )
        name = f"__t{i}"
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(name)
        step_cols.append(name)
    per_user = df.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in step_cols]  # window value is constant per user
    )
    counts = per_user.agg(
        *[F.count(c).alias(f"__n{i}") for i, c in enumerate(step_cols)]
    )
    # k-row unpivot of the 1-row aggregate: driver-sized by construction.
    denom = F.col("__n0")
    structs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("step_name"),
                F.col(f"__n{i}").alias("n_users"),
                F.when(denom > 0, F.round(F.col(f"__n{i}") / denom, 6))
                .alias("pct_of_first"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.explode(structs).alias("s")).select("s.*")


def retention_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their FIRST
    event; for each (cohort_week, week_offset) the count of cohort members
    active that week.

    ``week_offset`` is whole 7-day periods since the cohort week's Monday
    (``date_trunc('week')``), so offset 0 is the signup week itself and the
    diagonal invariant holds: offset-0 count == cohort size. NULL users are
    dropped; ``max_offset`` trims the long tail (None keeps all).

    Output: ``cohort_week`` (date), ``week_offset``, ``n_active``,
    ``cohort_size``, ``retention_pct``.
    """
    df = events.filter(F.col(user_col).isNotNull())
    first = df.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week")
    )
    joined = df.join(first, user_col)
    active = (
        joined.select(
            user_col,
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col(ts_col)).cast("date"), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .dropDuplicates([user_col, "cohort_week", "week_offset"])
    )
    if max_offset is not None:
        active = active.filter(F.col("week_offset") <= max_offset)
    counts = active.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    sizes = first.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        counts.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention_pct"),
        )
    )
