"""Business-hours parsing.

The reference hand-unrolls seven ``withColumn`` blocks parsing ``"H:M-H:M"``
day strings into open hours (reference ``ETL-script/Business_ETL.py:107-139``):
minutes-since-midnight, overnight wrap ``close < open -> close + 1440``, hours
= (close - open) / 60, nulls -> 0.0, plus ``weekly_open_hours`` (sum) and
``days_open`` (count of >0 days).

Semantics pinned exactly (SURVEY.md §7 "overnight-hours"):

- ``close == open`` keeps the non-wrap branch -> 0.0 hours (NOT 24.0).
- A missing day (null string) contributes 0.0 and does not count as open.

This engine builds the same expressions programmatically over the day list —
one Project, fully codegen'd, no UDF.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import WEEKDAYS

MINUTES_PER_DAY = 1440


def day_hours_expr(day_str: Column) -> Column:
    """Open-hours (double) for one ``"H:M-H:M"`` day string; null -> 0.0.

    Matches reference ``Business_ETL.py:109-131`` including the overnight
    wrap and the close==open -> 0.0 edge.
    """
    parts = F.split(day_str, "-")
    open_t = F.split(parts.getItem(0), ":")
    close_t = F.split(parts.getItem(1), ":")
    open_min = open_t.getItem(0).cast("int") * 60 + open_t.getItem(1).cast("int")
    close_min = close_t.getItem(0).cast("int") * 60 + close_t.getItem(1).cast("int")
    close_wrapped = F.when(close_min < open_min, close_min + MINUTES_PER_DAY).otherwise(close_min)
    hrs = (close_wrapped - open_min).cast("double") / 60.0
    return F.coalesce(hrs, F.lit(0.0))


def hours_features(
    df: DataFrame,
    hours_col: str = "hours",
    drop_intermediate: bool = True,
) -> DataFrame:
    """Add ``<day>_hrs`` x7, ``weekly_open_hours``, ``days_open``.

    Reference semantics ``Business_ETL.py:107-139``; the per-day columns are
    dropped by default (the reference drops them at ``:136-138``).
    """
    day_cols = {f"{d.lower()}_hrs": day_hours_expr(F.col(hours_col).getField(d)) for d in WEEKDAYS}
    df = df.withColumns(day_cols)
    names = list(day_cols)
    df = df.withColumns(
        {
            "weekly_open_hours": reduce(add, [F.col(c) for c in names]),
            "days_open": reduce(
                add, [F.when(F.col(c) > 0.0, 1).otherwise(0) for c in names]
            ).cast("int"),
        }
    )
    if drop_intermediate:
        df = df.drop(*names)
    return df
