"""Grouped-map Pandas operators (SURVEY.md §2.8 U2 surface).

``applyInPandas`` receives each group as a pandas DataFrame — the escape
hatch for per-group logic that window functions can't express (iterative
fitting, per-group models). Used sparingly: everything here ALSO has a pure
JVM twin, and the pytest suite pins their equivalence, demonstrating when
the escape hatch is and isn't warranted (z-score is expressible with
windows — the pandas version exists as the U2 surface demo and for the
pattern's documentation value).

Scale: each group must fit in one executor's memory as a pandas frame —
fine for bounded groups (per-user, per-day), wrong for unbounded hot keys;
pre-aggregate or salt first.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_by_group_pandas(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group z-score via grouped-map pandas (ddof=0 population std;
    constant groups -> 0.0).

    NULL-input caveat (the one observable divergence from the JVM twin):
    pandas mean/std skip NaN, so non-null rows score identically, but a
    NULL value row comes back as NaN here vs NULL from the JVM twin —
    float64 pandas frames cannot round-trip the distinction through
    Arrow. Filter NULLs first if the difference matters."""
    out_schema = f"{group_col} string, {value_col} double, zscore double"

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        std = v.std(ddof=0)
        z = (v - v.mean()) / std if std > 0 else v * 0.0
        return pd.DataFrame(
            {group_col: pdf[group_col], value_col: v, "zscore": z.round(6)}
        )

    return (
        df.select(F.col(group_col).cast("string"), F.col(value_col).cast("double"))
        .groupBy(group_col)
        .applyInPandas(_z, schema=out_schema)
    )


def zscore_by_group_jvm(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Same semantics with window aggregates — the plan Catalyst can
    optimize (one shuffle, codegen); preferred in production."""
    w = Window.partitionBy(group_col)
    mean = F.avg(value_col).over(w)
    # population std (ddof=0) to match pandas std(ddof=0)
    std = F.stddev_pop(value_col).over(w)
    z = F.when(std > 0, (F.col(value_col) - mean) / std).otherwise(F.lit(0.0))
    return df.select(
        F.col(group_col).cast("string"),
        F.col(value_col).cast("double"),
        F.round(z, 6).alias("zscore"),
    )
