"""Top-k operators (SURVEY.md §2.5).

- W1 global top-k: ``orderBy().limit(k)`` compiles to Spark's
  ``TakeOrderedAndProject`` — per-partition heap + driver merge of k rows,
  no global sort. This is the scale-correct plan for small k over 100 TB.
- W3 per-group top-k: window ``row_number() <= k`` — single shuffle on the
  group key; AQE handles group-count skew. (Reference smoke query: top-5
  reviewers of a business, ``test_cases/neo4j_test.cypher:49-53``.)

Both take explicit tie-breaker columns so results are deterministic (needed
for oracle hashing and, more importantly, for reproducible pipelines).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_global(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    w = Window.partitionBy(*[F.col(c) for c in group_by]).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
