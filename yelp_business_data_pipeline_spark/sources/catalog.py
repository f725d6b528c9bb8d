"""Spark-catalog registration — the engine's replacement for the
reference's Glue-crawler + Athena layer (reference
``lambda/trigeer_ETL_Pipeline.py:45-56``, ``README.md:229-257``).

Where the reference re-infers schemas with a crawler after every batch and
queries through Athena, this engine registers tables ONCE in the Spark
catalog (schemas authoritative from the write path) and serves the same SQL
through ``spark.sql``. ``REFRESH TABLE`` replaces the crawler re-run.

Bucketing: ``save_bucketed`` writes a table hash-bucketed (and sorted) by
its join key. Two tables bucketed the same way join with ZERO shuffle —
the 100 TB answer for repeated star joins on the same keys (SURVEY.md §2.3
note: 'co-located joins via bucketing').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_view(df: DataFrame, name: str) -> None:
    """Session-scoped view for spark.sql (the Athena-query replacement)."""
    df.createOrReplaceTempView(name)


def save_table(
    df: DataFrame,
    name: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist into the catalog as a managed parquet table."""
    writer = df.write.mode(mode).format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(name)


def save_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist hash-bucketed (+ sorted) by the join/agg key.

    Joins and aggregations on ``bucket_cols`` between tables bucketed with
    the same (cols, n_buckets) skip the Exchange entirely; sorting within
    buckets also skips the sort of a sort-merge join.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(name)


def refresh(spark: SparkSession, name: str) -> None:
    """Post-write metadata refresh (the Glue-crawler-rerun analog, St2).
    Uses the catalog API rather than string-built SQL so identifiers
    needing quoting (dashes, reserved words) don't raise ParseException."""
    spark.catalog.refreshTable(name)
