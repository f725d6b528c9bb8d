"""Query registry shared by ``plans.core`` / ``plans.extensions``."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL twin; None -> driver does rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = "") -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a (spark_fn, oracle_sql) pair."""

    def _register(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return _register


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS): read as long ns (see
        # session.py nanosAsLong) and convert to a microsecond timestamp.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df
