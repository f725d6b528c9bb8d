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


def _ensure_session_confs(spark: SparkSession) -> None:
    """Queries may run under the DRIVER'S SparkSession, not our factory's
    (``__spark_entry__`` contract), so set the two runtime confs correctness
    depends on: NANOS-parquet readability (events.ts) and UTC calendar
    arithmetic (date-part extraction must agree with DuckDB's tz-naive
    reads). Both are runtime-settable SQL confs; idempotent."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS): arrives as long ns under
        # nanosAsLong; convert to a microsecond timestamp.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # Integer division (`div`), not `/`: Spark's `/` on longs is
            # double division, and ~1.7e18 ns exceeds double's 53-bit exact
            # range — sub-microsecond components could truncate to the wrong
            # microsecond vs DuckDB's exact integer conversion.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
