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
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a session-tz (UTC) TIMESTAMP regardless of
    how the generator wrote it. Containers have shipped two physical types:

    - parquet TIMESTAMP(NANOS): arrives as long ns under ``nanosAsLong``.
      Integer division (`div`), not `/`: Spark's `/` on longs is double
      division, and ~1.7e18 ns exceeds double's 53-bit exact range —
      sub-microsecond components could truncate to the wrong microsecond vs
      DuckDB's exact integer conversion.
    - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
      TIMESTAMP_NTZ. Cast to TIMESTAMP — the session tz is pinned to UTC, so
      the wall-clock reinterpretation is the identity instant and date-part
      extraction agrees with DuckDB's tz-naive read.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
