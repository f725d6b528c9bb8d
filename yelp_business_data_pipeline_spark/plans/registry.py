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

#: The driver's CORRECTNESS gate executes the oracles of the FIRST
#: ``GATE_SLOTS`` registrations; everything after runs rows-only.
GATE_SLOTS = 50

#: Twins of queries demoted OUT of the gate by :func:`swap_gate_slot` —
#: ``tests/test_queries_oracle.py::test_demoted_twins_still_match``
#: parametrizes over this dict, so a demoted query's exactness check
#: NEVER lapses (the rotation contract, COVERAGE.md 'Oracle-gate
#: rotation'). Source-level demotions from earlier rounds keep their
#: module constants and the explicit pin list instead.
DEMOTED_ORACLES: dict[str, str] = {}


def swap_gate_slot(promote: str, oracle: str, demote: str) -> None:
    """Gate rotation without source surgery: give ``promote`` (a
    registered rows-only tracker) its exact DuckDB twin and the registry
    slot currently held by ``demote``; ``demote`` drops to a rows-only
    tracker re-registered at the tail, its twin stashed in
    :data:`DEMOTED_ORACLES` where the mandatory pytest pin picks it up.

    Call AFTER all ``@query`` registrations (module end). Loud failures
    for every misuse: unknown names, promoting something already gated,
    demoting something already tracker-only, or a slot outside the
    driver-executed prefix — a silent no-op here would quietly un-gate
    an oracle, the exact failure mode the layout invariant test exists
    to catch."""
    names = list(QUERIES)
    if promote not in QUERIES or demote not in QUERIES:
        raise KeyError(f"swap_gate_slot: unknown query {promote!r}/{demote!r}")
    if names.index(demote) >= GATE_SLOTS:
        raise ValueError(f"swap_gate_slot: {demote!r} is not in the gate prefix")
    if names.index(promote) < GATE_SLOTS:
        raise ValueError(f"swap_gate_slot: {promote!r} is already gated")
    if QUERIES[demote].oracle is None:
        raise ValueError(f"swap_gate_slot: {demote!r} has no oracle to demote")
    if not oracle:
        raise ValueError("swap_gate_slot: promoted query needs a non-empty twin")
    old, new = QUERIES[demote], QUERIES[promote]
    DEMOTED_ORACLES[demote] = old.oracle
    promoted = QuerySpec(name=new.name, spark=new.spark, oracle=oracle, doc=new.doc)
    demoted = QuerySpec(name=old.name, spark=old.spark, oracle=None, doc=old.doc)
    order: list[QuerySpec] = []
    for n in names:
        if n == demote:
            order.append(promoted)
        elif n != promote:
            order.append(QUERIES[n])
    order.append(demoted)
    QUERIES.clear()
    QUERIES.update({q.name: q for q in order})


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
