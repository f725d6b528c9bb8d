"""Shared plumbing for the iterative operators (BFS / PageRank / k-core /
connected components): partitioning-preserving localCheckpoints.

The iterative operators all follow the same BSP shape — a small mutable
state frame joined against a large immutable edge frame once per round,
with ``localCheckpoint`` cutting lineage each round. Stock
``localCheckpoint`` has a costly blind spot: under AQE the checkpointed
``LogicalRDD`` records ``UnknownPartitioning`` (AQE's final physical plan
does not expose its output partitioning at checkpoint-creation time), so
EVERY later join against the checkpoint re-shuffles it — the edge frame,
the biggest table in the loop, pays a full shuffle per round for no
reason. With AQE disabled just for the checkpoint's own execution, the
``LogicalRDD`` retains ``hashpartitioning(keys, n)`` and EnsureRequirements
drops the per-round exchange entirely (verified in
tests/test_iterutil.py by plan inspection).

At cluster scale this is the difference between shuffling the edge
multiset O(rounds) times and shuffling it once: the canonical Pregel
cost model (one vertex-state shuffle per superstep, edges partitioned
once up front). AQE stays on for everything else — the toggle wraps only
the checkpoint materialization, and the per-round joins still plan under
AQE (EnsureRequirements refuses to coalesce a side that must co-partition
with the fixed checkpoint layout, so correctness never depends on the
toggle).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_AQE_KEY = "spark.sql.adaptive.enabled"


@contextmanager
def _aqe_disabled(spark):
    """Scope spark.sql.adaptive.enabled=false around ONE checkpoint
    compile. The override is on the shared session conf — SQL confs have
    no per-query scoping mechanism — so any OTHER thread planning a query
    on the same SparkSession inside this window would silently plan with
    AQE off (a performance regression for it, never a correctness one).
    The iterative operators assume the usual single-threaded driver loop;
    callers running concurrent planning threads should serialize calls
    into the iterative family or accept that window."""
    prev = spark.conf.get(_AQE_KEY, "true")
    spark.conf.set(_AQE_KEY, "false")
    try:
        yield
    finally:
        spark.conf.set(_AQE_KEY, prev)


def localcheckpoint_partitioned(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition ``df`` on ``cols`` (``spark.sql.shuffle.partitions``
    buckets) and eagerly localCheckpoint it such that the materialized
    frame RETAINS its hash partitioning — later equi-joins / groupBys on
    ``cols`` need no exchange on this side.

    Use for the loop-invariant big frame (the edge set): one shuffle up
    front buys zero edge shuffles per round.
    """
    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with _aqe_disabled(spark):
        return df.repartition(n, *cols).localCheckpoint()


def localcheckpoint_keep_partitioning(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint that retains whatever hash partitioning the plan
    already produces (e.g. per-round state whose plan ends in a join or
    aggregate keyed on the state id) — WITHOUT inserting an extra
    repartition. The per-round state then re-enters the next round's
    joins exchange-free.

    ``eager=False`` marks the plan for checkpointing but defers
    materialization to the caller's FIRST action — the idiom for fusing
    "cut lineage" and "test convergence" into ONE job per round: an
    eager checkpoint followed by a count is two driver round-trips; a
    lazy checkpoint whose count triggers the persist is one. (Each job
    is ~200 ms of fixed scheduling cost in local mode and a full
    scheduler round-trip on a cluster — at tens of rounds this is the
    dominant term for small per-round state.)
    """
    with _aqe_disabled(df.sparkSession):
        return df.localCheckpoint(eager=eager)
