"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``yelp_business_data_pipeline_spark.plans`` (see that
package's docstring for the cross-engine determinism rules); this module
just adapts the registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from yelp_business_data_pipeline_spark.plans import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 M0: per-group top-k over a broadcast
    star join — scan → filter → join → window → sort/limit in one plan)."""
    return QUERIES["topk_orders_per_segment"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; omitted entries get the driver's rows-only check."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
