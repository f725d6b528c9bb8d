"""The oracle-backed query pack.

Each query is a :class:`QuerySpec`: an idiomatic-Spark callable
``(spark, sf_dir) -> DataFrame`` plus (where ANSI-expressible) a DuckDB
oracle SQL string over the driver's pre-registered testdata views. The
driver's correctness gate runs both and compares row-count + schema +
order-insensitive value-hash, so every computed column is aliased
identically on both sides (see ``__spark_entry__.py`` docstring).

Cross-engine determinism rules used throughout (documented once here):

- **Money/double sums** go through ``decimal`` (exact, order-insensitive)
  and are presented as ``double``: Spark
  ``F.sum(col.cast("decimal(18,x)")).cast("double")`` == DuckDB
  ``CAST(CAST(SUM(CAST(col AS DECIMAL(18,x))) AS VARCHAR) AS DOUBLE)``. A
  plain double sum is order-dependent (non-associative FP) and Spark's
  partial aggregation order is nondeterministic at scale. The VARCHAR hop
  on the DuckDB side is load-bearing: DuckDB's direct DECIMAL->DOUBLE
  cast divides the scaled int128 by 10^scale in double arithmetic — TWO
  roundings, off by one ulp for some values (caught by the round-5 sf1
  parity sweep at ~6e10 magnitudes); string->double is correctly rounded
  and matches Spark's (correctly rounded) decimal->double cast exactly.
- **Integer sums** are cast to BIGINT on the DuckDB side (DuckDB widens to
  HUGEINT, Spark to long).
- **Top-k / limit / dedup-pick-one** always order by a full tie-breaking
  key so the surviving rows are deterministic.
- **Timestamps** are returned as dates or extracted integer parts, never
  raw (ns-vs-us renderings differ).
- **Ratios** are computed as int/int -> double (IEEE-identical), rounded
  only at presentation.
"""

from __future__ import annotations

from .registry import QUERIES, QuerySpec, query

# Populate the registry.
from . import core as _core  # noqa: E402,F401
from . import extensions as _extensions  # noqa: E402,F401

__all__ = ["QUERIES", "QuerySpec", "query"]
