"""Re-aggregatable sketches — the 100 TB rollup pattern.

At scale you cannot re-scan raw data for every distinct-count slice: you
store a SKETCH per (grain) row in a rollup table and merge sketches at
query time. ``approx_count_distinct`` alone can't do this (its result is a
number, not mergeable state); Spark 3.5+ exposes Apache DataSketches
HyperLogLog state as first-class binary columns:

- ``hll_sketch_agg(col)``  -> binary sketch per group (storable in parquet)
- ``hll_union_agg(sketch)`` -> merged sketch across groups/partitions/days
- ``hll_sketch_estimate(sketch)`` -> the distinct estimate

The invariant that makes rollups correct: estimate(union(sketches)) ==
estimate over the concatenated raw data (within HLL error), regardless of
how the data was partitioned when the sketches were built. Pinned in
``tests/test_sketches.py`` including a parquet round-trip of the binary
sketch column — the "store now, merge months later" scenario.

These are engine-specific binary states (no DuckDB twin), so the driver
surface stays on ``approx_aggregates``'s tolerance predicates; this module
is the persistence-grade variant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_distinct_sketches(
    df: DataFrame, group_cols: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """One HLL sketch per group over ``value_col`` — the rollup-table row.
    ``lg_k`` trades memory (2^lg_k buckets) for accuracy (~1.04/sqrt(2^lg_k)
    relative error; 12 -> ~1.6%)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("distinct_sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_distinct_estimate(
    sketches: DataFrame, group_cols: list[str] | None = None,
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """Merge sketch rows (optionally re-grouped to a coarser grain) and
    estimate the distinct count — no raw data touched."""
    merged = F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("distinct_estimate")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(merged, F.sum("n_rows").alias("n_rows"))
    return sketches.agg(merged, F.sum("n_rows").alias("n_rows"))


def sketch_estimate(sketch: Column) -> Column:
    return F.hll_sketch_estimate(sketch)


def frequent_tokens(
    df: DataFrame, text_col: str = "text", support: float = 0.01
) -> list[str]:
    """Approximate heavy hitters over the token stream via Spark's
    freqItems (Karp/Schenker/Papadimitriou one-pass counters): returns a
    SUPERSET of every token with frequency > support — the guarantee that
    matters for stopword mining / boilerplate detection at scale (false
    positives are then filtered by one exact count over the small
    candidate set, never over the full vocabulary).
    """
    toks = df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    return toks.stat.freqItems(["tok"], support).collect()[0][0]


def verified_heavy_hitters(
    df: DataFrame, text_col: str = "text", support: float = 0.01
) -> DataFrame:
    """Exact heavy hitters computed the scale-correct way: freqItems gives
    the bounded candidate superset in one pass; an exact count restricted
    to those candidates (broadcast filter, tiny group-by) removes the
    false positives. Returns (tok, n, freq) for true frequency > support."""
    cands = frequent_tokens(df, text_col, support)
    toks = df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    total = toks.count()
    return (
        toks.filter(F.col("tok").isin(cands))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("freq", F.col("n") / F.lit(float(total)))
        .filter(F.col("freq") > support)
    )
