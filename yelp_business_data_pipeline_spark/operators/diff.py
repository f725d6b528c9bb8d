"""Snapshot diff: CDC-style reconciliation of two table versions.

The reference's pipeline rebuilds its unified table per batch (overwrite
mode, reference README.md:217-223) with no way to answer "what changed
between yesterday's build and today's?". ``table_diff`` is that operator:
classify every key as added / removed / changed / unchanged between two
snapshots, with the exact columns that differ. It is the natural
complement to ``sources.writers.merge_upsert`` (diff two parquet
snapshots to AUDIT what a merge did, or to derive a CDC feed from
full-snapshot drops — the standard pattern when an upstream system can
only export full dumps).

Scale design (the 100 TB shape)
-------------------------------
One full-outer sort-merge join keyed on the diff keys — the minimal
data movement for any diff (every row must meet its counterpart). Both
sides shuffle once; pre-bucketed snapshots (sources/catalog.py) co-locate
and skip both exchanges. Comparison is pure JVM column expressions
(null-safe ``<=>`` per compare column — no row serialization, no UDF);
``changed_cols`` builds from the same predicates via higher-order
functions. unchanged rows are dropped by default BEFORE the caller sees
them (at 100 TB almost every row is unchanged, so the post-join filter
is what keeps the output — and any downstream shuffle — proportional to
the churn, not the corpus).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ADDED = "added"
REMOVED = "removed"
CHANGED = "changed"
UNCHANGED = "unchanged"


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    keep_unchanged: bool = False,
    include_values: bool = False,
    null_safe_keys: bool = True,
) -> DataFrame:
    """Row-level diff of two snapshots sharing a key.

    Returns one row per key present in either snapshot:

    - ``change_type``: ``added`` (key only in ``new``), ``removed`` (only
      in ``old``), ``changed`` (both, some compare column differs under
      null-safe equality), ``unchanged`` (both, all equal — dropped
      unless ``keep_unchanged``);
    - ``changed_cols``: comma-joined names of differing columns (declared
      order), '' for non-``changed`` rows;
    - with ``include_values``, ``old_<c>`` / ``new_<c>`` for every compare
      column (the CDC-feed payload).

    ``compare_cols`` defaults to every shared non-key column. Keys are
    matched null-safely by default (a NULL key is a legal key value and
    meets its NULL counterpart, exactly like ``merge_upsert``) — but the
    ``<=>`` condition compiles to derived join keys
    ``(coalesce(k), isnull(k))``, which a bucketed table layout cannot
    satisfy, forcing both sides to shuffle. When the snapshots are
    pre-bucketed on the diff keys AND keys are known non-null (the usual
    production contract), pass ``null_safe_keys=False``: the join then
    uses the raw key columns, bucket co-location elides BOTH exchanges
    (pinned in tests/test_diff.py), and any NULL-keyed rows degrade to a
    removed+added pair instead of matching each other.

    Duplicate keys are the caller's contract to avoid (diff of multisets
    is ill-posed); validate with ``cleaning.assert_unique_keys`` first.
    """
    if not keys:
        raise ValueError("table_diff: keys must be non-empty")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"_ov_{c}") for c in compare_cols],
        F.lit(1).alias("_o_present"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"_nv_{c}") for c in compare_cols],
        F.lit(1).alias("_n_present"),
    )
    cmp = (
        (lambda a, b: a.eqNullSafe(b)) if null_safe_keys else (lambda a, b: a == b)
    )
    cond = reduce(
        lambda a, b: a & b,
        [cmp(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")) for k in keys],
    )
    j = o.join(n, cond, "full_outer")
    in_old = F.col("_o_present").isNotNull()
    in_new = F.col("_n_present").isNotNull()
    diffs: list[Column] = [
        ~F.col(f"_ov_{c}").eqNullSafe(F.col(f"_nv_{c}")) for c in compare_cols
    ]
    any_diff = reduce(lambda a, b: a | b, diffs) if diffs else F.lit(False)
    change_type = (
        F.when(~in_old, F.lit(ADDED))
        .when(~in_new, F.lit(REMOVED))
        .when(any_diff, F.lit(CHANGED))
        .otherwise(F.lit(UNCHANGED))
    )
    changed_cols = F.array_join(
        F.filter(
            F.array(
                *[F.when(d, F.lit(c)) for c, d in zip(compare_cols, diffs)]
            ),
            lambda x: x.isNotNull(),
        ),
        ",",
    )
    out_cols = [
        *[
            F.when(in_old, F.col(f"_ok_{k}")).otherwise(F.col(f"_nk_{k}")).alias(k)
            for k in keys
        ],
        change_type.alias("change_type"),
        F.when(change_type == CHANGED, changed_cols).otherwise(F.lit("")).alias(
            "changed_cols"
        ),
    ]
    if include_values:
        out_cols += [F.col(f"_ov_{c}").alias(f"old_{c}") for c in compare_cols]
        out_cols += [F.col(f"_nv_{c}").alias(f"new_{c}") for c in compare_cols]
    result = j.select(*out_cols)
    if not keep_unchanged:
        result = result.filter(F.col("change_type") != UNCHANGED)
    return result
