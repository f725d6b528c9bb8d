"""Skew mitigation (SURVEY.md §7 '100 TB design: ... salting available for
skewed business_id'; guide 'Skew: salt the hot key').

Spark's AQE skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in the session factory). These
operators cover the cases AQE can't:

- **Salted two-phase aggregation** — when the GROUP BY key itself has few
  distinct values (e.g. 3 order statuses over 100 TB), every row of a hot
  key lands on one reducer. Salting fans each key across ``n_salts``
  partial groups, then a second (tiny) aggregation merges partials. Works
  for any algebraic aggregate (sum/count/min/max — things with a merge).
- **Salted join** — replicate the SMALL side ``n_salts`` times, salt the
  big side deterministically, join on (key, salt). Use when the small side
  is too big to broadcast but the big side's key distribution is skewed.

Both are pure plan rewrites with exact semantics — the salted aggregation
query in the oracle pack hash-matches a plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Aggregates with a merge function: (partial_expr, merge_fn).
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salt_expr(n_salts: int, *cols: Column) -> Column:
    """Deterministic salt in [0, n_salts): hash of the row's non-key
    columns (falls back to spark_partition_id when none given — still
    deterministic per row *placement*, used only for load spreading)."""
    if cols:
        return F.pmod(F.xxhash64(*cols), F.lit(n_salts))
    return F.pmod(F.spark_partition_id(), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs``: output_name -> (agg_fn, input_col) with agg_fn in
    {sum, count, min, max}. Phase 1 groups on (keys..., salt) — hot keys
    spread over ``n_salts`` reducers; phase 2 merges the (keys x n_salts)
    partials, which is tiny by construction.
    """
    if "_salt" in df.columns:
        raise ValueError(
            "salted_aggregate: input already has a '_salt' column — the "
            "operator would silently overwrite it; rename it first"
        )
    salt_cols = [F.col(c) for c in (salt_on or [])]
    salted = df.withColumn("_salt", salt_expr(n_salts, *salt_cols))
    partial_exprs = []
    merge_exprs = []
    for out_name, (fn_name, in_col) in aggs.items():
        if fn_name not in _ALGEBRAIC:
            raise ValueError(
                f"salted_aggregate: unsupported aggregate {fn_name!r} — the "
                f"two-phase merge supports {sorted(_ALGEBRAIC)}; express avg "
                "as sum+count and divide after the merge"
            )
        partial_fn, merge_fn = _ALGEBRAIC[fn_name]
        partial_exprs.append(partial_fn(F.col(in_col)).alias(f"_p_{out_name}"))
        merge_exprs.append(merge_fn(F.col(f"_p_{out_name}")).alias(out_name))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*merge_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, replicate the small side.

    The big side's salt must depend on something other than the join key
    (here: a uniform hash of the big row's HASHABLE non-key columns —
    map-typed columns are excluded, since xxhash64 rejects maps and the
    salt needs only per-row variation, not every byte) — every big row
    keeps exactly one salt; every small row is replicated to all salts,
    so each (key, salt) bucket joins correctly. Cost: small side x
    n_salts; use broadcast() instead whenever it fits.

    Only ``inner`` and ``left`` joins are supported: with ``right`` or
    ``full``, small-side replicas whose (key, salt) bucket has no big row
    survive the outer join as n_salts duplicate/phantom rows — exact
    semantics under salting require dedup machinery this rewrite does not
    carry, so the unsupported directions raise instead of corrupting.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join: how={how!r} is not supported — right/full outer "
            "would keep each unmatched small-side replica as a phantom row; "
            "swap the sides (left) or use a plain join for those directions"
        )
    if "_salt" in big.columns or "_salt" in small.columns:
        raise ValueError(
            "salted_join: an input already has a '_salt' column — the "
            "operator would silently overwrite and then drop it; rename it"
        )
    def _contains_map(dt: T.DataType) -> bool:
        # xxhash64 rejects MapType anywhere in the tree, not just at the
        # top level — a struct<m: map<...>> or array<map<...>> column
        # would still fail analysis, so walk the nested types too.
        if isinstance(dt, T.MapType):
            return True
        if isinstance(dt, T.StructType):
            return any(_contains_map(f.dataType) for f in dt.fields)
        if isinstance(dt, T.ArrayType):
            return _contains_map(dt.elementType)
        return False

    hashable = [
        f.name
        for f in big.schema.fields
        if f.name != key and not _contains_map(f.dataType)
    ]
    big_s = big.withColumn("_salt", salt_expr(n_salts, *[F.col(c) for c in hashable]))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")


def detect_hot_keys(
    df: DataFrame,
    key: str,
    min_share: float = 0.01,
    m: int = 256,
) -> DataFrame:
    """Keys GUARANTEED to carry more than ``min_share`` of the rows,
    found without a full groupBy of the (possibly 100 TB) fact table:
    one streaming Misra-Gries sketch pass (sketches.
    grouped_frequent_sketches, worker memory O(m)) gives every key a
    [count_lower, count_upper] containment bound; the returned keys are
    those whose LOWER bound clears min_share * n_rows — no false
    positives by construction, and no false negatives for keys above
    min_share + m-slack (any key with true share > 1/(m+1) + min_share
    is certainly caught; size m accordingly: m >= ceil(2/min_share)
    makes the slack at most min_share/2).

    Output: (key-named column, count_lower, count_upper, share_lower) —
    collect it (bounded by m rows) to size ``n_salts`` for
    :func:`salted_join` / :func:`salted_aggregate`, or to split the hot
    slice into its own broadcast-side path. The scale win over
    ``df.groupBy(key).count()``: no shuffle of the fact table — the
    only exchange carries <= m counters per partition.
    """
    from .sketches import frequent_items_from_sketch, grouped_frequent_sketches

    if not 0.0 < min_share < 1.0:
        raise ValueError(f"detect_hot_keys: min_share must be in (0, 1), got {min_share}")
    # group_cols=[] already merges the partials to ONE global sketch row
    # (grouped_frequent_sketches ends in merge_frequent_sketches) — a
    # second merge here would be a pure no-op exchange + Python stage
    merged = grouped_frequent_sketches(df, [], key, m=m)
    items = frequent_items_from_sketch(merged)
    return (
        items.filter(
            F.col("count_lower").cast("double")
            > F.lit(float(min_share)) * F.col("n_rows")
        )
        .select(
            F.col("item").alias(key),
            "count_lower",
            "count_upper",
            F.round(F.col("count_lower") / F.col("n_rows"), 6).alias("share_lower"),
        )
    )
