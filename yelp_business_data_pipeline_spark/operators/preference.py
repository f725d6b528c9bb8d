"""Preference-pair construction (RLHF / DPO data prep).

The tail of a training-data pipeline is not always next-token text: the
alignment stages (RLHF reward modeling, DPO) consume *(group, chosen,
rejected)* triples built by pairing the highest- and lowest-reward
candidate within a group (the prompt, in production; any grouping key
here). This module builds those pairs relationally:

- one groupBy over the corpus with TWO struct extrema (``max(struct(
  score, id))`` / ``min(struct(score, id))``) — single shuffle, no
  self-join and no window. Struct buffers are not hash-aggregable, so
  Catalyst plans this as SortAggregate (a per-partition sort on the
  GROUPING key, not a per-group global sort); the partial aggregate
  still combines map-side, so the exchange carries one row per
  (partition, group) — the plan shape is pinned in tests;
- deterministic tie-breaking by id via lexicographic struct ordering
  (equal scores resolve to the larger id for ``chosen``, the smaller for
  ``rejected``) — reproducible across runs, cluster sizes, and engines;
- the margin filter applies to the ROUNDED margin (round-before-threshold
  rule, 9 decimals) so engine-portable consumers see the same kept set.

Groups with a single candidate (chosen == rejected) or a margin under
the bar emit no pair — a reward model learns nothing from them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def preference_pairs(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    score_col: str,
    min_margin: float = 0.0,
) -> DataFrame:
    """Per group: the (chosen, rejected) = (arg-max, arg-min) of
    ``(score, id)`` plus the candidate count, keeping only pairs with
    distinct members and ``round(chosen_score - rejected_score, 9) >=
    min_margin``.

    NULL scores carry no reward signal and are excluded before the
    aggregate (a NULL inside a struct extremum would otherwise win/lose
    by Spark's NULLS-LAST struct ordering — silently wrong); NULL group
    keys form their own group like any groupBy.
    """
    if not group_cols:
        raise ValueError("preference_pairs: group_cols must be non-empty")
    reserved = {"chosen_id", "rejected_id", "chosen_score", "rejected_score", "margin", "n_candidates"}
    clash = reserved & set(group_cols)
    if clash:
        raise ValueError(f"preference_pairs: group_cols collide with output columns: {sorted(clash)}")

    cand = F.struct(F.col(score_col).alias("s"), F.col(id_col).alias("i"))
    grouped = (
        df.filter(F.col(score_col).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.max(cand).alias("_best"),
            F.min(cand).alias("_worst"),
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        )
    )
    margin = F.round(F.col("_best.s") - F.col("_worst.s"), 9)
    return (
        grouped.select(
            *group_cols,
            F.col("_best.i").alias("chosen_id"),
            F.col("_worst.i").alias("rejected_id"),
            F.col("_best.s").alias("chosen_score"),
            F.col("_worst.s").alias("rejected_score"),
            margin.alias("margin"),
            "n_candidates",
        )
        .filter(
            (F.col("chosen_id") != F.col("rejected_id"))
            & (F.col("margin") >= F.lit(float(min_margin)))
        )
    )
