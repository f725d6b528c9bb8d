"""Preference-pair construction (operators/preference.py) — python-model
exact semantics, determinism, guards, plan shape, and the exact DuckDB twin
for the registered panel (rotation-queue pin)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.preference import preference_pairs


def _model(rows, min_margin):
    """From-scratch python recompute: rows = (grp, id, score)."""
    groups: dict = {}
    for g, i, s in rows:
        if s is None:
            continue
        groups.setdefault(g, []).append((s, i))
    out = []
    for g, cand in groups.items():
        best = max(cand)
        worst = min(cand)
        margin = round(best[0] - worst[0], 9)
        if best[1] != worst[1] and margin >= min_margin:
            out.append((g, best[1], worst[1], best[0], worst[0], margin, len(cand)))
    return sorted(out)


ROWS = [
    # ordinary group: clear margin
    ("a", 1, 0.2), ("a", 2, 0.9), ("a", 3, 0.5),
    # tie on the top score -> larger id wins chosen; tie on bottom -> smaller id
    ("b", 10, 0.8), ("b", 11, 0.8), ("b", 12, 0.1), ("b", 13, 0.1),
    # singleton group: no pair
    ("c", 20, 0.7),
    # margin under the bar at min_margin=0.05
    ("d", 30, 0.50), ("d", 31, 0.52),
    # NULL score excluded BEFORE the extrema (would otherwise win by
    # NULLS-LAST struct order)
    ("e", 40, 0.3), ("e", 41, None), ("e", 42, 0.6),
]


def test_preference_pairs_matches_python_model(spark):
    df = spark.createDataFrame(ROWS, "grp string, id bigint, score double")
    got = sorted(
        tuple(r)
        for r in preference_pairs(df, ["grp"], "id", "score", min_margin=0.05).collect()
    )
    assert got == _model(ROWS, 0.05)
    # the tie group resolved deterministically: chosen=11 (larger id at the
    # tied top), rejected=12 (smaller id at the tied bottom)
    by_grp = {t[0]: t for t in got}
    assert by_grp["b"][1] == 11 and by_grp["b"][2] == 12
    assert "c" not in by_grp and "d" not in by_grp
    # NULL-score row neither chosen nor counted
    assert by_grp["e"][1] == 42 and by_grp["e"][6] == 2


def test_preference_pairs_layout_invariance(spark):
    df = spark.createDataFrame(ROWS, "grp string, id bigint, score double")
    a = sorted(tuple(r) for r in preference_pairs(df, ["grp"], "id", "score").collect())
    b = sorted(
        tuple(r)
        for r in preference_pairs(df.repartition(13), ["grp"], "id", "score").collect()
    )
    assert a == b


def test_preference_pairs_guards(spark):
    df = spark.createDataFrame(ROWS, "grp string, id bigint, score double")
    with pytest.raises(ValueError, match="group_cols must be non-empty"):
        preference_pairs(df, [], "id", "score")
    with pytest.raises(ValueError, match="collide"):
        preference_pairs(
            df.withColumnRenamed("grp", "margin"), ["margin"], "id", "score"
        )


def test_preference_pairs_single_exchange_plan(spark):
    """The 100-TB claim: ONE exchange with map-side partial aggregation —
    no self-join, no window. Struct extrema are not hash-aggregable so
    the aggregate is a SortAggregate (sorted on the grouping key only);
    the partial_max/partial_min combine BEFORE the exchange, so the
    shuffle carries one row per (partition, group)."""
    df = spark.createDataFrame(ROWS, "grp string, id bigint, score double")
    plan = preference_pairs(df, ["grp"], "id", "score")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_max" in plan and plan.index("partial_max") > plan.index("Exchange")
    assert "Window" not in plan and "Join" not in plan


def test_preference_pairs_panel_matches_duckdb_twin(spark, sf_dir):
    """Rotation-queue twin pin: the registered panel must equal
    PREFERENCE_PAIRS_ORACLE row-for-row — reward, struct-extrema tie
    order, and the rounded margin bar all re-derived in DuckDB."""
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import PREFERENCE_PAIRS_ORACLE

    from .oracle_harness import duck_con

    srows = sorted(
        tuple(r) for r in QUERIES["preference_pairs_panel"].spark(spark, sf_dir).collect()
    )
    drows = sorted(duck_con(sf_dir).execute(PREFERENCE_PAIRS_ORACLE).fetchall())
    assert srows == drows and len(srows) >= 50
    # live filter: some (lang, source) groups fell under the margin bar
    import duckdb  # noqa: F401  (duck_con already imported it)

    n_groups = duck_con(sf_dir).execute(
        "SELECT count(*) FROM (SELECT lang, source FROM documents "
        "WHERE text IS NOT NULL GROUP BY 1, 2)"
    ).fetchone()[0]
    assert len(srows) < n_groups


def test_preference_pairs_panel_gated():
    """Promoted into the 50-slot gate by the ninth r11 swap (demoting the
    3-round-stable degree_panel)."""
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import PREFERENCE_PAIRS_ORACLE

    names = list(QUERIES)
    assert names.index("preference_pairs_panel") < 50
    assert QUERIES["preference_pairs_panel"].oracle == PREFERENCE_PAIRS_ORACLE
