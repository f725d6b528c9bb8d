"""Snapshot diff (operators/diff.py): classification semantics incl.
null-safe keys and values, payload modes, and the one-join plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.diff import table_diff

SCHEMA = "k long, v string, w double"

OLD = [
    (1, "a", 1.0),   # unchanged
    (2, "b", 2.0),   # changed: v
    (3, "c", 3.0),   # removed
    (4, None, 4.0),  # changed: v NULL -> 'x' (null-safe value compare)
    (5, "e", None),  # unchanged (NULL == NULL null-safely)
    (None, "nk", 9.0),  # NULL key, changed: w
]
NEW = [
    (1, "a", 1.0),
    (2, "B", 2.0),
    (4, "x", 4.0),
    (5, "e", None),
    (6, "f", 6.0),   # added
    (None, "nk", 9.5),
]


def _diff_map(df):
    return {r.k: (r.change_type, r.changed_cols) for r in df.collect()}


def test_classification(spark):
    old, new = spark.createDataFrame(OLD, SCHEMA), spark.createDataFrame(NEW, SCHEMA)
    got = _diff_map(table_diff(old, new, ["k"]))
    assert got == {
        2: ("changed", "v"),
        3: ("removed", ""),
        4: ("changed", "v"),
        6: ("added", ""),
        None: ("changed", "w"),
    }


def test_keep_unchanged_and_multi_col_change(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    new = spark.createDataFrame([(1, "b", 2.0)], SCHEMA)
    got = _diff_map(table_diff(old, new, ["k"], keep_unchanged=True))
    assert got == {1: ("changed", "v,w")}
    both_same = table_diff(old, old, ["k"], keep_unchanged=True)
    assert _diff_map(both_same) == {1: ("unchanged", "")}
    assert table_diff(old, old, ["k"]).count() == 0


def test_include_values_payload(spark):
    old = spark.createDataFrame([(1, "a", 1.0), (2, "z", 0.0)], SCHEMA)
    new = spark.createDataFrame([(1, "b", 1.0)], SCHEMA)
    rows = {
        r.k: r
        for r in table_diff(old, new, ["k"], include_values=True).collect()
    }
    assert rows[1].old_v == "a" and rows[1].new_v == "b"
    assert rows[2].change_type == "removed" and rows[2].new_v is None
    assert set(rows[1].asDict()) == {
        "k", "change_type", "changed_cols", "old_v", "new_v", "old_w", "new_w"
    }


def test_compound_keys_and_default_compare_cols(spark):
    old = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")], "k1 long, k2 long, v string")
    new = spark.createDataFrame([(1, 1, "a"), (1, 2, "c"), (2, 1, "d")],
                                "k1 long, k2 long, v string")
    got = {(r.k1, r.k2): r.change_type for r in table_diff(old, new, ["k1", "k2"]).collect()}
    assert got == {(1, 2): "changed", (2, 1): "added"}


def test_empty_keys_raises(spark):
    df = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="keys must be non-empty"):
        table_diff(df, df, [])


def test_plan_is_one_full_outer_join(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    old = o.filter(F.col("o_orderkey") % 7 != 0)
    new = o.filter(F.col("o_orderkey") % 5 != 0)
    plan = (
        table_diff(old, new, ["o_orderkey"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("SortMergeJoin") == 1 and "FullOuter" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # comparisons are JVM expressions: no Python stage anywhere.
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


from hypothesis import given, settings, strategies as st

_keys = st.integers(min_value=0, max_value=15)
_vals = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
_snap = st.dictionaries(_keys, st.tuples(_vals, _vals), max_size=12)


def _model_diff(old, new):
    out = {}
    for k in set(old) | set(new):
        if k not in old:
            out[k] = ("added", "")
        elif k not in new:
            out[k] = ("removed", "")
        else:
            changed = [
                c for c, (a, b) in zip(("v", "w"), zip(old[k], new[k])) if a != b
            ]
            if changed:
                out[k] = ("changed", ",".join(changed))
    return out


@settings(max_examples=25, deadline=None)
@given(_snap, _snap)
def test_random_snapshots_match_python_model(spark, old, new):
    schema = "k long, v string, w string"
    old_df = spark.createDataFrame(
        [(k, v, w) for k, (v, w) in old.items()] or [], schema
    )
    new_df = spark.createDataFrame(
        [(k, v, w) for k, (v, w) in new.items()] or [], schema
    )
    got = _diff_map(table_diff(old_df, new_df, ["k"]))
    assert got == _model_diff(old, new)


def test_bucketed_snapshots_diff_without_shuffle(spark, sf_dir):
    """The SCALE.md claim: table_diff on two snapshots bucketed on the
    diff key plans with NO Exchange — the full-outer join co-locates."""
    import shutil
    from pathlib import Path

    from yelp_business_data_pipeline_spark.sources.catalog import save_bucketed

    def _clean():
        for t in ("tb_snap_old", "tb_snap_new"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            loc = Path("spark-warehouse") / t
            if loc.exists():
                shutil.rmtree(loc)

    _clean()
    try:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        )
        save_bucketed(o.filter(F.col("o_orderkey") % 7 != 0), "tb_snap_old",
                      ["o_orderkey"], n_buckets=4)
        save_bucketed(o.filter(F.col("o_orderkey") % 5 != 0), "tb_snap_new",
                      ["o_orderkey"], n_buckets=4)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            d = table_diff(
                spark.table("tb_snap_old"), spark.table("tb_snap_new"),
                ["o_orderkey"], null_safe_keys=False,
            )
            p = d._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin FullOuter" in p or (
                "SortMergeJoin" in p and "FullOuter" in p
            ), p
            assert "Exchange hashpartitioning" not in p, (
                f"bucketed snapshot diff still shuffles:\n{p}"
            )
            # and it still produces the right answer
            assert d.filter(F.col("change_type") == "added").count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        _clean()
