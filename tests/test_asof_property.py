"""As-of join property test: random keyed time series compared against
pandas.merge_asof — an independent third implementation (besides DuckDB's
ASOF JOIN in the oracle suite)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from yelp_business_data_pipeline_spark.operators.asof import asof_join_backward


@pytest.mark.parametrize("seed", [7, 42])
def test_asof_matches_pandas_merge_asof(spark, seed):
    rng = np.random.default_rng(seed)
    n_left, n_right = 300, 200
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_left),
            "t": rng.integers(0, 10_000, n_left),
            "lid": np.arange(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_right),
            "t": rng.integers(0, 10_000, n_right),
            "rid": np.arange(n_right),
            "payload": rng.random(n_right).round(6),
        }
    )
    # dedup right per (k, t) keeping max rid — the operator's tiebreak rule
    right_d = right.sort_values("rid").groupby(["k", "t"], as_index=False).last()

    expected = pd.merge_asof(
        left.sort_values("t"),
        right_d.sort_values("t").rename(columns={"rid": "asof_rid", "payload": "asof_payload"}),
        on="t",
        by="k",
        direction="backward",  # greatest right.t <= left.t
    ).sort_values("lid")

    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = (
        asof_join_backward(ldf, rdf, ["k"], "t", "t", ["rid", "payload"], right_tiebreak="rid")
        .toPandas()
        .sort_values("lid")
    )

    exp_pairs = list(
        zip(expected["lid"], [None if pd.isna(x) else int(x) for x in expected["asof_rid"]])
    )
    got_pairs = list(
        zip(got["lid"], [None if pd.isna(x) else int(x) for x in got["asof_rid"]])
    )
    assert got_pairs == exp_pairs
    exp_payload = [None if pd.isna(x) else x for x in expected["asof_payload"]]
    got_payload = [None if pd.isna(x) else x for x in got["asof_payload"]]
    assert got_payload == pytest.approx(exp_payload)


def test_asof_null_payload_stays_null_and_rows_stay_atomic(spark):
    """Regression: a matched right row with NULL payload must yield NULL (not
    be back-filled from an older right row), and all payload columns must
    come from the SAME matched row (struct carry, not per-column carry)."""
    left = spark.createDataFrame([(1, 10, "l0"), (1, 20, "l1")], "k int, t int, lid string")
    # At t=5: (a=1, b="x").  At t=15: (a=NULL, b="y").
    right = spark.createDataFrame(
        [(1, 5, 1, "x"), (1, 15, None, "y")],
        "k int, t int, a int, b string",
    )
    got = {
        r["lid"]: (r["asof_a"], r["asof_b"])
        for r in asof_join_backward(left, right, ["k"], "t", "t", ["a", "b"]).collect()
    }
    # l0 matches t=5 -> (1, "x").
    assert got["l0"] == (1, "x")
    # l1 matches t=15 -> (NULL, "y"): NULL a must NOT be back-filled with 1,
    # and b must come from the same (t=15) row.
    assert got["l1"] == (None, "y")


@pytest.mark.parametrize("direction", ["forward", "nearest"])
@pytest.mark.parametrize("seed,t_range", [(11, 5000), (23, 400)])
def test_asof_forward_nearest_match_pandas(spark, direction, seed, t_range):
    """t_range=400 forces duplicate (k, t) right rows so the tiebreak rule
    is actually exercised (a wide range can sample zero collisions and
    vacuously pass)."""
    from yelp_business_data_pipeline_spark.operators.asof import (
        asof_join_forward,
        asof_join_nearest,
    )

    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {"k": rng.integers(0, 6, 250), "t": rng.integers(0, t_range, 250), "lid": np.arange(250)}
    )
    right = pd.DataFrame(
        {"k": rng.integers(0, 6, 150), "t": rng.integers(0, t_range, 150), "rid": np.arange(150)}
    )
    if t_range <= 400:
        assert right.duplicated(["k", "t"]).any(), "fixture must contain (k,t) collisions"
    # dedup right per (k, t) keeping max rid — the operator's single
    # tiebreak rule for ALL directions (greatest right_tiebreak wins)
    right_d = right.sort_values("rid").groupby(["k", "t"], as_index=False).last()

    expected = pd.merge_asof(
        left.sort_values("t"),
        right_d.sort_values("t").rename(columns={"rid": "asof_rid"}),
        on="t",
        by="k",
        direction=direction,
    ).sort_values("lid")

    fn = asof_join_forward if direction == "forward" else asof_join_nearest
    got = (
        fn(spark.createDataFrame(left), spark.createDataFrame(right), ["k"], "t", "t", ["rid"], right_tiebreak="rid")
        .toPandas()
        .sort_values("lid")
    )
    exp_pairs = list(zip(expected["lid"], [None if pd.isna(x) else int(x) for x in expected["asof_rid"]]))
    got_pairs = list(zip(got["lid"], [None if pd.isna(x) else int(x) for x in got["asof_rid"]]))
    assert got_pairs == exp_pairs


def test_asof_nearest_preserves_null_and_duplicate_left_rows(spark):
    """Regression (review findings): nearest must emit exactly one row per
    left row — including left rows with NULLs (a null-unsafe re-join
    dropped them) and duplicate left rows (a re-join multiplied them) —
    and a NULL left_ts matches nothing in any direction."""
    from yelp_business_data_pipeline_spark.operators.asof import (
        asof_join_forward,
        asof_join_nearest,
    )

    left = spark.createDataFrame(
        [
            (1, 10, "a", None),   # null payload column
            (1, 10, "a", None),   # exact duplicate row
            (1, None, "b", 5),    # null timestamp
            (2, 7, "c", 1),
        ],
        "k int, t int, tag string, extra int",
    )
    right = spark.createDataFrame([(1, 8, 100), (1, 12, 200), (2, 9, 300)], "k int, t int, rid int")

    for fn in (asof_join_nearest, asof_join_forward):
        out = fn(left, right, ["k"], "t", "t", ["rid"]).collect()
        assert len(out) == 4, f"{fn.__name__} changed left cardinality: {len(out)}"
        by_tag = {}
        for r in out:
            by_tag.setdefault(r.tag, []).append(r.asof_rid)
        # null left_ts -> null match, never a phantom one
        assert by_tag["b"] == [None], by_tag
    # nearest semantics: t=10 is 2 from both 8 and 12 -> backward (8) wins ties
    near = {r.tag: r.asof_rid for r in asof_join_nearest(left, right, ["k"], "t", "t", ["rid"]).collect()}
    assert near["a"] == 100 and near["c"] == 300


def test_duplicate_right_ts_without_tiebreak_is_deterministic(spark):
    """Without right_tiebreak, ties on (key, ts) break on a payload
    content hash — the same row wins regardless of partitioning."""
    from yelp_business_data_pipeline_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame([(1, 10)], "k long, t long")
    rows = [(1, 5, "a"), (1, 5, "b"), (1, 5, "c")]
    picks = set()
    for parts in (1, 3, 7):
        right = spark.createDataFrame(rows, "k long, t long, v string").repartition(parts)
        r = asof_join_backward(left, right, ["k"], "t", "t", ["v"]).collect()[0]
        picks.add(r.asof_v)
    assert len(picks) == 1, picks


def test_output_collision_raises(spark):
    from yelp_business_data_pipeline_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame([(1, 10, "x")], "k long, t long, asof_v string")
    right = spark.createDataFrame([(1, 5, "a")], "k long, t long, v string")
    with pytest.raises(ValueError, match="already exist"):
        asof_join_backward(left, right, ["k"], "t", "t", ["v"])


def test_range_join_guards(spark):
    from pyspark.sql import functions as F

    from yelp_business_data_pipeline_spark.operators.asof import time_bucket_range_join

    left = spark.createDataFrame([(1, 0)], "k long, tl long")
    right = spark.createDataFrame([(1, 200)], "k long, tr long")
    # bucket < max_gap would silently drop pairs -> loud executor assert
    with pytest.raises(Exception, match="bucket"):
        time_bucket_range_join(
            left, right, ["k"], "tl", "tr", max_gap=F.lit(300), bucket=F.lit(60)
        ).collect()
    # shared non-key column names are ambiguous -> loud upfront error
    right2 = spark.createDataFrame([(1, 200)], "k long, tl long")
    with pytest.raises(ValueError, match="share non-key columns"):
        time_bucket_range_join(
            left, right2, ["k"], "tl", "tl", max_gap=F.lit(300), bucket=F.lit(300)
        )
    # the valid configuration still finds the pair
    ok = time_bucket_range_join(
        left, right, ["k"], "tl", "tr", max_gap=F.lit(300), bucket=F.lit(300)
    )
    assert ok.count() == 1
