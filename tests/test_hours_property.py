"""Property-based test for the hours parser (SURVEY.md §7: 'overnight-hours
semantics ... must match exactly; property-test it').

Hypothesis generates arbitrary H:M-H:M day strings; a pure-Python mirror of
the reference's arithmetic (Business_ETL.py:107-139) is the ground truth.
Batched: one Spark job evaluates every generated example at once (a
per-example Spark round-trip would be minutes, not seconds).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.functions.hours import day_hours_expr

times = st.tuples(
    st.integers(min_value=0, max_value=23), st.integers(min_value=0, max_value=59)
)


def expected_hours(oh, om, ch, cm):
    open_min = oh * 60 + om
    close_min = ch * 60 + cm
    if close_min < open_min:  # overnight wrap; equality stays (-> 0.0)
        close_min += 1440
    return (close_min - open_min) / 60.0


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(times, times), min_size=1, max_size=40))
def test_day_hours_matches_reference_arithmetic(spark, cases):
    rows = [(i, f"{oh}:{om}-{ch}:{cm}") for i, ((oh, om), (ch, cm)) in enumerate(cases)]
    df = spark.createDataFrame(rows, ["i", "s"]).select(
        "i", day_hours_expr(F.col("s")).alias("h")
    )
    got = {r.i: r.h for r in df.collect()}
    for i, ((oh, om), (ch, cm)) in enumerate(cases):
        assert got[i] == expected_hours(oh, om, ch, cm), (rows[i], got[i])


def test_null_and_missing_day(spark):
    df = spark.createDataFrame([(1, None)], "i int, s string").select(
        day_hours_expr(F.col("s")).alias("h")
    )
    assert df.collect()[0].h == 0.0


def test_sentiment_score_properties(spark):
    """Sentiment scorer invariants: score in [-1,1], label thresholds, null
    and empty text -> 0.0/neutral, punctuation-robust tokenization."""
    from yelp_business_data_pipeline_spark.functions.sentiment import (
        sentiment_label_expr,
        sentiment_score_expr,
    )

    rows = [
        (1, "GREAT!!! Amazing, delicious... LOVE it"),   # case+punct
        (2, "terrible;awful(rude)slow"),                  # glued punctuation
        (3, None),
        (4, ""),
        (5, "the quick brown fox"),                       # no lexicon hits
        (6, "great " * 50),                               # saturation -> <= 1
    ]
    df = spark.createDataFrame(rows, "i int, text string").select(
        "i", sentiment_score_expr(F.col("text")).alias("s")
    ).select("i", "s", sentiment_label_expr(F.col("s")).alias("l"))
    got = {r.i: r for r in df.collect()}
    assert all(-1.0 <= r.s <= 1.0 for r in got.values())
    assert got[1].l == "positive" and got[1].s > 0.05
    assert got[2].l == "negative"  # regexp strips punct -> 4 negative hits
    assert got[3].s == 0.0 and got[3].l == "neutral"
    assert got[4].s == 0.0 and got[4].l == "neutral"
    assert got[5].l == "neutral"
    assert got[6].s > 0.99  # x/sqrt(x^2+15) saturates toward 1
