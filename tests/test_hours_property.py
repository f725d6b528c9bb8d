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
