"""funnel_conversion / retention_matrix: hand-built edge pins plus a full
python-model cross-check on the real sf0.001 events table (the same
independent-implementation strategy as test_timeseries's gapfill model)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.funnel import (
    funnel_conversion,
    retention_matrix,
)

TS = dt.datetime


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def test_funnel_enforces_order(spark):
    # u1 does A then B (converts); u2 does B then A (B precedes A -> no B)
    df = _ev(
        spark,
        [
            (1, "A", TS(2024, 1, 1, 0, 0)),
            (1, "B", TS(2024, 1, 1, 1, 0)),
            (2, "B", TS(2024, 1, 2, 0, 0)),
            (2, "A", TS(2024, 1, 2, 1, 0)),
        ],
    )
    out = {r.step_name: r for r in funnel_conversion(df, ["A", "B"]).collect()}
    assert out["A"].n_users == 2
    assert out["B"].n_users == 1
    assert out["B"].pct_of_first == 0.5


def test_funnel_simultaneous_does_not_advance(spark):
    df = _ev(
        spark,
        [
            (1, "A", TS(2024, 1, 1)),
            (1, "B", TS(2024, 1, 1)),  # same instant: strictly-after fails
            (2, "A", TS(2024, 1, 1)),
            (2, "B", TS(2024, 1, 1, 0, 0, 1)),
        ],
    )
    out = {r.step_name: r for r in funnel_conversion(df, ["A", "B"]).collect()}
    assert out["B"].n_users == 1


def test_funnel_within_horizon(spark):
    df = _ev(
        spark,
        [
            (1, "A", TS(2024, 1, 1)),
            (1, "B", TS(2024, 1, 3)),  # inside 7 days
            (2, "A", TS(2024, 1, 1)),
            (2, "B", TS(2024, 1, 20)),  # outside
        ],
    )
    out = {r.step_name: r for r in funnel_conversion(df, ["A", "B"], within="7 days").collect()}
    assert out["A"].n_users == 2 and out["B"].n_users == 1
    # without the horizon both convert
    out2 = {r.step_name: r for r in funnel_conversion(df, ["A", "B"]).collect()}
    assert out2["B"].n_users == 2


def test_funnel_null_user_and_empty_first_step(spark):
    df = _ev(spark, [(None, "A", TS(2024, 1, 1)), (3, "B", TS(2024, 1, 1))])
    out = {r.step_name: r for r in funnel_conversion(df, ["A", "B"]).collect()}
    assert out["A"].n_users == 0
    assert out["A"].pct_of_first is None  # 0/0 -> NULL, not an error
    assert out["B"].n_users == 0


def test_funnel_repeated_step_name(spark):
    # A -> B -> A requires a SECOND A strictly after B
    df = _ev(
        spark,
        [
            (1, "A", TS(2024, 1, 1)),
            (1, "B", TS(2024, 1, 2)),
            (1, "A", TS(2024, 1, 3)),
            (2, "A", TS(2024, 1, 1)),
            (2, "B", TS(2024, 1, 2)),
        ],
    )
    out = funnel_conversion(df, ["A", "B", "A"]).collect()
    by_step = {r.step: r for r in out}
    assert by_step[3].n_users == 1


def test_funnel_rejects_empty_steps(spark):
    with pytest.raises(ValueError):
        funnel_conversion(_ev(spark, []), [])


def _python_funnel(rows, steps, within_days=None):
    """Independent model: per-user chained strictly-after mins."""
    by_user: dict[int, list[tuple[dt.datetime, str]]] = {}
    for u, typ, ts in rows:
        if u is None:
            continue
        by_user.setdefault(u, []).append((ts, typ))
    counts = [0] * len(steps)
    for evs in by_user.values():
        evs.sort()
        t_prev = None
        t0 = None
        for i, step in enumerate(steps):
            cand = [
                t
                for t, typ in evs
                if typ == step
                and (i == 0 or (t_prev is not None and t > t_prev))
                and (
                    i == 0
                    or within_days is None
                    or (t0 is not None and t <= t0 + dt.timedelta(days=within_days))
                )
            ]
            t_cur = min(cand) if cand else None
            if i == 0:
                t0 = t_cur
            if t_cur is not None:
                counts[i] += 1
            t_prev = t_cur
            if t_prev is None:
                break
    return counts


@pytest.mark.parametrize("within_days", [None, 7])
def test_funnel_matches_python_model_on_events(spark, sf_dir, within_days):
    steps = ["signup", "view", "purchase"]
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    from yelp_business_data_pipeline_spark.plans.registry import normalize_event_ts

    events = normalize_event_ts(events)
    got = {
        r.step: r.n_users
        for r in funnel_conversion(
            events, steps, within=f"{within_days} days" if within_days else None
        ).collect()
    }
    rows = duckdb.sql(
        f"SELECT user_id, event_type, ts FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    want = _python_funnel(rows, steps, within_days)
    assert [got[i + 1] for i in range(len(steps))] == want


def test_retention_diagonal_and_python_model(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    from yelp_business_data_pipeline_spark.plans.registry import normalize_event_ts

    events = normalize_event_ts(events)
    got = retention_matrix(events).collect()
    # offset-0 diagonal: every cohort member is active in their first week
    for r in got:
        if r.week_offset == 0:
            assert r.n_active == r.cohort_size, r
        assert 0 < r.retention_pct <= 1

    # independent python model
    rows = duckdb.sql(
        f"SELECT user_id, ts FROM read_parquet('{sf_dir}/events.parquet') "
        "WHERE user_id IS NOT NULL"
    ).fetchall()

    def monday(ts):
        d = ts.date()
        return d - dt.timedelta(days=d.weekday())

    first: dict[int, dt.date] = {}
    for u, ts in rows:
        w = monday(ts)
        if u not in first or w < first[u]:
            first[u] = w
    active = set()
    for u, ts in rows:
        off = (monday(ts) - first[u]).days // 7
        active.add((first[u], off, u))
    from collections import Counter

    want = Counter((c, o) for c, o, _ in active)
    sizes = Counter(first.values())
    got_map = {(r.cohort_week, r.week_offset): (r.n_active, r.cohort_size) for r in got}
    assert got_map == {
        (c, o): (n, sizes[c]) for (c, o), n in want.items()
    }


def test_retention_max_offset_trim(spark):
    df = _ev(
        spark,
        [
            (1, "A", TS(2024, 1, 1)),
            (1, "A", TS(2024, 3, 1)),  # offset ~8 weeks
        ],
    ).select("user_id", "ts")
    out = retention_matrix(df, max_offset=4).collect()
    assert all(r.week_offset <= 4 for r in out)
    assert {r.week_offset for r in out} == {0}
