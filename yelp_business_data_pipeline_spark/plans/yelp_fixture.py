"""Deterministic Yelp-shaped fixture + DuckDB twins for the end-to-end
oracle query (VERDICT r4 item 7).

The signature reference semantics — ``from_json`` attribute flags with
try_cast null-on-invalid, ``u'...'`` regexp unwrap, hours parsing with
the overnight wrap and the close==open -> 0 edge, trim -> split ->
explode -> trim category grain, the engagement sum, the sentiment
lexicon + +-0.05 labels, elite/friends parsing with explode_outer, and
the unified star join's prefix-rename + row-multiplying grain — were
pytest-pinned but reached the driver's DuckDB gate only via TPC-shaped
proxies. This module feeds them through the gate directly: BOTH the
Spark query and the oracle SQL are generated from the same literal rows
below, so the comparison is a genuine two-engine re-derivation of the
reference pipeline (``Business_ETL.py:61-150``, ``Review_ETL.py:60-85``,
``User_ETL.py:70-95``, ``join/unified_data_analytics.py:23-47``).

Fixture design notes:
- every business hour uses :00/:15/:30/:45 minutes, so day-hours are
  exact binary quarters and the decimal-sum aggregates are bit-stable
  across engines;
- no sentiment score lands near the +-0.05 label thresholds, so the
  float32 cast (reference FloatType parity) cannot flip a label;
- rows cover every drop branch (null id / null categories / null hours /
  is_open=0), the overnight + zero-width hour edges, 'None' attribute
  strings, untrimmed ids and categories, users with empty/null
  elite+friends, reviews from unknown users and unknown businesses.
"""

from __future__ import annotations

import json

WEEKDAY_KEYS = (
    "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday",
)

BUSINESS_FIX: list[dict] = [
    {
        "business_id": "  b1  ",
        "name": "Pizza Plaza",
        "state": "IL",
        "stars": 4.5,
        "review_count": 120,
        "is_open": 1,
        "categories": "Restaurants, Pizza,Bars",
        "hours": {"Monday": "9:00-17:30", "Tuesday": "22:00-2:00", "Wednesday": "9:00-9:00"},
        "attributes": {
            "BusinessAcceptsCreditCards": "True",
            "HasTV": "False",
            "NoiseLevel": "u'average'",
            "WiFi": "u'free'",
            "RestaurantsPriceRange2": "2",
        },
    },
    {  # closed -> dropped
        "business_id": "b2", "state": "IL", "stars": 3.0, "is_open": 0,
        "categories": "Cafes", "hours": {"Monday": "8:00-12:00"},
    },
    {  # null categories -> dropped
        "business_id": "b3", "state": "IL", "stars": 3.0, "is_open": 1,
        "categories": None, "hours": {"Monday": "8:00-12:00"},
    },
    {  # null hours -> dropped
        "business_id": "b4", "state": "IL", "stars": 3.0, "is_open": 1,
        "categories": "Cafes", "hours": None,
    },
    {
        "business_id": "b5", "state": "IL", "stars": 3.0, "is_open": 1,
        "categories": "Cafes , Coffee",
        "hours": {"Monday": "0:00-0:00", "Sunday": "10:15-22:45"},
        "attributes": {"BusinessAcceptsCreditCards": "None", "NoiseLevel": "u'quiet'"},
    },
    {
        "business_id": "b6", "state": "CA", "stars": 5.0, "is_open": 1,
        "categories": "Bars",
        "hours": {d: "9:00-17:00" for d in WEEKDAY_KEYS},
        "attributes": {"BusinessAcceptsCreditCards": "False"},
    },
    {  # null id -> dropped
        "business_id": None, "state": "CA", "stars": 1.0, "is_open": 1,
        "categories": "Bars", "hours": {"Monday": "8:00-12:00"},
    },
    {
        "business_id": "b8", "state": "AZ", "stars": 2.5, "is_open": 1,
        "categories": "Pizza,Bars",
        "hours": {"Friday": "23:30-1:15", "Saturday": "8:45-12:00"},
        "attributes": {"BusinessAcceptsCreditCards": "True", "RestaurantsPriceRange2": "abc"},
    },
    {  # attributes entirely null
        "business_id": "b9", "state": "IL", "stars": 4.0, "is_open": 1,
        "categories": "Shopping", "hours": {"Monday": "6:00-18:00"},
    },
    {
        "business_id": "b10", "state": "AZ", "stars": 4.0, "is_open": 1,
        "categories": "Restaurants", "hours": {"Tuesday": "10:00-14:30"},
        "attributes": {"BusinessAcceptsCreditCards": "True"},
    },
]

USER_FIX: list[dict] = [
    {"user_id": "u1", "name": "Ann", "review_count": 10, "yelping_since": "2015-06-15 08:00:00",
     "useful": 3, "funny": 1, "cool": 2, "elite": "2019,2020", "friends": "u2, u3"},
    {"user_id": "u2", "name": "Bo", "review_count": 4, "yelping_since": "2018-01-15 12:00:00",
     "useful": 0, "funny": 0, "cool": 0, "elite": "", "friends": ""},
    {"user_id": "u3", "name": "Cy", "review_count": 7, "yelping_since": "2020-03-15 09:00:00",
     "useful": 1, "funny": 0, "cool": 1, "elite": None, "friends": None},
    {"user_id": "u4", "name": "Di", "review_count": 2, "yelping_since": "2021-07-15 10:00:00",
     "useful": 5, "funny": 2, "cool": 0, "elite": "2021", "friends": "u1"},
    {"user_id": "u5", "name": "Ed", "review_count": 1, "yelping_since": "2022-11-15 11:00:00",
     "useful": 0, "funny": 0, "cool": 0, "elite": "", "friends": "u1,u2"},
]

REVIEW_FIX: list[dict] = [
    {"review_id": "r1", "user_id": "u1", "business_id": "b1", "stars": 5.0,
     "useful": 3, "funny": 1, "cool": 2,
     "text": "great amazing delicious food we love it", "date": "2021-06-01 10:30:00"},
    {"review_id": "r2", "user_id": "u1", "business_id": "b5", "stars": 1.0,
     "useful": 0, "funny": 0, "cool": 0,
     "text": "terrible awful rude service never again", "date": "2021-06-02 11:00:00"},
    {"review_id": "r3", "user_id": "u2", "business_id": "b6", "stars": 4.0,
     "useful": 2, "funny": 0, "cool": 1,
     "text": "good drinks and friendly staff", "date": "2021-07-01 19:00:00"},
    {"review_id": "r4", "user_id": None, "business_id": "b6", "stars": 3.0,
     "useful": 0, "funny": 0, "cool": 0,
     "text": "ok", "date": "2021-07-02 12:00:00"},  # null user -> dropped
    {"review_id": "r5", "user_id": "u3", "business_id": None, "stars": 2.0,
     "useful": 0, "funny": 0, "cool": 0,
     "text": "meh", "date": "2021-07-03 12:00:00"},  # null business -> dropped
    {"review_id": "r6", "user_id": "u3", "business_id": "b8", "stars": 2.5,
     "useful": 1, "funny": 1, "cool": 0,
     "text": "slow service but good pizza", "date": "2021-08-01 20:00:00"},
    {"review_id": "r7", "user_id": "u4", "business_id": "b_missing", "stars": 3.5,
     "useful": 0, "funny": 0, "cool": 0,
     "text": "average place nothing special", "date": "2021-08-02 13:00:00"},
    {"review_id": "r8", "user_id": "u9", "business_id": "b10", "stars": 4.5,
     "useful": 4, "funny": 0, "cool": 1,
     "text": "excellent tacos wonderful salsa", "date": "2021-09-01 18:00:00"},  # unknown user
    {"review_id": "r9", "user_id": "u4", "business_id": "b1", "stars": 2.0,
     "useful": 1, "funny": 0, "cool": 0,
     "text": "bad experience cold food", "date": "2021-09-02 18:30:00"},
    {"review_id": "r10", "user_id": "u2", "business_id": "b9", "stars": 4.0,
     "useful": 0, "funny": 1, "cool": 0,
     "text": "nice selection helpful staff", "date": "2021-10-01 15:00:00"},
]


def fixture_json_lines() -> tuple[list[str], list[str], list[str]]:
    """(business, review, user) JSON lines — the Spark side parses these
    with the raw schemas via from_json, exactly like the file readers."""
    return (
        [json.dumps(r) for r in BUSINESS_FIX],
        [json.dumps(r) for r in REVIEW_FIX],
        [json.dumps(r) for r in USER_FIX],
    )


# ---------------------------------------------------------------------------
# DuckDB rendering
# ---------------------------------------------------------------------------


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def business_values_sql() -> str:
    """VALUES list: (business_id, state, stars, is_open, categories,
    hours_is_null, h_monday..h_sunday, attr_credit)."""
    rows = []
    for b in BUSINESS_FIX:
        hours = b.get("hours")
        days = [None if hours is None else hours.get(d) for d in WEEKDAY_KEYS]
        attrs = b.get("attributes") or {}
        rows.append(
            "(" + ", ".join(
                [
                    _lit(b.get("business_id")), _lit(b.get("state")),
                    _lit(b.get("stars")), _lit(b.get("is_open")),
                    _lit(b.get("categories")),
                    "TRUE" if hours is None else "FALSE",
                ]
                + [_lit(d) for d in days]
                + [_lit(attrs.get("BusinessAcceptsCreditCards"))]
            ) + ")"
        )
    cols = ("business_id, state, stars, is_open, categories, hours_is_null, "
            + ", ".join(f"h_{d.lower()}" for d in WEEKDAY_KEYS) + ", attr_credit")
    return f"(VALUES {', '.join(rows)}) AS b({cols})"


def review_values_sql() -> str:
    rows = [
        "(" + ", ".join(
            _lit(r.get(k)) for k in
            ("review_id", "user_id", "business_id", "stars", "useful", "funny", "cool", "text")
        ) + ")"
        for r in REVIEW_FIX
    ]
    return ("(VALUES " + ", ".join(rows)
            + ") AS r(review_id, user_id, business_id, stars, useful, funny, cool, text)")


def user_values_sql() -> str:
    rows = [
        "(" + ", ".join(_lit(u.get(k)) for k in ("user_id", "elite", "friends")) + ")"
        for u in USER_FIX
    ]
    return "(VALUES " + ", ".join(rows) + ") AS u(user_id, elite, friends)"


def day_hours_sql(col: str) -> str:
    """DuckDB twin of functions.hours.day_hours_expr: H:M-H:M -> open
    hours with the overnight wrap; NULL day -> 0.0."""
    o = (f"(CAST(string_split(string_split({col}, '-')[1], ':')[1] AS INT) * 60 "
         f"+ CAST(string_split(string_split({col}, '-')[1], ':')[2] AS INT))")
    c = (f"(CAST(string_split(string_split({col}, '-')[2], ':')[1] AS INT) * 60 "
         f"+ CAST(string_split(string_split({col}, '-')[2], ':')[2] AS INT))")
    return (f"COALESCE(CAST((CASE WHEN {c} < {o} THEN {c} + 1440 ELSE {c} END - {o}) "
            f"AS DOUBLE) / 60.0, 0.0)")


def yelp_oracle_sql() -> str:
    """The DuckDB twin of plans.extensions.yelp_unified_panel — a full
    independent re-derivation of the reference pipeline over the same
    literal rows."""
    from ..functions.sentiment import sentiment_oracle_sql

    dh = [day_hours_sql(f"h_{d.lower()}") for d in WEEKDAY_KEYS]
    weekly = f"(((((({dh[0]} + {dh[1]}) + {dh[2]}) + {dh[3]}) + {dh[4]}) + {dh[5]}) + {dh[6]})"
    days_open = " + ".join(f"(CASE WHEN {d} > 0 THEN 1 ELSE 0 END)" for d in dh)
    return f"""
    WITH pb AS (
      SELECT trim(business_id) AS business_id, state, stars, categories,
             attr_credit, {weekly} AS weekly, {days_open} AS days_open
      FROM {business_values_sql()}
      WHERE business_id IS NOT NULL AND categories IS NOT NULL
        AND NOT hours_is_null AND is_open = 1
    ), pbx AS (
      SELECT business_id, state, stars, weekly, days_open,
             TRY_CAST(attr_credit AS BOOLEAN) AS credit,
             trim(unnest(regexp_split_to_array(trim(categories), ',\\s*'))) AS category
      FROM pb
    ), pr AS (
      SELECT user_id, business_id,
             useful + funny + cool AS engagement_score,
             {sentiment_oracle_sql('text')} AS score
      FROM {review_values_sql()}
      WHERE user_id IS NOT NULL AND business_id IS NOT NULL
    ), pu AS (
      SELECT user_id,
             CASE WHEN elite IS NULL OR elite = '' THEN 0
                  ELSE len(string_split(elite, ',')) END AS elite_years_count,
             unnest(CASE WHEN friends IS NULL OR trim(friends) = ''
                         THEN CAST([NULL] AS VARCHAR[])
                         ELSE string_split(friends, ',') END) AS friend
      FROM {user_values_sql()}
    ), uni AS (
      SELECT pr.engagement_score, pr.score, pu.elite_years_count,
             px.state, px.stars
      FROM pr
      LEFT JOIN pu ON pr.user_id = pu.user_id
      LEFT JOIN pbx px ON pr.business_id = px.business_id
    )
    SELECT 'business' AS op, state, category, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(weekly AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS hours_sum,
           CAST(SUM(days_open) AS BIGINT) AS days_open_sum,
           CAST(SUM(CASE WHEN credit THEN 1 ELSE 0 END) AS BIGINT) AS n_credit,
           CAST(NULL AS BIGINT) AS engagement_sum,
           CAST(NULL AS BIGINT) AS n_positive,
           CAST(NULL AS BIGINT) AS n_elite,
           CAST(NULL AS DOUBLE) AS bstars_sum
    FROM pbx GROUP BY 1, 2, 3
    UNION ALL
    SELECT 'unified' AS op, state, CAST(NULL AS VARCHAR) AS category,
           COUNT(*) AS n,
           CAST(NULL AS DOUBLE) AS hours_sum,
           CAST(NULL AS BIGINT) AS days_open_sum,
           CAST(NULL AS BIGINT) AS n_credit,
           CAST(SUM(engagement_score) AS BIGINT) AS engagement_sum,
           CAST(SUM(CASE WHEN score >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive,
           CAST(SUM(CASE WHEN elite_years_count > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_elite,
           CAST(CAST(SUM(CAST(stars AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS bstars_sum
    FROM uni GROUP BY 1, 2
    """
