"""User-domain ETL.

Re-expresses reference ``ETL-script/User_ETL.py``:

- ``engagement_compliments = useful + funny + cool``, drop inputs (ref
  :66-69; rule ``README.md:180``).
- keep only ``compliment_list/writer/note/photos`` of the 11 compliment
  columns (ref :72-74; rule ``README.md:181``) — dynamic prefix-predicate
  drop (SURVEY.md P2).
- ``elite_years_count = size(split(elite, ",")) if elite != "" else 0``
  (ref :77-83).
- ``account_age_years = floor(months_between(as_of, yelping_since) / 12)``
  (ref :86-92). The reference uses ``current_timestamp()`` — nondeterministic,
  so this engine threads an explicit ``as_of`` timestamp instead
  (SURVEY.md §7 "oracle-testability"); pass None to keep reference behavior.
- ``friend_count`` and the (user x friend) explode (ref :97-103). Pinned
  semantics: the reference splits ``""`` into ``[""]`` so ``friend_count`` is
  1 for friendless users and a row with an empty-string friend survives. This
  engine CORRECTS that (documented deviation, SURVEY.md §7 "empty-string vs
  null"): empty/null friends -> ``friend_count = 0`` and the user keeps one
  row with ``friend = NULL`` (left-join-style explode_outer over an empty
  array), preserving user-table grain for friendless users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import USER_COMPLIMENT_KEEP


def user_etl(raw: DataFrame, as_of: str | None = "2026-01-01 00:00:00") -> DataFrame:
    """Raw user DataFrame -> cleaned (user x friend) table."""
    compliment_drop = [
        c for c in raw.columns if c.startswith("compliment_") and c not in USER_COMPLIMENT_KEEP
    ]
    as_of_expr = (
        F.to_timestamp(F.lit(as_of), "yyyy-MM-dd HH:mm:ss")
        if as_of is not None
        else F.current_timestamp()
    )
    friends_arr = F.when(
        F.col("friends").isNull() | (F.trim(F.col("friends")) == ""),
        F.array().cast("array<string>"),
    ).otherwise(F.split(F.col("friends"), ","))
    return (
        raw.withColumn(
            "engagement_compliments", F.col("useful") + F.col("funny") + F.col("cool")
        )
        .drop("useful", "funny", "cool", *compliment_drop)
        .withColumn(
            "elite_years_count",
            F.when(
                F.col("elite").isNull() | (F.col("elite") == ""), F.lit(0)
            ).otherwise(F.size(F.split(F.col("elite"), ","))),
        )
        .drop("elite")
        .withColumn(
            "yelping_since_ts", F.to_timestamp(F.col("yelping_since"), "yyyy-MM-dd HH:mm:ss")
        )
        .withColumn(
            "account_age_years",
            F.floor(F.months_between(as_of_expr, F.col("yelping_since_ts")) / 12).cast("int"),
        )
        # reference keeps the parsed ts and drops the raw string (User_ETL.py:87-91)
        .drop("yelping_since")
        .withColumn("_friends_arr", friends_arr)
        .withColumn("friend_count", F.size(F.col("_friends_arr")))
        .withColumn("friend", F.explode_outer(F.col("_friends_arr")))
        .withColumn("friend", F.trim(F.col("friend")))
        .drop("friends", "_friends_arr")
    )


def user_friend_edges(processed_users: DataFrame) -> DataFrame:
    """(user_id, friend_id) edge list from the processed (user x friend) grain."""
    return (
        processed_users.filter(F.col("friend").isNotNull() & (F.col("friend") != ""))
        .select(F.col("user_id"), F.col("friend").alias("friend_id"))
        .dropDuplicates(["user_id", "friend_id"])
    )
