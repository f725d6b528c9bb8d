"""BI analytics over the unified table — the reference's Athena/QuickSight
layer (reference README.md:259-307) as first-class Spark queries.

The reference exposes UnifiedAnalytics through a Glue catalog and analyzes
"Sentiment trends by city or category", "Reviewer activity and engagement
scores", and "Distribution of elite reviewers across locations" in
QuickSight dashboards. This module ships those metrics as DataFrame
functions over the unified table (register it as a view and the same
queries run via ``spark.sql`` — the Athena surface).

Grain caution (SURVEY.md §7 'explode fan-out'): unified inherits the
(business x category) and (user x friend) explode grains, so business-level
metrics first collapse to one row per (review, dimension) with
dropDuplicates on the relevant keys — otherwise counts multiply by
category/friend counts. Each function documents its dedup choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _review_grain(unified: DataFrame, extra_keys: list[str]) -> DataFrame:
    """Collapse the exploded unified table to one row per (review, keys)."""
    return unified.dropDuplicates(["review_id", *extra_keys])


def sentiment_by_city(unified: DataFrame) -> DataFrame:
    """Avg sentiment + review volume per city ('sentiment trends by city').

    One row per review per city (a review has one business, one city, so
    this is review grain)."""
    base = _review_grain(unified, ["city"])
    return (
        base.filter(F.col("city").isNotNull())
        .groupBy("city")
        .agg(
            F.count(F.lit(1)).alias("n_reviews"),
            F.round(F.avg("sentiment_score"), 4).alias("avg_sentiment"),
            F.sum(F.when(F.col("sentiment_label") == "positive", 1).otherwise(0)).alias(
                "n_positive"
            ),
            F.sum(F.when(F.col("sentiment_label") == "negative", 1).otherwise(0)).alias(
                "n_negative"
            ),
        )
    )


def sentiment_by_category(unified: DataFrame) -> DataFrame:
    """Avg sentiment per business category. A review legitimately counts
    once per category of its business (category grain is the point here)."""
    base = _review_grain(unified, ["category"])
    return (
        base.filter(F.col("category").isNotNull())
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_reviews"),
            F.round(F.avg("sentiment_score"), 4).alias("avg_sentiment"),
        )
    )


def reviewer_engagement(unified: DataFrame) -> DataFrame:
    """Reviewer activity and engagement scores: per user, review volume,
    avg review engagement, profile engagement, account age."""
    base = _review_grain(unified, [])
    return (
        base.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_reviews"),
            F.round(F.avg("engagement_score"), 4).alias("avg_review_engagement"),
            F.first("engagement_compliments").alias("profile_engagement"),
            F.first("account_age_years").alias("account_age_years"),
            F.first("elite_years_count").alias("elite_years_count"),
        )
    )


def elite_distribution_by_location(unified: DataFrame) -> DataFrame:
    """Distribution of elite reviewers across locations: per (state, city),
    distinct elite reviewers (elite_years_count > 0) vs total reviewers."""
    base = _review_grain(unified, ["city"])
    return (
        base.filter(F.col("city").isNotNull())
        .groupBy("state", "city")
        .agg(
            F.countDistinct("user_id").alias("n_reviewers"),
            F.countDistinct(
                F.when(F.col("elite_years_count") > 0, F.col("user_id"))
            ).alias("n_elite_reviewers"),
        )
        .withColumn(
            "elite_share",
            F.round(F.col("n_elite_reviewers") / F.col("n_reviewers"), 4),
        )
    )
