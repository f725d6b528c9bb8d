"""Review-domain ETL.

Re-expresses reference ``ETL-script/Review_ETL.py`` as one lazy chain:

- drop rows missing ``user_id``/``business_id`` (rule ``README.md:173``;
  asserted ``test_cases/review.py:6-8`` — the reference states the rule but
  never calls filter; this engine enforces it explicitly, SURVEY.md F4).
- ``engagement_score = useful + funny + cool`` then drop inputs (ref :66-70).
- sentiment score + label (ref :73-85) — deterministic lexicon scorer by
  default (codegen'd column expressions, oracle-reproducible); VADER
  pandas_udf available via ``functions.sentiment.vader_sentiment_udf``.
- ``date``: string -> timestamp (``yyyy-MM-dd HH:mm:ss``) -> date, drop
  ``text`` (ref :89-95).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.sentiment import sentiment_label_expr, sentiment_score_expr


def review_etl(raw: DataFrame, score_expr: Column | None = None) -> DataFrame:
    """Raw review DataFrame -> cleaned review fact table.

    ``score_expr`` overrides the sentiment scorer (e.g. a VADER pandas_udf
    column); default is the deterministic lexicon expression.
    """
    score = score_expr if score_expr is not None else sentiment_score_expr(F.col("text"))
    return (
        raw.na.drop(subset=["user_id", "business_id"])
        .withColumn("engagement_score", F.col("useful") + F.col("funny") + F.col("cool"))
        .drop("useful", "funny", "cool")
        .withColumn("sentiment_score", score.cast("float"))  # reference: FloatType (Review_ETL.py:74)
        .withColumn("sentiment_label", sentiment_label_expr(F.col("sentiment_score")))
        .withColumn("date", F.to_date(F.to_timestamp(F.col("date"), "yyyy-MM-dd HH:mm:ss")))
        .drop("text")
    )
