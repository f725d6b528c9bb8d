"""Sentiment scoring.

The reference scores review text with a row-at-a-time Python UDF wrapping
VADER (reference ``ETL-script/Review_ETL.py:73-85``): ``compound`` polarity in
[-1, 1], label thresholds >= 0.05 positive / <= -0.05 negative / else neutral,
nulls scored 0.0.

This engine provides the same interface two ways:

1. **Deterministic lexicon scorer** (default, the bench/oracle path) — pure
   JVM-side column expressions, whole-stage-codegen friendly, reproducible in
   ANSI SQL for the DuckDB oracle. Uses VADER's normalization shape
   ``x / sqrt(x^2 + alpha)`` (alpha=15, per Hutto & Gilbert 2014) with
   ``x = positive-token hits - negative-token hits``.
2. **VADER via Arrow-vectorized pandas_udf** (fidelity mode) — only if
   ``vaderSentiment`` is importable; never on the bench path. A pandas_udf
   beats the reference's row-at-a-time UDF by avoiding per-row serde.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small fixed lexicons — deliberately tiny and frozen so the DuckDB oracle
#: SQL can embed them literally. Deterministic stand-in for VADER's 7.5k-word
#: valence dictionary (SURVEY.md §7 "oracle-testability of nondeterminism").
POSITIVE_WORDS: tuple[str, ...] = (
    "good",
    "great",
    "excellent",
    "amazing",
    "love",
    "loved",
    "best",
    "awesome",
    "fantastic",
    "wonderful",
    "delicious",
    "friendly",
    "perfect",
    "happy",
    "recommend",
)
NEGATIVE_WORDS: tuple[str, ...] = (
    "bad",
    "terrible",
    "awful",
    "worst",
    "hate",
    "hated",
    "horrible",
    "disgusting",
    "rude",
    "slow",
    "dirty",
    "poor",
    "disappointing",
    "overpriced",
    "never",
)

#: VADER's normalization constant.
ALPHA = 15.0

POSITIVE_THRESHOLD = 0.05
NEGATIVE_THRESHOLD = -0.05


def tokens_expr(text: Column) -> Column:
    """Lowercased word tokens: strip non-letters, split on whitespace.

    Empty string / null text yields an empty array.
    """
    cleaned = F.trim(F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), "[^a-z]+", " "))
    return F.when(cleaned == "", F.array().cast("array<string>")).otherwise(
        F.split(cleaned, " ")
    )


def _hits(tokens: Column, lexicon: tuple[str, ...]) -> Column:
    lex = F.array(*[F.lit(w) for w in lexicon])
    return F.size(F.filter(tokens, lambda t: F.array_contains(lex, t)))


def sentiment_score_expr(text: Column) -> Column:
    """Deterministic compound score in [-1, 1]; 0.0 for null/empty text.

    Mirrors the reference's null handling (``Review_ETL.py:74``: null text ->
    0.0) and VADER's ``x / sqrt(x^2 + 15)`` squashing.
    """
    toks = tokens_expr(text)
    x = (_hits(toks, POSITIVE_WORDS) - _hits(toks, NEGATIVE_WORDS)).cast("double")
    return F.round(x / F.sqrt(x * x + F.lit(ALPHA)), 6)


def sentiment_label_expr(score: Column) -> Column:
    """positive / negative / neutral per the reference's +-0.05 thresholds
    (``Review_ETL.py:80-84``)."""
    return (
        F.when(score >= POSITIVE_THRESHOLD, F.lit("positive"))
        .when(score <= NEGATIVE_THRESHOLD, F.lit("negative"))
        .otherwise(F.lit("neutral"))
    )


def sentiment_oracle_sql(text_col: str) -> str:
    """DuckDB SQL computing the identical score for the oracle twin."""
    pos = ", ".join(f"'{w}'" for w in POSITIVE_WORDS)
    neg = ", ".join(f"'{w}'" for w in NEGATIVE_WORDS)
    toks = (
        "CASE WHEN trim(regexp_replace(lower(coalesce({c}, '')), '[^a-z]+', ' ', 'g')) = '' "
        "THEN [] "
        "ELSE string_split(trim(regexp_replace(lower(coalesce({c}, '')), '[^a-z]+', ' ', 'g')), ' ') END"
    ).format(c=text_col)
    x = (
        f"(len(list_filter({toks}, t -> list_contains([{pos}], t))) "
        f"- len(list_filter({toks}, t -> list_contains([{neg}], t))))::DOUBLE"
    )
    return f"round({x} / sqrt({x} * {x} + {ALPHA}), 6)"


def vader_sentiment_udf():
    """Arrow-vectorized VADER scorer, if vaderSentiment is installed.

    Returns a pandas_udf Column function or raises ImportError. Replaces the
    reference's row-at-a-time ``udf(lambda t: ..., FloatType())``
    (``Review_ETL.py:73-74``) with a batched scorer.
    """
    from vaderSentiment.vaderSentiment import SentimentIntensityAnalyzer  # noqa: F401

    import pandas as pd

    @F.pandas_udf("double")
    def _score(texts: pd.Series) -> pd.Series:
        analyzer = SentimentIntensityAnalyzer()
        return texts.map(lambda t: analyzer.polarity_scores(t)["compound"] if t else 0.0)

    return _score
