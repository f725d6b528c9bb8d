from .hours import day_hours_expr, hours_features
from .sentiment import (
    NEGATIVE_WORDS,
    sentiment_oracle_sql,
    POSITIVE_WORDS,
    sentiment_label_expr,
    sentiment_score_expr,
    tokens_expr,
)

__all__ = [
    "NEGATIVE_WORDS",
    "POSITIVE_WORDS",
    "day_hours_expr",
    "hours_features",
    "sentiment_label_expr",
    "sentiment_oracle_sql",
    "sentiment_score_expr",
    "tokens_expr",
]
