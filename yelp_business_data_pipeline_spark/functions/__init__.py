from .hours import day_hours_expr, hours_features
from .sentiment import (
    NEGATIVE_WORDS,
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
    "sentiment_score_expr",
    "tokens_expr",
]
