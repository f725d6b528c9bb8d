from .business import business_etl
from .cleaning import (
    assert_unique_keys,
    drop_missing_keys,
    duplicate_keys,
    null_profile,
    prefix_overlapping_columns,
)
from .review import review_etl
from .topk import top_k_global, top_k_per_group
from .unified import unified_analytics
from .user import user_etl, user_friend_edges

__all__ = [
    "assert_unique_keys",
    "business_etl",
    "drop_missing_keys",
    "duplicate_keys",
    "null_profile",
    "prefix_overlapping_columns",
    "review_etl",
    "top_k_global",
    "top_k_per_group",
    "unified_analytics",
    "user_etl",
    "user_friend_edges",
]
