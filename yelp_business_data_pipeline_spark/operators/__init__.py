from .analytics import (
    elite_distribution_by_location,
    reviewer_engagement,
    sentiment_by_category,
    sentiment_by_city,
)
from .asof import asof_join_backward, time_bucket_range_join
from .business import business_etl, flatten_attribute_structs, flatten_attributes
from .cleaning import (
    assert_unique_keys,
    drop_missing_keys,
    duplicate_keys,
    null_profile,
    prefix_overlapping_columns,
)
from .dedup import (
    bucket_pairs,
    deletion_neighborhood_candidates,
    exact_dedup,
    minhash_lsh_candidates,
    simhash,
    token_jaccard_pairs,
    with_simhash,
)
from .basket import item_cooccurrence
from .bfs import bfs_distances
from .diff import table_diff
from .funnel import funnel_conversion, retention_matrix
from .graph import (
    build_edges,
    build_vertices,
    k_core,
    link_prediction_features,
    match_motif,
    triangle_count,
)
from .multimodal import extract_media_features, media_meta_expr
from .review import review_etl
from .pq import pq_adc_topk, pq_ann_topk, pq_encode, train_pq_codebooks
from .sampling import (
    hash_sample,
    hash_unit,
    leakage_safe_splits,
    select_to_token_budget,
    stratified_sample,
    weighted_sample,
)
from .similarity import (
    arrow_cosine_topk,
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_ann_topk,
)
from .sketches import (
    frequent_items_from_sketch,
    grouped_distinct_sketches,
    grouped_frequent_sketches,
    grouped_kmv_sketches,
    grouped_quantile_sketches,
    kmv_distinct_estimate,
    kmv_set_estimates,
    merge_kmv_sketches,
    merge_distinct_estimate,
    merge_frequent_sketches,
    merge_quantile_sketches,
    quantile_from_sketch,
    verified_heavy_hitters,
)
from .skew import detect_hot_keys, salted_aggregate, salted_join
from .pagerank import pagerank
from .timeseries import (
    GRAIN_STEPS,
    continuous_aggregate_update,
    continuous_aggregate_update_exactly_once,
    ewma_by_key,
    gapfill_locf,
    incremental_distinct_rollup,
    read_continuous_aggregate,
    time_bucket,
)
from .text import (
    distinct_token_ratio,
    fingerprint,
    lang_id,
    stopword_ratio,
    token_count,
    winnowing_fingerprints_long,
)
from .topk import top_k_global, top_k_per_group
from .unified import unified_analytics
from .user import user_etl, user_friend_edges

__all__ = [
    "read_continuous_aggregate",
    "incremental_distinct_rollup",
    "continuous_aggregate_update_exactly_once",
    "train_pq_codebooks",
    "stratified_sample",
    "select_to_token_budget",
    "pq_encode",
    "pq_ann_topk",
    "pq_adc_topk",
    "pagerank",
    "leakage_safe_splits",
    "hash_unit",
    "hash_sample",
    "deletion_neighborhood_candidates",
    "continuous_aggregate_update",
    "bucket_pairs",
    "arrow_cosine_topk",
    "asof_join_backward",
    "assert_unique_keys",
    "build_edges",
    "build_vertices",
    "business_etl",
    "cosine_topk",
    "distinct_token_ratio",
    "drop_missing_keys",
    "duplicate_keys",
    "elite_distribution_by_location",
    "embedding_near_dup_pairs",
    "ewma_by_key",
    "exact_dedup",
    "extract_media_features",
    "fingerprint",
    "flatten_attribute_structs",
    "flatten_attributes",
    "funnel_conversion",
    "bfs_distances",
    "item_cooccurrence",
    "table_diff",
    "weighted_sample",
    "retention_matrix",
    "gapfill_locf",
    "frequent_items_from_sketch",
    "grouped_distinct_sketches",
    "grouped_frequent_sketches",
    "grouped_kmv_sketches",
    "kmv_distinct_estimate",
    "kmv_set_estimates",
    "merge_kmv_sketches",
    "grouped_quantile_sketches",
    "detect_hot_keys",
    "merge_distinct_estimate",
    "merge_frequent_sketches",
    "merge_quantile_sketches",
    "quantile_from_sketch",
    "verified_heavy_hitters",
    "GRAIN_STEPS",
    "k_core",
    "lang_id",
    "link_prediction_features",
    "lsh_ann_topk",
    "match_motif",
    "triangle_count",
    "media_meta_expr",
    "minhash_lsh_candidates",
    "null_profile",
    "prefix_overlapping_columns",
    "review_etl",
    "reviewer_engagement",
    "salted_aggregate",
    "salted_join",
    "sentiment_by_category",
    "sentiment_by_city",
    "simhash",
    "stopword_ratio",
    "time_bucket",
    "time_bucket_range_join",
    "token_count",
    "token_jaccard_pairs",
    "top_k_global",
    "top_k_per_group",
    "unified_analytics",
    "user_etl",
    "user_friend_edges",
    "winnowing_fingerprints_long",
    "with_simhash",
]
