from dipper_spark.operators.filters import (
    dispatch,
    limit_scan,
    qualifier_filter,
    score_threshold,
    taxon_filter,
    test_id_subset,
)
from dipper_spark.operators.joins import (
    anti_join,
    asof_join,
    broadcast_lookup,
    canonical_pair,
    composite_key,
    join_with_miss_metrics,
    one_to_one_mappings,
    pairwise_within_group,
    range_join,
    semi_join,
)
from dipper_spark.operators.aggregates import (
    group_percentiles,
    group_zscore,
    interval_rollup,
)
from dipper_spark.operators.governance import (
    generalize_numeric,
    k_anonymity_annotate,
    pseudonym,
)
from dipper_spark.operators.sampling import (
    epoch_shuffle,
    source_quota,
    stratified_sample,
    temperature_resample,
    weighted_sample,
)
from dipper_spark.operators.search import (
    bigram_logprob,
    bm25_topk,
    hashed_linear_score,
    tfidf_keywords,
    unigram_logprob,
)
from dipper_spark.operators.bpe import bpe_segment_counts, bpe_train
from dipper_spark.operators.graph import pagerank, triangles
from dipper_spark.operators.sketches import (
    count_min_build,
    count_min_estimate,
    linear_counting,
)
from dipper_spark.operators.skew import (
    detect_hot_keys,
    salted_aggregate,
    salted_count_distinct,
    skew_join,
)
from dipper_spark.operators.windows import topk_per_group
from dipper_spark.operators.setops import except_diff, intersect_all, union_dedup

__all__ = [
    "asof_join",
    "bigram_logprob",
    "bpe_segment_counts",
    "bpe_train",
    "epoch_shuffle",
    "hashed_linear_score",
    "triangles",
    "count_min_build",
    "count_min_estimate",
    "linear_counting",
    "pagerank",
    "bm25_topk",
    "generalize_numeric",
    "group_percentiles",
    "k_anonymity_annotate",
    "pseudonym",
    "source_quota",
    "stratified_sample",
    "temperature_resample",
    "tfidf_keywords",
    "unigram_logprob",
    "weighted_sample",
    "dispatch",
    "limit_scan",
    "qualifier_filter",
    "score_threshold",
    "taxon_filter",
    "test_id_subset",
    "anti_join",
    "broadcast_lookup",
    "canonical_pair",
    "composite_key",
    "join_with_miss_metrics",
    "one_to_one_mappings",
    "pairwise_within_group",
    "range_join",
    "semi_join",
    "group_zscore",
    "interval_rollup",
    "detect_hot_keys",
    "salted_aggregate",
    "salted_count_distinct",
    "skew_join",
    "topk_per_group",
    "except_diff",
    "intersect_all",
    "union_dedup",
]
