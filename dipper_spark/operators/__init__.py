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
    broadcast_lookup,
    canonical_pair,
    composite_key,
    join_with_miss_metrics,
    one_to_one_mappings,
    pairwise_within_group,
    range_join,
    semi_join,
)
from dipper_spark.operators.aggregates import group_zscore, interval_rollup
from dipper_spark.operators.windows import topk_per_group
from dipper_spark.operators.setops import except_diff, intersect_all, union_dedup

__all__ = [
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
    "topk_per_group",
    "except_diff",
    "intersect_all",
    "union_dedup",
]
