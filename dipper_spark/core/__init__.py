from dipper_spark.core.schema import TRIPLE_COLUMNS, TRIPLE_SCHEMA, empty_triples
from dipper_spark.core.ids import digest_id, make_id
from dipper_spark.core.literals import (
    CURIE_REGEXP,
    is_literal_col,
    normalize_whitespace,
    nt_escape,
    remove_control_chars,
)
from dipper_spark.core.curie import CurieMap, DEFAULT_CURIE_MAP
from dipper_spark.core.triples import (
    dedup_triples,
    distinct_predicates,
    graph_equal,
    make_triples,
    predicate_histogram,
    union_graphs,
    void_stats,
)
from dipper_spark.core.vocab import TranslationTable

__all__ = [
    "TRIPLE_COLUMNS",
    "TRIPLE_SCHEMA",
    "empty_triples",
    "digest_id",
    "make_id",
    "CURIE_REGEXP",
    "is_literal_col",
    "normalize_whitespace",
    "nt_escape",
    "remove_control_chars",
    "CurieMap",
    "DEFAULT_CURIE_MAP",
    "dedup_triples",
    "distinct_predicates",
    "graph_equal",
    "make_triples",
    "predicate_histogram",
    "union_graphs",
    "void_stats",
    "TranslationTable",
]
