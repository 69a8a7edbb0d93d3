from dipper_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    stopword_hits,
    token_count,
    tokens,
    word_shingles,
)
from dipper_spark.functions.vectors import cosine, dot, l2_norm

__all__ = [
    "doc_fingerprint",
    "lang_id",
    "quality_score",
    "stopword_hits",
    "token_count",
    "tokens",
    "word_shingles",
    "cosine",
    "dot",
    "l2_norm",
]
