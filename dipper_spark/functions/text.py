"""Text-analysis column functions for LLM-data-pipeline operators:
tokenization, shingling, language-ID heuristic, quality scoring, document
fingerprinting.

These extend the reference's string toolbox (SURVEY §2.9: split/regexp/case
families used across every source) into the training-data-pipeline operators
the engine adds beyond parity.  All pure column expressions — no UDFs, fully
codegen/pushdown friendly at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: language marker words for the n-gram/stopword language-ID heuristic.
#: Order matters: argmax ties resolve in this priority order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ein"],
    "fr": ["le", "la", "les", "et", "une"],
    "es": ["el", "los", "las", "y", "una"],
}

EN_STOPWORDS = LANG_MARKERS["en"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization after lower+trim (the GAF/HPOA split-multivalue
    pattern, e.g. HPOAnnotations.py:280, generalized)."""
    return F.split(F.lower(F.trim(_c(col))), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles; empty array when the doc has < n tokens.

    Built as a zip_with fold over ``n`` shifted slices of the token
    array, NOT a transform-over-indices with ``slice(toks, i, n)`` in
    the lambda: Catalyst does no CSE inside higher-order-function
    lambdas, so the index form re-evaluates the full ``toks`` expression
    (for the usual ``tokens(text)`` caller: the whole regex split) once
    PER SHINGLE — O(len^2) per document, measured ~2ms/doc at 370
    tokens, which dominated every repetition/shingle consumer in the
    full-materialization bench.  The fold form evaluates ``toks`` O(n)
    times and each lambda touches only its element arguments.  Output is
    element-for-element identical (same strings, same order).

    The short-doc case needs an explicit branch: a slice length of
    ``size - n + 1 <= 0`` is invalid — same reason the old index form
    guarded ``sequence(1, 0)`` (which counts DOWN, not empty)."""
    m = F.size(toks) - F.lit(n - 1)
    sh = F.slice(toks, 1, m)
    for j in range(2, n + 1):
        sh = F.zip_with(
            F.slice(toks, j, m), sh, lambda nxt, acc: F.concat_ws(" ", acc, nxt)
        )
    return F.when(F.size(toks) >= n, sh).otherwise(
        F.array().cast("array<string>")
    )


def stopword_hits(toks: Column, words: list[str]) -> Column:
    """Count of tokens (with multiplicity) that are in ``words``."""
    return F.size(F.filter(toks, lambda t: t.isin(words))).cast("long")


def quality_score(col: Column | str) -> Column:
    """Composite document quality in [0,1]:
    0.5·min(n_tokens/100, 1) + 0.3·distinct_token_ratio +
    0.2·min(10·stopword_ratio, 1).

    The length/stopword/diversity mix follows the common pretraining-corpus
    quality heuristics (Gopher/C4-style rules) expressed as arithmetic."""
    t = tokens(col)
    n = F.size(t).cast("double")
    distinct_ratio = F.size(F.array_distinct(t)) / n
    stop_ratio = stopword_hits(t, EN_STOPWORDS) / n
    return F.round(
        F.least(n / 100.0, F.lit(1.0)) * 0.5
        + distinct_ratio * 0.3
        + F.least(stop_ratio * 10.0, F.lit(1.0)) * 0.2,
        6,
    )


def lang_id(col: Column | str) -> Column:
    """Marker-word language ID: argmax of per-language marker hits with
    deterministic priority ties (en > de > fr > es); 'und' (undetermined)
    when nothing matches."""
    t = tokens(col)
    hits = {lang: stopword_hits(t, words) for lang, words in LANG_MARKERS.items()}
    mx = F.greatest(*hits.values())
    expr = F.when(mx == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # priority order: first lang reaching max wins
        expr = expr.when(hits[lang] == mx, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def doc_fingerprint(col: Column | str) -> Column:
    """Canonical bag-of-words fingerprint: md5 over the sorted distinct token
    set — invariant to token order and repetition (the dedup-key analog of
    dipper's content-addressed ids, Source.py:248-278)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))


def prefix_fingerprint(col: Column | str, n_tokens: int = 8) -> Column:
    """Fingerprint of the first ``n_tokens`` tokens — a cheap near-dup
    blocking key (documents sharing a long prefix are dup candidates)."""
    return F.md5(F.concat_ws(" ", F.slice(tokens(col), 1, n_tokens)))


#: BPE-ish pre-tokenizer: letter runs / digit runs / single non-alnum marks —
#: the GPT-2 pre-tokenization regex stripped of its contraction/unicode
#: classes so the SAME pattern runs on Spark (java.util.regex) and the
#: DuckDB oracle (RE2) with identical match semantics.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-style pre-tokenization (letter runs, digit runs, punctuation
    marks) after lowering — the token-accounting granularity LLM pipelines
    budget in, vs the whitespace tokens of :func:`tokens`."""
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(BPE_ISH_PATTERN), 0)


def rolling_fingerprint(
    text_col: str, base: int = 131, mod: int = 1_000_000_007
) -> Column:
    """Polynomial (Rabin–Karp-style) rolling hash over whitespace tokens:
    fp = fold(tokens, 0, acc·base + h(tok) mod m) with h(tok) the 32-bit
    md5 prefix mod m.  Order-SENSITIVE — the complement of the bag-of-words
    :func:`doc_fingerprint`: token transpositions change this fingerprint
    but not that one.  All arithmetic stays below 2^63 (acc < m ≈ 1e9, so
    acc·131 + h < 1.4e11), so ANSI overflow checking never fires and the
    fold is bit-identical in any engine with 64-bit integers.

    Built as one SQL-text expression (nested transform+aggregate lambdas
    each get their own scope — see operators/dedup.py on pyspark 4.1's
    lambda-id reuse); takes a column NAME for that reason."""
    return F.expr(
        f"aggregate("
        f"  transform(split(lower(trim({text_col})), '\\\\s+'),"
        f"    t -> CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) % {mod}),"
        f"  CAST(0 AS BIGINT),"
        f"  (acc, x) -> (acc * {base} + x) % {mod})"
    )


def token_chunks(toks: Column, chunk_tokens: int = 10) -> Column:
    """Non-overlapping fixed-width token chunks — the dedup unit of
    RefinedWeb-style line-level dedup, generalized to token windows (the
    synthetic corpus has no newlines; real corpora would chunk on lines
    first and windows second).  Only FULL chunks are produced: a 25-token
    doc yields 2 ten-token chunks, the 5-token tail is ignored.  Empty
    array (not null) below one chunk — same guard as word_shingles: Spark's
    sequence(0, -1) counts DOWN, it does not produce an empty array."""
    n_full = F.floor(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    return F.when(
        n_full > 0,
        F.transform(
            F.sequence(F.lit(0), n_full - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def sliding_token_chunks(toks: Column, window: int = 8, stride: int = 4) -> Column:
    """OVERLAPPING fixed-width token windows — the RAG/passage-extraction
    chunking shape (window w, stride s < w, so consecutive chunks share
    w - s tokens of context).  Start offsets are 0, s, 2s, ... up to the
    last offset with a FULL window (a 10-token doc at w=8, s=4 yields
    starts [0], not [0, 4] — partial tails are dropped, matching
    :func:`token_chunks`).  Empty array below one window, same
    sequence(0, -1)-counts-down guard as word_shingles."""
    last = F.floor((F.size(toks) - F.lit(window)) / F.lit(stride)).cast("int")
    return F.when(
        F.size(toks) >= window,
        F.transform(
            F.sequence(F.lit(0), last),
            lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, window)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def mean_token_chars(toks: Column) -> Column:
    """Mean token length in characters — total chars via length(array_join)
    (no higher-order aggregate needed), so the expression is portable and
    codegen-friendly.  Null-safe only for non-empty token arrays."""
    return F.length(F.array_join(toks, "")) / F.size(toks).cast("double")


def alpha_ratio(toks: Column) -> Column:
    """Fraction of tokens that are purely alphabetic (post-lowering) — the
    symbol/garbage-content signal in Gopher-style quality rule sets."""
    return F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$"))) / F.size(toks).cast(
        "double"
    )


def quality_rules(col: Column | str) -> dict[str, Column]:
    """Gopher-style quality-rule breakdown: each rule is an independent 0/1
    flag (INT, not BOOLEAN, for engine-portable hashing), plus the overall
    ``passed`` conjunction.  Thresholds follow the published Gopher rules
    rescaled to the synthetic corpus (docs are 10-500 tokens):

    - ``r_len``        50 <= n_tokens <= 100000
    - ``r_word_len``   3 <= mean token chars <= 10
    - ``r_stop``       >= 2 English stopword occurrences
    - ``r_alpha``      >= 80% purely-alphabetic tokens
    - ``r_rep``        repeated word-3-gram fraction < 0.2

    All pure column expressions over one tokenization — a single map pass,
    no shuffle, no UDFs; at 100 TB this is a scan-speed filter."""
    t = tokens(col)
    n = F.size(t)
    rules = {
        "r_len": (n >= 50) & (n <= 100000),
        "r_word_len": (mean_token_chars(t) >= 3.0) & (mean_token_chars(t) <= 10.0),
        "r_stop": stopword_hits(t, EN_STOPWORDS) >= 2,
        "r_alpha": alpha_ratio(t) >= 0.8,
        "r_rep": repetition_ratio(col, 3) < 0.2,
    }
    out: dict[str, Column] = {"n_tokens": n.cast("long")}
    passed = None
    for name, rule in rules.items():
        out[name] = rule.cast("int")
        passed = rule if passed is None else (passed & rule)
    out["passed"] = passed.cast("int")
    return out


def array_ndistinct(arr: Column) -> Column:
    """Distinct-element count of an array in O(n log n): sort, then count
    boundaries between adjacent unequal elements.  Spark's
    ``array_distinct`` is O(n^2) pairwise compares — on a 370-token doc's
    368 3-gram shingles that is ~135k string comparisons per row, which
    the full-materialization bench exposed as ~2ms/doc (13s at sf0.1)
    across every repetition-rule consumer; the sorted-adjacent form does
    ~3k.  For arrays satisfying the contract below the COUNT equals
    ``size(array_distinct(...))``, so oracles
    (``len(list_distinct(...))``) are untouched.

    CONTRACT — string arrays with no NULL elements only (all shingle/
    token callers qualify): the ``prev`` accumulator field is typed
    string, so a non-string array is an analysis error; and a NULL
    element is never counted (``x != prev`` is NULL → the +1 branch
    never fires) whereas ``array_distinct`` counts NULL once.  Fall back
    to ``F.size(F.array_distinct(arr))`` outside this contract.

    The fold runs OVER the sorted array itself with a (prev, cnt) struct
    accumulator — indexing back into the sorted array from the lambda
    would re-evaluate the sort per element (no CSE inside higher-order
    lambdas), turning O(n log n) into O(n^2 log n)."""
    s = F.array_sort(arr)
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"), F.lit(0).alias("cnt")
    )
    return F.aggregate(
        s,
        zero,
        lambda acc, x: F.struct(
            x.alias("prev"),
            (
                acc["cnt"]
                + F.when(acc["prev"].isNull() | (x != acc["prev"]), 1).otherwise(0)
            ).alias("cnt"),
        ),
        lambda acc: acc["cnt"],
    )


def repetition_ratio(col: Column | str, n: int = 3) -> Column:
    """Intra-document repetition: ``1 - distinct/total`` word n-grams — the
    standard repeated-n-gram quality signal for pretraining-data filtering
    (heavily templated / looping documents score high).  Pure column
    expressions, one map pass; 0.0 for documents shorter than ``n``."""
    sh = word_shingles(tokens(col), n)
    return F.when(
        F.size(sh) > 0,
        F.round(F.lit(1.0) - array_ndistinct(sh) / F.size(sh), 6),
    ).otherwise(F.lit(0.0))
