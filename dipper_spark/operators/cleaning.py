"""Corpus-cleaning operators: PII scan/redaction and boilerplate removal.

Production training-data pipelines run these between ingestion and dedup:

- **PII handling** — regex detection + redaction of emails / phone numbers /
  IP addresses.  Pure ``regexp_extract_all`` / ``regexp_replace`` column
  expressions (JVM-side, whole-stage codegen); the patterns are restricted
  to syntax shared by Java regex and RE2 so a DuckDB oracle can mirror
  them verbatim.
- **Boilerplate stripping** — the CCNet/RefinedWeb discipline: a text unit
  (line on real corpora; fixed-width token chunk here, matching
  ``chunk_dedup``) that occurs in more than ``max_doc_freq`` documents is
  boilerplate (headers, footers, navigation) and is removed from EVERY
  document while the document's remaining units keep their original order.

100 TB posture of the strip: one explode, one distinct-doc-frequency agg,
then a **broadcast anti-join** against the (small) hot-unit table — the
same discipline as ``jaccard_pairs``' hot-shingle prune — and one
re-aggregation partitioned by doc id.  No self-joins, no cartesians; the
hot table is bounded by vocabulary, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dipper_spark.functions.text import token_chunks, tokens
from dipper_spark.operators.util import ensure_parallelism

#: detection patterns — Java-regex ∩ RE2 syntax only (no lookarounds, no
#: backrefs) so Spark and the DuckDB oracle compile them identically
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\d{2}-\d{3}-\d{3}-\d{4}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind match counts in one pass of JVM regex extraction."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with a ``[KIND]`` placeholder — a chained
    ``regexp_replace`` (each global), applied email → phone → ip so a
    redacted placeholder can't be re-matched by a later pattern."""
    c = F.col(col) if isinstance(col, str) else col
    for kind, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"[{kind.upper()}]")
    return c


def collapse_token_runs(arr: Column) -> Column:
    """Run-length scrub over a token array: keep element *i* iff ``i == 0``
    or ``arr[i] != arr[i-1]`` — collapses consecutive duplicate tokens
    ("the the", chat-log stutter, scraped-menu repetition) while leaving
    non-adjacent recurrence untouched.  A single indexed ``F.filter``
    lambda (``element_at`` is 1-based, so for 0-based index *i* it reads
    the PREVIOUS element): pure per-row JVM map, zero shuffle."""
    return F.filter(
        arr,
        lambda x, i: F.when(i == 0, F.lit(True)).otherwise(
            x != F.element_at(arr, i)
        ),
    )


def strip_boilerplate_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 10,
    max_doc_freq: int = 2,
) -> DataFrame:
    """Remove token chunks occurring in more than ``max_doc_freq`` distinct
    documents; rebuild each document from its surviving chunks in original
    order.

    Returns (id, n_chunks, n_dropped, clean_text) for every document with
    at least one full chunk; a document whose every chunk was boilerplate
    surfaces with ``clean_text = ''`` (the curation signal), not as a
    missing row.
    """
    # the tokenize+chunk pass is the dominant per-row cost and feeds THREE
    # consumers (the hot-chunk DF count, the anti-join strip, and the
    # per-doc chunk totals) — eagerly materialize it once instead of
    # re-running the regex tokenizer per consumer (the dedup/triangles
    # multi-consumer discipline, guide §1.2; profiled as two extra
    # full-corpus tokenize stages at sf0.1)
    ch = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("id"),
            token_chunks(tokens(text_col), chunk_tokens).alias("chunks"),
        )
        .filter(F.size("chunks") >= 1)
        .localCheckpoint(eager=True)
    )
    ex = ch.select("id", F.posexplode("chunks").alias("pos", "chunk"))
    # doc frequency counts DISTINCT docs (a chunk repeated within one doc
    # is repetition, not boilerplate)
    hot = (
        ex.select("id", "chunk").distinct()
        .groupBy("chunk").agg(F.count(F.lit(1)).alias("dfreq"))
        .filter(F.col("dfreq") > max_doc_freq)
        .select("chunk")
    )
    kept = ex.join(F.broadcast(hot), "chunk", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s.getField("chunk"),
            ),
        ).alias("clean_text"),
    )
    base = ch.select("id", F.size("chunks").cast("long").alias("n_chunks"))
    return (
        base.join(rebuilt, "id", "left")
        .select(
            "id",
            "n_chunks",
            (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0))).cast("long").alias("n_dropped"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )
