"""Vector math over array<float> embedding columns — pure column expressions.

Everything accumulates in DOUBLE, sequentially (zip_with + aggregate), which
is bit-identical to DuckDB's list_transform/list_sum — so similarity
thresholds and rank orders are deterministic across engines (verified: 190/190
bit-exact pairs on the synthetic embeddings).

Scale note: higher-order functions run JVM-side (no Python), but are not
whole-stage-codegen vectorized; for the 100 TB brute-force path prefer the
Arrow pandas-UDF variant in operators.similarity (numpy dot over batched
blocks), keeping these exprs for correctness-critical comparisons.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = _c(a), _c(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_unrolled(x: str, y: str, dim: int) -> Column:
    """:func:`dot` with the fold unrolled for a KNOWN dimension: the same
    left-associated ``(((0.0 + x0*y0) + x1*y1) + ...)`` chain of doubles
    in the same order, so the result is bit-identical to the fold — but
    as a flat expression that whole-stage codegen compiles, instead of a
    per-element interpreted lambda (higher-order functions never codegen;
    measured 341 s of task CPU on q_neardup_multiassign's sf1.0 pair
    scoring, dominated by the interpreted fold).  Rows whose arrays are
    not exactly ``dim`` long (or are NULL) take the fold fallback —
    spelled in SQL so it is the identical aggregate/zip_with tree —
    which reproduces the pad-with-null semantics exactly.

    ``x``/``y`` are column NAMES: the whole expression is built as ONE
    SQL string handed to the parser in a single call — the first cut
    built it with 64 iterations of Column operators, ~260 py4j round
    trips and ~1.2 s of driver time per query run, which more than ate
    the executor win at small SF (the classifier _weight_sql lesson).
    ``a + b + c`` parses left-associative, so the chain order is the
    fold's."""
    terms = " + ".join(
        f"CAST({x}[{i}] AS DOUBLE) * CAST({y}[{i}] AS DOUBLE)" for i in range(dim)
    )
    fold = (
        f"aggregate(zip_with({x}, {y}, "
        f"(p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return F.expr(
        f"CASE WHEN size({x}) = {dim} AND size({y}) = {dim} "
        f"THEN CAST(0.0 AS DOUBLE) + {terms} ELSE {fold} END"
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


#: DuckDB oracle fragment computing the same double-precision dot product.
DUCKDB_DOT = (
    "list_sum(list_transform(range(1, len({x})+1), "
    "i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)))"
)


def duckdb_cosine(x: str, y: str) -> str:
    """DuckDB SQL for cosine(x, y) bit-matching the Spark expression above.
    (DuckDB's builtin list_cosine_similarity computes in float32 — ~1e-7 off,
    enough to flip rounded values at boundaries, so we spell it out.)"""
    return (
        f"({DUCKDB_DOT.format(x=x, y=y)} / "
        f"(sqrt({DUCKDB_DOT.format(x=x, y=x)}) * sqrt({DUCKDB_DOT.format(x=y, y=y)})))"
    )
