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
