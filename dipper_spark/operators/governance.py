"""Data-governance operators for corpus/record anonymization: salted
pseudonymization, numeric generalization, and k-anonymity auditing.

Beyond-reference operators (SURVEY §2's LLM-pipeline section): training
corpora built from user-adjacent records need the release-hygiene pass —
replace direct identifiers with stable pseudonyms, coarsen quasi-
identifiers, and flag rows whose quasi-identifier combination is rarer
than k (the re-identification risk measure).  Everything here is pure
column expressions plus at most one keyed window — scan-speed at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pseudonym(col: Column | str, salt: str) -> Column:
    """Salted stable pseudonym: md5(salt || ':' || value).  The same input
    always maps to the same token (joins across tables keep working), while
    the salt keeps the mapping non-invertible by dictionary attack against
    the bare hash space."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat(F.lit(salt + ":"), c.cast("string")))


def generalize_numeric(col: Column | str, width: float) -> Column:
    """Generalize a numeric to its band floor (floor(x/width)·width) — the
    standard quasi-identifier coarsening step.  Returns the band as a
    BIGINT multiple of ``width`` for engine-portable hashing."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor(c / F.lit(width)).cast("long") * F.lit(int(width))).cast("long")


def k_anonymity_annotate(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Annotate every row with its quasi-identifier group size (``group_n``)
    and a 0/1 ``suppressed`` flag for groups smaller than ``k`` — rows a
    k-anonymous release must drop or further generalize.

    One analytic window over the quasi-identifier key (single shuffle,
    map-side partial counts); no join, no driver state.  The flag is INT,
    not BOOLEAN, for engine-portable hashing."""
    w = Window.partitionBy(*quasi_cols)
    n = F.count(F.lit(1)).over(w)
    return df.withColumn("group_n", n.cast("long")).withColumn(
        "suppressed", (F.col("group_n") < k).cast("int")
    )


def l_diversity_report(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int = 3
) -> DataFrame:
    """Per-quasi-identifier-group l-diversity audit (Machanavajjhala et al.
    2007): k-anonymity bounds group SIZE, but a group whose sensitive
    attribute is constant still leaks it — distinct-l-diversity requires
    ≥ l distinct sensitive values per group.  One hash-agg over the quasi
    key (count + distinct-count, both map-side partial); the flag is INT
    for engine-portable hashing.  Returns (*quasi_cols, group_n,
    l_distinct, diverse)."""
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("group_n"),
        F.countDistinct(sensitive_col).cast("long").alias("l_distinct"),
        (F.countDistinct(sensitive_col) >= l).cast("int").alias("diverse"),
    )
