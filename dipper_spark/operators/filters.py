"""Row filters / predicates / dispatch — SURVEY §2.3 (P1-P10).

Each function mirrors a concrete reference pattern (cited) as a declarative
DataFrame transform so Catalyst pushes it into the scan.  At 100 TB these are
the operators that MUST reach the parquet reader as PushedFilters — that is
verified in tests/test_plans.py.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def qualifier_filter(df: DataFrame, col: Column | str, bad_values: Iterable[str] = ("NOT",)) -> DataFrame:
    """Drop rows carrying a negation/qualifier flag.

    Reference: HPOA drops ``Qualifier == 'NOT'`` rows
    (dipper/sources/HPOAnnotations.py:225-226), GO GAF the same
    (GeneOntology.py:329-330).  NULL qualifiers are kept (dipper's ``!=``
    against a non-null string is what a CSV gives it; we make that explicit).
    """
    c = _c(col)
    return df.filter(c.isNull() | ~c.isin(list(bad_values)))


def score_threshold(df: DataFrame, col: Column | str, *, gt: float | None = None, abs_ge: float | None = None) -> DataFrame:
    """Numeric-threshold row filter.

    Reference: STRING keeps ``combined_score > 700`` (StringDB.py:188-192);
    MPD keeps ``abs(zscore) >= 2`` (MPD.py:138,416-418).
    """
    c = _c(col)
    if gt is not None:
        df = df.filter(c > F.lit(gt))
    if abs_ge is not None:
        df = df.filter(F.abs(c) >= F.lit(abs_ge))
    return df


def taxon_filter(df: DataFrame, cols: Iterable[Column | str], taxa: Iterable[str]) -> DataFrame:
    """Keep rows where ANY of ``cols`` is in the configured taxon list —
    OR-semantics across the pair, like Panther (Panther.py:223-230)."""
    taxa = list(taxa)
    cond = None
    for col in cols:
        c = _c(col).isin(taxa)
        cond = c if cond is None else (cond | c)
    return df.filter(cond)


def test_id_subset(df: DataFrame, col: Column | str, ids: Iterable | DataFrame) -> DataFrame:
    """Test-mode subsetting: keep rows whose key is in a curated id set.

    Reference: resources/test_ids.yaml driving ``*_test.ttl`` goldens
    (HPOAnnotations.py:215-221, MGI.py:531-533, CTD.py:365-370).

    Small literal sets become an ``isin`` (pushed to the scan); a DataFrame of
    ids becomes a LEFT SEMI join (broadcast when small — the planner decides).
    """
    if isinstance(ids, DataFrame):
        key = ids.columns[0]
        other = ids.withColumnRenamed(key, "__test_id")
        c = _c(col)
        return df.join(F.broadcast(other), c == F.col("__test_id"), "left_semi")
    return df.filter(_c(col).isin(list(ids)))


def dispatch(col: Column | str, mapping: Mapping[str, Column | str], default: Column | str | None = None) -> Column:
    """Discriminator-column dispatch as a when/otherwise chain.

    Reference: HPOA aspect P/M -> 'has phenotype' vs I/C -> 'has disposition'
    (HPOAnnotations.py:246-261); ClinVar review-status -> star score
    (ClinVar.py:811-819); GWAS variant-id classification
    (GWASCatalog.py:577-624).
    """
    c = _c(col)
    expr = None
    for key, value in mapping.items():
        v = F.lit(value) if isinstance(value, str) else value
        expr = F.when(c == key, v) if expr is None else expr.when(c == key, v)
    if default is not None:
        d = F.lit(default) if isinstance(default, str) else default
        expr = expr.otherwise(d)
    return expr


def limit_scan(df: DataFrame, n: int | None) -> DataFrame:
    """``--limit N`` pushdown (dipper-etl.py:73; SQL LIMIT in
    PostgreSQLSource.py:72-74).  Catalyst plans a CollectLimit/LocalLimit that
    stops the scan early."""
    return df if n is None else df.limit(n)
