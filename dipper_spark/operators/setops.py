"""Set operations — SURVEY §2.8 (U1-U4).

union_graphs/graph_equal/graph_diff (the triple-level set ops) live in
core.triples; these are the generic relational forms.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_dedup(*dfs: DataFrame) -> DataFrame:
    """Multi-input union with set semantics.

    Reference: U2 — the same parse applied to N per-taxon files accumulating
    into one graph (GeneOntology.py:269-271, StringDB.py:147-185); union of
    main + metadata graphs (Source.py:228-229)."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs).distinct()


def except_diff(a: DataFrame, b: DataFrame, keep_duplicates: bool = True) -> DataFrame:
    """Set difference (reference: U3/U4 — header-contract set math
    Source.py:810-828; golden-graph diff TestUtils.py:48-57)."""
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set intersection (reference: GO taxa ∩ configured taxa,
    GeneOntology.py:269)."""
    return a.intersectAll(b)
