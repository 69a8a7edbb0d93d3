"""Triples DataFrame constructors and whole-graph operators.

Reference semantics being reproduced:
- set semantics of the rdflib store (RDFGraph.py:38) -> dropDuplicates
- graph union (Source.py:228-229) -> unionByName + dedup
- predicate histogram / distinct predicates (GraphUtils.py:48-60,177-194)
- VoID summary stats (Dataset.py:123-127)
- golden-graph equality (TestUtils.test_graph_equality, TestUtils.py:13-57)

Scale notes: dedup is a hash aggregate on (s,p,o) — partial/map-side combine
means the shuffle moves only unique triples per partition.  The histogram /
stats run as partial aggs too.  Nothing here collects to the driver.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dipper_spark.core.literals import is_literal_col, normalize_whitespace
from dipper_spark.core.schema import TRIPLE_COLUMNS


#: biolink category-assignment vocabulary (RDFGraph._make_category_triple,
#: RDFGraph.py:49-65; defaults from dipper.utils.rdf2dot / blv.terms)
BIOLINK_CATEGORY = "biolink:category"
BIOLINK_NAMED_THING = "biolink:NamedThing"


def make_triples(
    df: DataFrame,
    subject: Column | str,
    predicate: Column | str,
    obj: Column | str,
    *,
    is_literal: Column | bool | None = None,
    datatype: Column | str | None = None,
    graph_id: str | None = None,
    subject_category: Column | str | None = None,
    object_category: Column | str | None = None,
) -> DataFrame:
    """Project a staging DataFrame into canonical triples.

    Mirrors Graph.addTriple (dipper/graph/Graph.py:23-41): if ``is_literal``
    is not given it is inferred per-row exactly like RDFGraph._is_literal;
    literal objects get dipper's whitespace normalization (RDFGraph.py:110-111).

    ``subject_category`` / ``object_category`` mirror the biolink
    category-assignment side triples (RDFGraph.addTriple 86-107):
    ``<entity> biolink:category <category>``.  An object category is only
    emitted for rows whose object is NOT a literal (the reference logs a
    warning and drops it there — here it is skipped row-wise).
    """
    s = F.col(subject) if isinstance(subject, str) else subject
    p = F.col(predicate) if isinstance(predicate, str) else predicate
    o = F.col(obj) if isinstance(obj, str) else obj
    if is_literal is None:
        lit = is_literal_col(o)
    elif isinstance(is_literal, bool):
        lit = F.lit(is_literal)
    else:
        lit = is_literal
    if datatype is None:
        dt = F.lit(None).cast("string")
    elif isinstance(datatype, str):
        dt = F.lit(datatype)
    else:
        dt = datatype
    o_out = F.when(lit, normalize_whitespace(o.cast("string"))).otherwise(o.cast("string"))
    base = df.select(
        s.cast("string").alias("subject"),
        p.cast("string").alias("predicate"),
        o_out.alias("object"),
        lit.alias("is_literal"),
        dt.alias("datatype"),
        F.lit(graph_id).cast("string").alias("graph_id"),
    )
    if subject_category is None and object_category is None:
        return base
    parts = [base]
    if subject_category is not None:
        parts.append(category_triples(df, s, subject_category, graph_id=graph_id))
    if object_category is not None:
        # the pre-normalization object value IS the entity id on these rows
        non_lit = df.filter(~lit) if not isinstance(is_literal, bool) else (
            df if is_literal is False else df.limit(0)
        )
        parts.append(category_triples(non_lit, o, object_category, graph_id=graph_id))
    return union_graphs(*parts)


def category_triples(
    df: DataFrame,
    entity: Column | str,
    category: Column | str | None = None,
    predicate: str = BIOLINK_CATEGORY,
    graph_id: str | None = None,
) -> DataFrame:
    """RDFGraph._make_category_triple (RDFGraph.py:49-65):
    ``<entity> biolink:category <category>``, defaulting the category to
    ``biolink:NamedThing`` when none is given — the biolink-model typing
    side channel next to rdf:type."""
    e = F.col(entity) if isinstance(entity, str) else entity
    if category is None:
        c: Column = F.lit(BIOLINK_NAMED_THING)
    elif isinstance(category, str):
        c = F.lit(category)
    else:
        c = category
    return make_triples(
        df, e, F.lit(predicate), c, is_literal=False, graph_id=graph_id
    )


def dedup_triples(df: DataFrame) -> DataFrame:
    """Set semantics of the rdflib IOMemory store (RDFGraph.py:38): re-adding
    an identical (s,p,o) is a no-op."""
    return df.dropDuplicates(["subject", "predicate", "object"])


def union_graphs(*graphs: DataFrame) -> DataFrame:
    """Graph union with set semantics (reference: Source.write unions the
    dataset-metadata graph into the main graph, Source.py:228-229)."""
    return dedup_triples(reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), graphs))


def predicate_histogram(df: DataFrame) -> DataFrame:
    """Triple count per predicate (GraphUtils.count_predicates,
    dipper/utils/GraphUtils.py:177-194)."""
    return df.groupBy("predicate").agg(F.count(F.lit(1)).alias("n_triples"))


def compare_predicate_histograms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Two-graph predicate-count comparison (GraphUtils.compare_graph_predicates,
    GraphUtils.py:151-175): full outer join of the two histograms."""
    ha = predicate_histogram(a).withColumnRenamed("n_triples", "n_left")
    hb = predicate_histogram(b).withColumnRenamed("n_triples", "n_right")
    return ha.join(hb, "predicate", "full_outer").na.fill(0, ["n_left", "n_right"])


def distinct_predicates(df: DataFrame) -> DataFrame:
    """Unique predicate set (GraphUtils.get_properties_from_graph,
    GraphUtils.py:48-60) — drives property-axiom injection."""
    return df.select("predicate").distinct()


def void_stats(df: DataFrame, exact: bool = True) -> DataFrame:
    """VoID dataset stats (Dataset.py:123-127): triples, distinct subjects,
    distinct objects, distinct properties, entities (subjects that are not
    literals... dipper counts IRIs typed; we use distinct non-literal nodes).

    ``exact=False`` switches to approx_count_distinct for the 100 TB path
    where a 2% HLL estimate beats an extra exact-distinct shuffle.
    """
    cd = F.countDistinct if exact else (lambda c: F.approx_count_distinct(c))
    return df.agg(
        F.count(F.lit(1)).alias("n_triples"),
        cd(F.col("subject")).alias("n_subjects"),
        cd(F.col("object")).alias("n_objects"),
        cd(F.col("predicate")).alias("n_properties"),
    )


def graph_equal(a: DataFrame, b: DataFrame) -> bool:
    """Golden-graph set equality (TestUtils.test_graph_equality,
    dipper/utils/TestUtils.py:13-57): both set differences empty."""
    cols = [c for c in TRIPLE_COLUMNS[:3]]
    a3, b3 = a.select(*cols).distinct(), b.select(*cols).distinct()
    return a3.exceptAll(b3).isEmpty() and b3.exceptAll(a3).isEmpty()


def graph_diff(a: DataFrame, b: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The two set differences TestUtils prints on failure (TestUtils.py:48-57)."""
    cols = ["subject", "predicate", "object"]
    return (
        a.select(cols).exceptAll(b.select(cols)),
        b.select(cols).exceptAll(a.select(cols)),
    )
