"""Core model-vocabulary emitters (classes, individuals, labels, xrefs...).

Reference: dipper/models/Model.py — each ``add*`` method emits 1-4 triples
per entity (addClassToGraph, addIndividualToGraph, addLabel, addSynonym,
addDefinition, addXref, addDescription, addComment, addSameIndividual,
addDeprecatedClass/Individual w/ replaced-by, makeLeader at Model.py:426-441).

Spark-first: one entity DataFrame in, one triples DataFrame out; optional
columns produce conditionally-present triples via a union of filtered
selects (never null-objects).  All pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dipper_spark.core.triples import make_triples, union_graphs
from dipper_spark.models import terms as T


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def entity_triples(
    df: DataFrame,
    id_col: str,
    *,
    rdf_type: str,
    label_col: str | None = None,
    description_col: str | None = None,
    graph_id: str | None = None,
) -> DataFrame:
    """Shared body of addClassToGraph/addIndividualToGraph (Model.py):
    ``id rdf:type <type>`` + optional label + optional dc:description."""
    parts = [make_triples(df, id_col, F.lit(T.TYPE), F.lit(rdf_type), is_literal=False, graph_id=graph_id)]
    if label_col is not None:
        parts.append(
            make_triples(
                df.filter(_col(label_col).isNotNull()),
                id_col, F.lit(T.LABEL), label_col, is_literal=True, graph_id=graph_id,
            )
        )
    if description_col is not None:
        parts.append(
            make_triples(
                df.filter(_col(description_col).isNotNull()),
                id_col, F.lit(T.DESCRIPTION), description_col, is_literal=True, graph_id=graph_id,
            )
        )
    return union_graphs(*parts)


def class_triples(df: DataFrame, id_col: str, label_col: str | None = None,
                  description_col: str | None = None, subclass_of_col: str | None = None,
                  graph_id: str | None = None) -> DataFrame:
    """Model.addClassToGraph: owl:Class typing + label/description + optional
    rdfs:subClassOf parent."""
    out = entity_triples(df, id_col, rdf_type=T.CLASS, label_col=label_col,
                         description_col=description_col, graph_id=graph_id)
    if subclass_of_col is not None:
        out = union_graphs(
            out,
            make_triples(
                df.filter(_col(subclass_of_col).isNotNull()),
                id_col, F.lit(T.SUBCLASS_OF), subclass_of_col, is_literal=False, graph_id=graph_id,
            ),
        )
    return out


def individual_triples(df: DataFrame, id_col: str, type_col: Column | str | None = None,
                       label_col: str | None = None, graph_id: str | None = None) -> DataFrame:
    """Model.addIndividualToGraph (Model.py:129-160): with an explicit type the
    individual is typed ONLY as that type; ``owl:NamedIndividual`` is the
    fallback typing when no type is given.  (The reference emits both only
    when a source calls addIndividualToGraph twice, once each way.)"""
    parts = []
    if label_col is not None:
        parts.append(
            make_triples(
                df.filter(_col(label_col).isNotNull()),
                id_col, F.lit(T.LABEL), label_col, is_literal=True, graph_id=graph_id,
            )
        )
    rdf_type = F.lit(T.NAMED_INDIVIDUAL) if type_col is None else type_col
    parts.append(make_triples(df, id_col, F.lit(T.TYPE), rdf_type, is_literal=False, graph_id=graph_id))
    return union_graphs(*parts)


def _annotation(df: DataFrame, id_col: str, predicate: str, value_col: str,
                is_literal: bool, graph_id: str | None = None) -> DataFrame:
    return make_triples(
        df.filter(_col(value_col).isNotNull()),
        id_col, F.lit(predicate), value_col, is_literal=is_literal, graph_id=graph_id,
    )


def comment_triples(df: DataFrame, id_col: str, comment_col: str,
                    graph_id: str | None = None) -> DataFrame:
    """Model.addComment (Model.py:384-391): ``id rdfs:comment "text"`` with
    the comment stripped of surrounding whitespace."""
    return make_triples(
        df.filter(_col(comment_col).isNotNull()),
        id_col, F.lit(T.COMMENT), F.trim(_col(comment_col)),
        is_literal=True, graph_id=graph_id,
    )


def synonym_triples(df: DataFrame, id_col: str, synonyms_col: str,
                    synonym_type: str = T.HAS_EXACT_SYNONYM,
                    graph_id: str | None = None) -> DataFrame:
    """Model.addSynonym over a multi-valued column: the reference splits
    pipe-separated synonym strings and loops (GeneOntology.py:365); here the
    array column explodes."""
    exploded = (
        df.filter(F.col(synonyms_col).isNotNull())
        .select(id_col, F.explode(synonyms_col).alias("_syn"))
        .filter(F.col("_syn") != "")
    )
    return make_triples(exploded, id_col, F.lit(synonym_type), "_syn", is_literal=True, graph_id=graph_id)


def xref_triples(df: DataFrame, id_col: str, xref_col: str, graph_id: str | None = None) -> DataFrame:
    """Model.addXref → OIO:hasDbXref (object is a resource id)."""
    return _annotation(df, id_col, T.HAS_DBXREF, xref_col, is_literal=False, graph_id=graph_id)


def pairwise_triples(df: DataFrame, subject_col: str, object_col: str, predicate: str,
                     graph_id: str | None = None) -> DataFrame:
    """Generic 2-entity pattern: sameAs/equivalentClass/differentFrom etc.
    (Model.addSameIndividual, addEquivalentClass)."""
    return make_triples(df, subject_col, F.lit(predicate), object_col, is_literal=False, graph_id=graph_id)


def membership_triples(df: DataFrame, member_col: str, collection_col: str,
                       predicate: str = T.MEMBER_OF, graph_id: str | None = None) -> DataFrame:
    """RO:member-of pattern (OrthologyAssoc gene-family membership,
    OrthologyAssoc.py:35-45)."""
    return make_triples(df, member_col, F.lit(predicate), collection_col, is_literal=False, graph_id=graph_id)


def deprecation_triples(df: DataFrame, id_col: str, replaced_by_col: str | None = None,
                        graph_id: str | None = None) -> DataFrame:
    """Model.addDeprecatedClass/Individual (Model.py:262-270): owl:deprecated
    "true"^^xsd:boolean + IAO:0100001 replaced-by edges when known."""
    dep = make_triples(
        df, id_col, F.lit(T.DEPRECATED), F.lit("true"),
        is_literal=True, datatype="xsd:boolean", graph_id=graph_id,
    )
    if replaced_by_col is None:
        return dep
    rep = make_triples(
        df.filter(_col(replaced_by_col).isNotNull()),
        id_col, F.lit(T.REPLACED_BY), replaced_by_col, is_literal=False, graph_id=graph_id,
    )
    return union_graphs(dep, rep)


def restriction_triples(
    df: DataFrame,
    class_col: str,
    property_id: str,
    value_col: str,
    graph_id: str | None = None,
) -> DataFrame:
    """Model.addOWLPropertyClassRestriction (Model.py:190-227): the class is
    a subClassOf an anonymous ``owl:Restriction`` bnode on ``property_id``
    with ``owl:someValuesFrom`` the value.  The bnode id is the digest of
    ``property-value`` (shared across classes with the same restriction,
    exactly like the reference), and it carries the same debug label.
    """
    from dipper_spark.core.ids import digest_id

    key = F.concat_ws("-", F.lit(property_id), _col(value_col))
    withb = df.filter(_col(value_col).isNotNull()).withColumn(
        "_rb", F.concat(F.lit("_:"), digest_id(key))
    ).withColumn("_rlabel", key)
    return union_graphs(
        make_triples(withb, "_rb", F.lit(T.TYPE), F.lit(T.RESTRICTION), is_literal=False, graph_id=graph_id),
        make_triples(withb, "_rb", F.lit(T.LABEL), "_rlabel", is_literal=True, graph_id=graph_id),
        make_triples(withb, "_rb", F.lit(T.ON_PROPERTY), F.lit(property_id), is_literal=False, graph_id=graph_id),
        make_triples(withb, "_rb", F.lit(T.SOME_VALUES_FROM), value_col, is_literal=False, graph_id=graph_id),
        make_triples(withb, class_col, F.lit(T.SUBCLASS_OF), "_rb", is_literal=False, graph_id=graph_id),
    )
