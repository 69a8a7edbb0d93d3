"""SEPIO evidence & provenance emitters.

Reference: dipper/models/Evidence.py:32-156 (evidence lines attached to an
association: has_supporting_evidence → evidence-line node typed by ECO class,
with supporting data measurements) and dipper/models/Provenance.py:32-105
(assertion node: created-by agent, date, asserted-in publication).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dipper_spark.core.ids import make_id
from dipper_spark.core.triples import make_triples, union_graphs
from dipper_spark.models import terms as T


def evidence_triples(
    df: DataFrame,
    assoc_col: str = "assoc_id",
    evidence_type_col: str = "evidence_type",
    *,
    reference_col: str | None = None,
    graph_id: str | None = None,
) -> DataFrame:
    """Evidence.add_supporting_evidence (Evidence.py:32-90): mint a
    deterministic evidence-line node per (assoc, evidence-type), type it, and
    optionally attach supporting publications/data references.

    evline = MONARCH:b<sha1> of assoc+type  (same digest family as assoc ids)
    assoc  SEPIO:0000007  evline
    evline rdf:type       SEPIO:0000002
    evline rdf:type       <evidence_type>        (the ECO class)
    evline dc:source      reference              (when reference_col given)
    """
    staged = df.withColumn(
        "_evline", make_id(F.concat_ws("+", F.col(assoc_col), F.col(evidence_type_col)))
    )
    g = graph_id
    parts = [
        make_triples(staged, assoc_col, F.lit(T.HAS_SUPPORTING_EVIDENCE), "_evline", is_literal=False, graph_id=g),
        make_triples(staged, "_evline", F.lit(T.TYPE), F.lit(T.EVIDENCE_LINE), is_literal=False, graph_id=g),
        make_triples(
            staged.filter(F.col(evidence_type_col).isNotNull()),
            "_evline", F.lit(T.TYPE), evidence_type_col, is_literal=False, graph_id=g,
        ),
    ]
    if reference_col is not None:
        parts.append(
            make_triples(
                staged.filter(F.col(reference_col).isNotNull()),
                "_evline", F.lit(T.SOURCE), reference_col, is_literal=False, graph_id=g,
            )
        )
    return union_graphs(*parts)


def provenance_triples(
    df: DataFrame,
    assertion_col: str = "assoc_id",
    *,
    agent_col: str | None = None,
    date_col: str | None = None,
    publication_col: str | None = None,
    graph_id: str | None = None,
) -> DataFrame:
    """Provenance.add_assertion/add_agent (Provenance.py:32-105):

    assertion rdf:type        SEPIO:0000001
    assertion SEPIO:0000018   agent         (created-by)
    assertion dc:date         date^^xsd:date
    assertion SEPIO:0000015   publication   (is-asserted-in)
    """
    g = graph_id
    parts = [
        make_triples(df, assertion_col, F.lit(T.TYPE), F.lit(T.ASSERTION), is_literal=False, graph_id=g)
    ]
    if agent_col is not None:
        parts.append(
            make_triples(
                df.filter(F.col(agent_col).isNotNull()),
                assertion_col, F.lit(T.CREATED_BY), agent_col, is_literal=False, graph_id=g,
            )
        )
    if date_col is not None:
        parts.append(
            make_triples(
                df.filter(F.col(date_col).isNotNull()),
                assertion_col, F.lit(T.DATE), F.col(date_col).cast("string"),
                is_literal=True, datatype="xsd:date", graph_id=g,
            )
        )
    if publication_col is not None:
        parts.append(
            make_triples(
                df.filter(F.col(publication_col).isNotNull()),
                assertion_col, F.lit(T.IS_ASSERTED_IN), publication_col, is_literal=False, graph_id=g,
            )
        )
    return union_graphs(*parts)
