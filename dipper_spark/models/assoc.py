"""Reified-association emitters (OBAN star pattern) with deterministic ids.

Reference: dipper/models/assoc/Association.py — the association node id is a
content hash of definedby+subject+predicate+object(+attrs)
(Association.py:260-290, bit-compatible via core.ids.assoc_id) and its graph
expansion is a star of 4 fixed triples + the direct edge + optional
evidence/source/date/score annotations (Association.py:94-163).

Spark-first: one row per association; evidence/source are ``array<string>``
columns exploded into triples.  The whole expansion is a union of narrow
selects over the SAME staged DataFrame — Catalyst collapses the shared scan,
and at 100 TB each branch is a map-only projection (the only shuffle is the
final dedup, which union_graphs applies once).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dipper_spark.core.ids import assoc_id
from dipper_spark.core.triples import make_triples, union_graphs
from dipper_spark.models import terms as T


def with_assoc_id(
    df: DataFrame,
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
    *,
    definedby: str = "MONARCH",
    extra_cols: list[str] | None = None,
    out_col: str = "assoc_id",
) -> DataFrame:
    """Attach the deterministic association id column
    (Association.make_association_id, Association.py:260-290)."""
    parts: list[Column | str] = [subject_col, predicate_col, object_col]
    parts += list(extra_cols or [])
    return df.withColumn(out_col, assoc_id(*parts, definedby=definedby))


def association_triples(
    df: DataFrame,
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
    *,
    definedby: str = "MONARCH",
    extra_id_cols: list[str] | None = None,
    evidence_col: str | None = None,
    source_col: str | None = None,
    date_col: str | None = None,
    score_col: str | None = None,
    graph_id: str | None = None,
) -> DataFrame:
    """Association._add_basic_association_to_graph (Association.py:94-163):

    - direct edge            sub pred obj
    - assoc rdf:type         OBAN:association
    - assoc has_subject sub / has_predicate pred / has_object obj
    - per evidence element   assoc RO:0002558 ev        (array col, exploded)
    - per source element     assoc dc:source  src       (array col, exploded)
    - optional               assoc pav:createdOn date (Association.py:145-150),
                             assoc SIO:000300 score^^xsd:float
    """
    a = with_assoc_id(
        df, subject_col, predicate_col, object_col,
        definedby=definedby, extra_cols=extra_id_cols,
    )
    g = graph_id
    parts = [
        make_triples(a, subject_col, predicate_col, object_col, is_literal=False, graph_id=g),
        make_triples(a, "assoc_id", F.lit(T.TYPE), F.lit(T.ASSOCIATION), is_literal=False, graph_id=g),
        make_triples(a, "assoc_id", F.lit(T.ASSOC_SUBJECT), subject_col, is_literal=False, graph_id=g),
        make_triples(a, "assoc_id", F.lit(T.ASSOC_PREDICATE), predicate_col, is_literal=False, graph_id=g),
        make_triples(a, "assoc_id", F.lit(T.ASSOC_OBJECT), object_col, is_literal=False, graph_id=g),
    ]
    for col, pred, lit, dt in (
        (evidence_col, T.HAS_EVIDENCE, False, None),
        (source_col, T.SOURCE, False, None),
    ):
        if col is not None:
            exploded = (
                a.filter(F.col(col).isNotNull())
                .select("assoc_id", F.explode(col).alias("_v"))
                .filter(F.col("_v") != "")
            )
            parts.append(make_triples(exploded, "assoc_id", F.lit(pred), "_v", is_literal=lit, datatype=dt, graph_id=g))
    if date_col is not None:
        parts.append(
            make_triples(
                a.filter(F.col(date_col).isNotNull()),
                "assoc_id", F.lit(T.CREATED_ON), date_col, is_literal=True, graph_id=g,
            )
        )
    if score_col is not None:
        # Association.py:154-160 — scores are xsd:float literals
        parts.append(
            make_triples(
                a.filter(F.col(score_col).isNotNull()),
                "assoc_id", F.lit(T.SCORE), F.col(score_col).cast("string"),
                is_literal=True, datatype="xsd:float", graph_id=g,
            )
        )
    return union_graphs(*parts)


def d2p_association_triples(
    df: DataFrame,
    disease_col: str = "disease_id",
    phenotype_col: str = "phenotype_id",
    predicate_col: str | Column = "predicate",
    *,
    onset_col: str | None = None,
    frequency_col: str | None = None,
    evidence_col: str | None = None,
    source_col: str | None = None,
    definedby: str = "MONARCH",
    graph_id: str | None = None,
) -> DataFrame:
    """D2PAssoc (dipper/models/assoc/D2PAssoc.py:58-105): base association
    plus onset (RO:0002488) and frequency (RO:0003306) qualifiers on the
    assoc node; onset/frequency participate in the id hash (D2PAssoc
    set_association_id includes them so distinct qualifier rows stay
    distinct associations)."""
    pred = F.col(predicate_col) if isinstance(predicate_col, str) else predicate_col
    staged = df.withColumn("_pred", pred)
    extra = [c for c in (onset_col, frequency_col) if c is not None]
    base = association_triples(
        staged, disease_col, "_pred", phenotype_col,
        definedby=definedby, extra_id_cols=extra,
        evidence_col=evidence_col, source_col=source_col, graph_id=graph_id,
    )
    a = with_assoc_id(staged, disease_col, "_pred", phenotype_col, definedby=definedby, extra_cols=extra)
    parts = [base]
    for col, term in ((onset_col, T.ONSET), (frequency_col, T.FREQUENCY)):
        if col is not None:
            parts.append(
                make_triples(
                    a.filter(F.col(col).isNotNull() & (F.col(col) != "")),
                    "assoc_id", F.lit(term), col, graph_id=graph_id,
                )
            )
    return union_graphs(*parts)


def g2p_association_triples(
    df: DataFrame,
    genotype_col: str = "genotype_id",
    phenotype_col: str = "phenotype_id",
    predicate_col: str | Column = "predicate",
    *,
    qualifier_col: str | None = None,
    stage_col: str | None = None,
    evidence_col: str | None = None,
    source_col: str | None = None,
    definedby: str = "MONARCH",
    graph_id: str | None = None,
) -> DataFrame:
    """G2PAssoc (dipper/models/assoc/G2PAssoc.py:25-138): genotype→phenotype
    association with optional stage/qualifier decorations on the assoc node."""
    pred = F.col(predicate_col) if isinstance(predicate_col, str) else predicate_col
    staged = df.withColumn("_pred", pred)
    extra = [c for c in (qualifier_col, stage_col) if c is not None]
    base = association_triples(
        staged, genotype_col, "_pred", phenotype_col,
        definedby=definedby, extra_id_cols=extra,
        evidence_col=evidence_col, source_col=source_col, graph_id=graph_id,
    )
    a = with_assoc_id(staged, genotype_col, "_pred", phenotype_col, definedby=definedby, extra_cols=extra)
    parts = [base]
    for col, term in ((qualifier_col, T.HAS_QUALIFIER), (stage_col, T.PART_OF)):
        if col is not None:
            parts.append(
                make_triples(
                    a.filter(F.col(col).isNotNull() & (F.col(col) != "")),
                    "assoc_id", F.lit(term), col, graph_id=graph_id,
                )
            )
    return union_graphs(*parts)


def orthology_triples(
    df: DataFrame,
    gene1_col: str = "gene1",
    gene2_col: str = "gene2",
    rel_col: str | Column | None = None,
    *,
    family_col: str | None = None,
    graph_id: str | None = None,
) -> DataFrame:
    """OrthologyAssoc (dipper/models/assoc/OrthologyAssoc.py:10-45):
    gene1 orthologous-to gene2 (+ both members of a family collection)."""
    rel = (
        F.lit(T.ORTHOLOGOUS_TO)
        if rel_col is None
        else (F.col(rel_col) if isinstance(rel_col, str) else rel_col)
    )
    parts = [make_triples(df, gene1_col, rel, gene2_col, is_literal=False, graph_id=graph_id)]
    if family_col is not None:
        fam = df.filter(F.col(family_col).isNotNull())
        parts.append(make_triples(fam, gene1_col, F.lit(T.MEMBER_OF), family_col, graph_id=graph_id))
        parts.append(make_triples(fam, gene2_col, F.lit(T.MEMBER_OF), family_col, graph_id=graph_id))
        parts.append(make_triples(fam, family_col, F.lit(T.TYPE), F.lit(T.GENE_FAMILY), graph_id=graph_id))
    return union_graphs(*parts)


def interaction_triples(
    df: DataFrame,
    a_col: str = "gene1",
    b_col: str = "gene2",
    *,
    canonicalize: bool = True,
    graph_id: str | None = None,
) -> DataFrame:
    """InteractionAssoc (InteractionAssoc.py:8-30) with StringDB's symmetric
    canonicalization (StringDB.py:200-208, J7): order the endpoint pair
    lexicographically so only one direction of the symmetric edge is emitted,
    then set-dedup."""
    a, b = F.col(a_col), F.col(b_col)
    if canonicalize:
        df = df.select(
            F.least(a, b).alias("_lo"), F.greatest(a, b).alias("_hi"),
        )
        return union_graphs(make_triples(df, "_lo", F.lit(T.INTERACTS_WITH), "_hi", is_literal=False, graph_id=graph_id))
    return union_graphs(make_triples(df, a_col, F.lit(T.INTERACTS_WITH), b_col, is_literal=False, graph_id=graph_id))
