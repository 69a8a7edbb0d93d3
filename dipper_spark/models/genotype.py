"""GENO genotype part-hierarchy emitters.

Reference: dipper/models/Genotype.py:36-657 — 30+ ``add*`` methods that all
reduce to a small set of triple shapes: entity typing+label (addGenotype,
addAllele, addGene, addSequenceAlteration...), partonomy edges
(addParts/addPartsToVSLC/addVSLCtoParent → GENO has_variant_part /
has_reference_part / BFO has_part), zygosity (addZygosity? via
GENO:0000608), affected-feature links (addAffectedLocus → GENO:0000418) and
taxon links (addTaxon → RO:0002162).

Spark-first: the DAG is rows, not method calls — one staged DataFrame per
relationship shape, each expanded by a narrow select.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dipper_spark.core.triples import make_triples, union_graphs
from dipper_spark.models import terms as T
from dipper_spark.models.model import entity_triples


def genotype_part_triples(
    df: DataFrame,
    part_col: str,
    whole_col: str,
    relation: str | Column = T.HAS_PART,
    *,
    part_type: str | None = None,
    graph_id: str | None = None,
) -> DataFrame:
    """Genotype.addParts (Genotype.py): ``whole <relation> part`` (the
    reference's default relationship is has_part; VSLC/locus edges pass
    GENO:0000382 has_variant_part etc.).  Optionally types the part node."""
    rel = F.lit(relation) if isinstance(relation, str) else relation
    parts = [make_triples(df, whole_col, rel, part_col, is_literal=False, graph_id=graph_id)]
    if part_type is not None:
        parts.append(
            make_triples(df, part_col, F.lit(T.TYPE), F.lit(part_type), is_literal=False, graph_id=graph_id)
        )
    return union_graphs(*parts)


def vslc_triples(
    df: DataFrame,
    vslc_col: str = "vslc_id",
    allele1_col: str = "allele1",
    allele2_col: str | None = "allele2",
    zygosity_col: str | None = "zygosity",
    genotype_col: str | None = "genotype_id",
    *,
    label_col: str | None = None,
    graph_id: str | None = None,
) -> DataFrame:
    """Genotype.addPartsToVSLC + addVSLCtoParent: the variant-single-locus-
    complement stanza —

    vslc rdf:type GENO:0000030 (+label)
    vslc GENO:0000382 allele1 [, allele2 when present]
    vslc GENO:0000608 zygosity        (when known)
    genotype BFO:0000051 vslc         (when a parent genotype is given)
    """
    g = graph_id
    parts = [entity_triples(df, vslc_col, rdf_type=T.VSLC, label_col=label_col, graph_id=g)]
    parts.append(
        make_triples(
            df.filter(F.col(allele1_col).isNotNull()),
            vslc_col, F.lit(T.HAS_VARIANT_PART), allele1_col, is_literal=False, graph_id=g,
        )
    )
    if allele2_col is not None:
        parts.append(
            make_triples(
                df.filter(F.col(allele2_col).isNotNull()),
                vslc_col, F.lit(T.HAS_VARIANT_PART), allele2_col, is_literal=False, graph_id=g,
            )
        )
    if zygosity_col is not None:
        parts.append(
            make_triples(
                df.filter(F.col(zygosity_col).isNotNull()),
                vslc_col, F.lit(T.HAS_ZYGOSITY), zygosity_col, is_literal=False, graph_id=g,
            )
        )
    if genotype_col is not None:
        parts.append(
            make_triples(
                df.filter(F.col(genotype_col).isNotNull()),
                genotype_col, F.lit(T.HAS_PART), vslc_col, is_literal=False, graph_id=g,
            )
        )
    return union_graphs(*parts)


def taxon_triples(df: DataFrame, entity_col: str, taxon_col: str,
                  graph_id: str | None = None) -> DataFrame:
    """Genotype.addTaxon → RO:0002162 in-taxon."""
    return make_triples(
        df.filter(F.col(taxon_col).isNotNull()),
        entity_col, F.lit(T.IN_TAXON), taxon_col, is_literal=False, graph_id=graph_id,
    )


def affected_locus_triples(df: DataFrame, allele_col: str, gene_col: str,
                           graph_id: str | None = None) -> DataFrame:
    """Genotype.addAffectedLocus → GENO:0000418 has-affected-feature."""
    return make_triples(
        df.filter(F.col(gene_col).isNotNull()),
        allele_col, F.lit(T.HAS_AFFECTED_FEATURE), gene_col, is_literal=False, graph_id=graph_id,
    )
