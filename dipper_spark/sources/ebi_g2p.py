"""EBI Gene2Phenotype pipeline: DDG2P gene-variant-disease models.

Reference behavior: dipper/sources/EBIGene2Phen.py:154-302 —
per row: disease = OMIM id or the curated MONDO map for 'No disease mim'
labels; relation from the DDD category localtt; a consequence other than
'uncertain' mints a digest-bnode variant ('<consequence> variant of
<symbol>') typed variant_locus with affected-locus + anonymous marks and a
has_molecular/functional_consequence edge (dispatch per
``_get_consequence_predicate``); the G2P assoc subject is the variant when
present else the gene; allelic requirement decorates gene-level assocs;
pmids are ';'-split sources.  Placeholder terms (':'-prefixed) get their
underscore-stripped labels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.ids import make_id
from dipper_spark.core.vocab import TranslationTable
from dipper_spark.models import association_triples, individual_triples
from dipper_spark.models import terms as T
from dipper_spark.models.assoc import with_assoc_id
from dipper_spark.sources.base import FileContract, SourcePipeline, register

VARIANT_LOCUS = "GENO:0000002"
ANONYMOUS = "MONARCH:anonymous"
HAS_ALLELIC_REQUIREMENT = ":has_allelic_requirement"
HAS_MOLECULAR_CONSEQUENCE = ":has_molecular_consequence"
HAS_FUNCTIONAL_CONSEQUENCE = ":has_functional_consequence"

#: consequences dispatched to has_functional_consequence; the rest are
#: molecular (EBIGene2Phen._get_consequence_predicate, 283-302)
FUNCTIONAL_CONSEQUENCES = (
    "activating", "dominant negative", "increased gene dosage", "loss of function",
)

_TT = TranslationTable.for_source("ebi_g2p")

DDG2P_COLUMNS = [
    "gene_symbol", "gene_omim_id", "disease_label", "disease_omim_id",
    "g2p_relation_label", "allelic_requirement", "mutation_consequence",
    "phenotypes", "organ_specificity_list", "pmids", "panel",
    "prev_symbols", "hgnc_id", "entry_date",
]


def _resolve_lit(key: Column) -> Column:
    """localtt ∘ globaltt resolve as a literal map expression."""
    pairs = {}
    for k, label in _TT.localtt.items():
        pairs[k] = _TT.globaltt.get(label, label)
    return F.element_at(
        F.create_map(*[F.lit(x) for kv in pairs.items() for x in kv]), key
    )


@register
class EbiGene2PhenPipeline(SourcePipeline):
    name = "ebi_g2p"
    files = {
        "developmental_disorders": FileContract(
            file="DDG2P.csv.gz",
            url="https://www.ebi.ac.uk/gene2phenotype/downloads/DDG2P.csv.gz",
            columns=DDG2P_COLUMNS,
        ),
        # curated disease-label → MONDO map for rows with no OMIM id
        "mondo_map": FileContract(
            file="unmapped_ebi_diseases.tsv",
            url="https://data.monarchinitiative.org/dipper/cache/unmapped_ebi_diseases.tsv",
            columns=["disease_label", "mondo_id"],
        ),
    }
    test_ids = ["HGNC:17"]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        import os

        g = self.name
        rows = (
            spark.read.option("header", True)
            .csv(self.path(raw_dir, "developmental_disorders"))
            .toDF(*DDG2P_COLUMNS)
        )
        if limit:
            rows = rows.limit(limit)
        rows = rows.select(
            F.concat(F.lit("HGNC:"), "hgnc_id").alias("gene_id"),
            "gene_symbol", "disease_label", "disease_omim_id",
            _resolve_lit(F.col("g2p_relation_label")).alias("relation"),
            F.col("mutation_consequence").alias("consequence"),
            F.col("allelic_requirement"),
            F.col("pmids"),
        )
        rows = self.test_filter(rows, "gene_id", test_mode)

        # disease: OMIM, else curated MONDO map, else dropped (sorry)
        mondo_path = self.path(raw_dir, "mondo_map")
        if os.path.exists(mondo_path):
            mondo = (
                spark.read.option("sep", "\t")
                .schema("disease_label string, mondo_id string")
                .csv(mondo_path)
            )
            rows = rows.join(F.broadcast(mondo), "disease_label", "left")
        else:
            rows = rows.withColumn("mondo_id", F.lit(None).cast("string"))
        rows = (
            rows.withColumn(
                "disease_id",
                F.when(
                    F.col("disease_omim_id") != "No disease mim",
                    F.concat(F.lit("OMIM:"), "disease_omim_id"),
                ).otherwise(F.col("mondo_id")),
            )
            .filter(F.col("disease_id").isNotNull() & F.col("relation").isNotNull())
            .withColumn(
                "is_variant",
                ~F.coalesce(F.col("consequence"), F.lit("")).isin("uncertain", ""),
            )
            .withColumn(
                "variant_label",
                F.when(
                    F.col("is_variant"),
                    F.concat_ws(" ", "consequence", F.lit("variant of"), "gene_symbol"),
                ).otherwise(F.concat(F.lit("variant of "), "gene_symbol")),
            )
            .withColumn("variant_bnode", make_id("variant_label", prefix="_"))
            .withColumn(
                "consequence_rel",
                F.when(
                    F.col("is_variant"),
                    F.when(
                        F.col("consequence").isin(*FUNCTIONAL_CONSEQUENCES),
                        F.lit(HAS_FUNCTIONAL_CONSEQUENCE),
                    ).otherwise(F.lit(HAS_MOLECULAR_CONSEQUENCE)),
                ),
            )
            .withColumn("consequence_id", F.when(F.col("is_variant"), _resolve_lit(F.col("consequence"))))
            .withColumn(
                "requirement_id",
                F.when(
                    F.col("allelic_requirement").isNotNull()
                    & (F.col("allelic_requirement") != ""),
                    _resolve_lit(F.col("allelic_requirement")),
                ),
            )
            .withColumn(
                "subject_id",
                F.when(F.col("is_variant"), F.col("variant_bnode")).otherwise(F.col("gene_id")),
            )
            .withColumn(
                "source",
                F.when(
                    F.col("pmids").isNotNull() & (F.col("pmids") != ""),
                    F.transform(F.split("pmids", ";"), lambda x: F.concat(F.lit("PMID:"), x)),
                ),
            )
            .withColumn("_pred", F.col("relation"))
        )
        variants = rows.filter("is_variant")
        # ':'-prefixed placeholder terms carry their own labels
        placeholders = (
            variants.select(F.col("consequence_id").alias("pid"))
            .union(rows.filter(~F.col("is_variant") & F.col("requirement_id").isNotNull())
                   .select(F.col("requirement_id").alias("pid")))
            .filter(F.col("pid").startswith(":"))
            .distinct()
            .withColumn(
                "plabel",
                F.regexp_replace(F.regexp_replace("pid", "^:", ""), "_", " "),
            )
        )
        gene_level = rows.filter(~F.col("is_variant") & F.col("requirement_id").isNotNull())
        return union_graphs(
            individual_triples(
                variants, "variant_bnode", F.lit(VARIANT_LOCUS),
                label_col="variant_label", graph_id=g,
            ),
            make_triples(variants, "variant_bnode", F.col("consequence_rel"), "consequence_id", is_literal=False, graph_id=g),
            make_triples(variants, "variant_bnode", F.lit(T.HAS_AFFECTED_FEATURE), "gene_id", is_literal=False, graph_id=g),
            make_triples(
                variants, "variant_bnode", F.lit(ANONYMOUS), F.lit("true"),
                is_literal=True, datatype="xsd:boolean", graph_id=g,
            ),
            association_triples(
                rows, "subject_id", "_pred", "disease_id",
                definedby=g, source_col="source", graph_id=g,
            ),
            make_triples(
                with_assoc_id(gene_level, "subject_id", "_pred", "disease_id", definedby=g),
                "assoc_id", F.lit(HAS_ALLELIC_REQUIREMENT), "requirement_id",
                is_literal=False, graph_id=g,
            ),
            make_triples(placeholders, "pid", F.lit(T.LABEL), "plabel", is_literal=True, graph_id=g),
        ).dropDuplicates(["subject", "predicate", "object"])
