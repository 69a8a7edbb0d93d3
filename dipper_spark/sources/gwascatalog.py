"""GWAS Catalog pipeline: variant-id classification dispatch + variant→trait
associations.

Reference: dipper/sources/GWASCatalog.py — 37-col ontology-annotated TSV
(42-88), variant id classification ``_get_curie_and_type_from_id`` 577-624
(P10: rs→dbSNP, kgp→GWAS, chr...→bnode, ';'-lists→haplotype bnode,
' x '/','→unparseable), space/'-' scrubs 593-597 (P8), MAPPED_TRAIT_URI
comma-explode, p-value typed literal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_id, make_triples, union_graphs
from dipper_spark.models.assoc import association_triples, with_assoc_id
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

HAS_PHENOTYPE = "RO:0002200"
SNP_CLASS = "SO:0000694"        # SNP
HAPLOTYPE_CLASS = "GENO:0000871"
PVALUE = "OBI:0000175"

GWAS_COLUMNS = [
    "DATE ADDED TO CATALOG", "PUBMEDID", "FIRST AUTHOR", "DATE", "JOURNAL", "LINK",
    "STUDY", "DISEASE/TRAIT", "INITIAL SAMPLE SIZE", "REPLICATION SAMPLE SIZE",
    "REGION", "CHR_ID", "CHR_POS", "REPORTED GENE(S)", "MAPPED_GENE",
    "UPSTREAM_GENE_ID", "DOWNSTREAM_GENE_ID", "SNP_GENE_IDS",
    "UPSTREAM_GENE_DISTANCE", "DOWNSTREAM_GENE_DISTANCE",
    "STRONGEST SNP-RISK ALLELE", "SNPS", "MERGED", "SNP_ID_CURRENT", "CONTEXT",
    "INTERGENIC", "RISK ALLELE FREQUENCY", "P-VALUE", "PVALUE_MLOG",
    "P-VALUE (TEXT)", "OR or BETA", "95% CI (TEXT)", "PLATFORM [SNPS PASSING QC]",
    "CNV", "MAPPED_TRAIT", "MAPPED_TRAIT_URI", "STUDY ACCESSION",
]


def classify_variant(col: Column | str) -> tuple[Column, Column]:
    """``_get_curie_and_type_from_id`` (GWASCatalog.py:577-624) as a pair of
    column expressions (curie, type); both NULL for unparseable ids."""
    v = F.col(col) if isinstance(col, str) else col
    v = F.trim(F.regexp_replace(v, " -", "-"))
    unparseable = v.rlike(" x ") | v.rlike(",") | (v == "")
    is_haplo = v.rlike(";")
    is_rs = v.startswith("rs")
    is_kgp = v.startswith("kgp")
    is_chr = v.startswith("chr")
    curie = (
        F.when(unparseable, F.lit(None).cast("string"))
        .when(is_haplo, F.concat(F.lit(":haplotype_"), F.substring(F.sha1(v), 2, 19)))
        .when(is_rs, F.concat(F.lit("dbSNP:"), F.regexp_replace(F.split(v, "-").getItem(0), " ", "")))
        .when(is_kgp, F.concat(F.lit("GWAS:"), F.split(v, "-").getItem(0)))
        .when(
            is_chr,
            make_id(
                F.concat(F.lit("gwas-"), F.regexp_replace(F.regexp_replace(v, ":", "-"), " ", "")),
                prefix="_",
            ),
        )
    )
    vtype = (
        F.when(unparseable, F.lit(None).cast("string"))
        .when(is_haplo, F.lit("haplotype"))
        .when(is_rs | is_kgp | is_chr, F.lit("snp"))
    )
    return curie, vtype


@register
class GwasCatalogPipeline(SourcePipeline):
    name = "gwascatalog"
    files = {
        "catalog": FileContract(
            file="gwas-catalog-associations_ontology-annotated.tsv",
            url="ftp://ftp.ebi.ac.uk/pub/databases/gwas/releases/latest/",
            columns=GWAS_COLUMNS,
        ),
    }

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        from dipper_spark.io import read_delim

        g = self.name
        df = read_delim(
            spark, self.path(raw_dir, "catalog"), GWAS_COLUMNS, src_key=self.name,
            limit=limit,
        )
        curie, vtype = classify_variant("SNPS")
        rows = (
            df.select(
                curie.alias("variant_id"),
                vtype.alias("variant_type"),
                F.col("SNPS").alias("raw_snp"),
                F.col("MAPPED_TRAIT_URI").alias("trait_uris"),
                F.col("P-VALUE").alias("p_value"),
                F.concat(F.lit("PMID:"), F.col("PUBMEDID")).alias("pmid"),
            )
            .filter(F.col("variant_id").isNotNull())
        )

        typed = make_triples(
            rows,
            "variant_id",
            F.lit(T.TYPE),
            F.when(F.col("variant_type") == "snp", F.lit(SNP_CLASS)).otherwise(F.lit(HAPLOTYPE_CLASS)),
            graph_id=g,
        )

        traits = (
            rows.filter(F.col("trait_uris").isNotNull() & (F.col("trait_uris") != ""))
            .select(
                "variant_id", "p_value", "pmid",
                F.explode(F.split("trait_uris", r",\s*")).alias("trait_iri"),
            )
            .withColumn("predicate", F.lit(HAS_PHENOTYPE))
            .withColumn("sources", F.array("pmid"))
        )
        assoc = association_triples(
            traits, "variant_id", "predicate", "trait_iri", source_col="sources", graph_id=g
        )
        keyed = with_assoc_id(traits, "variant_id", "predicate", "trait_iri")
        pvals = make_triples(
            keyed.filter(F.col("p_value").isNotNull() & (F.col("p_value") != "")),
            "assoc_id", F.lit(PVALUE), "p_value", is_literal=True, datatype="xsd:double",
            graph_id=g,
        )
        return union_graphs(typed, assoc, pvals).dropDuplicates(
            ["subject", "predicate", "object"]
        )
