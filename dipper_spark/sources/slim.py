"""Slim G2P pipelines: MGISlim (mousemine export) and ZFINSlim (clean
pheno-gene file through the ZP octuple map).

Reference behavior:
- dipper/sources/MGISlim.py:45-131 — iterates the mousemine intermine API
  (OntologyAnnotation query over MPTerms); per row: gene typed, mouse taxon,
  G2P assoc with PMID journal-article source and experimental-phenotypic-
  evidence ECO.  The API pagination is a staging concern; the engine scans
  the staged export (the reference's query view, one row per annotation).
- dipper/sources/ZFINSlim.py:84-163 — phenoGeneCleanData_fish rows with
  modifier 'abnormal' mapped through ZFIN's EQ-octuple→ZP digest map
  (reuses zfin.zp_key); gene makeLeader, document-typed pub source,
  experimental-phenotypic-evidence ECO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import g2p_association_triples, reference_triples
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register
from dipper_spark.sources.zfin import ZfinPipeline, zp_key

GENE = "SO:0000704"
MOUSE = "NCBITaxon:10090"
EXP_PHENO_EVIDENCE = "ECO:0000059"  # experimental phenotypic evidence
JOURNAL_ARTICLE = "IAO:0000013"
DOCUMENT = "IAO:0000310"

MGISLIM_COLUMNS = [
    "gene_id", "symbol", "so_name", "mp_id", "mp_name",
    "pmid", "comment_type", "comment_desc",
]


@register
class MgiSlimPipeline(SourcePipeline):
    name = "mgislim"
    files = {
        "annotations": FileContract(
            file="mousemine_mp_annotations.tsv",
            url="http://www.mousemine.org/mousemine/service",
            columns=MGISLIM_COLUMNS,
        ),
    }
    test_ids = ["MGI:97486"]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        from dipper_spark.io.readers import read_delim

        g = self.name
        rows = read_delim(
            spark, self.path(raw_dir, "annotations"), MGISLIM_COLUMNS,
            header=True, src_key="annotations", limit=limit,
        ).select(
            F.col("gene_id").alias("gene_curie"),
            F.col("mp_id").alias("mp_curie"),
            F.when(
                F.col("pmid").isNotNull() & (F.col("pmid") != ""),
                F.concat(F.lit("PMID:"), "pmid"),
            ).alias("pub_curie"),
        )
        rows = self.test_filter(rows, "gene_curie", test_mode)
        rows = rows.withColumn(
            "evidence", F.array(F.lit(EXP_PHENO_EVIDENCE))
        ).withColumn("source", F.when(F.col("pub_curie").isNotNull(), F.array("pub_curie")))
        return union_graphs(
            make_triples(rows, "gene_curie", F.lit(T.TYPE), F.lit(GENE), is_literal=False, graph_id=g),
            make_triples(rows, "gene_curie", F.lit(T.IN_TAXON), F.lit(MOUSE), is_literal=False, graph_id=g),
            reference_triples(
                rows.filter(F.col("pub_curie").isNotNull()).select("pub_curie").distinct(),
                "pub_curie", type_col=JOURNAL_ARTICLE, graph_id=g,
            ),
            g2p_association_triples(
                rows, "gene_curie", "mp_curie", F.lit("RO:0002200"),
                evidence_col="evidence", source_col="source", definedby=g, graph_id=g,
            ),
        ).dropDuplicates(["subject", "predicate", "object"])


CLEAN_PHENO_COLUMNS = [
    "ID", "Gene Symbol", "Gene ID",
    "Affected Structure or Process 1 subterm ID",
    "Affected Structure or Process 1 subterm Name",
    "Post-composed Relationship ID", "Post-composed Relationship Name",
    "Affected Structure or Process 1 superterm ID",
    "Affected Structure or Process 1 superterm Name",
    "Phenotype Keyword ID", "Phenotype Keyword Name", "Phenotype Tag",
    "Affected Structure or Process 2 subterm ID",
    "Affected Structure or Process 2 subterm name",
    "Post-composed Relationship (rel) ID",
    "Post-composed Relationship (rel) Name",
    "Affected Structure or Process 2 superterm ID",
    "Affected Structure or Process 2 superterm name",
    "Fish ID", "Fish Display Name", "Start Stage ID", "End Stage ID",
    "Fish Environment ID", "Publication ID", "Figure ID",
]

#: the octuple key column order used by zfin.zp_key (ZFIN.py:2818-2826)
_OCTUPLE_SRC = [
    "Affected Structure or Process 1 subterm ID",
    "Post-composed Relationship ID",
    "Affected Structure or Process 1 superterm ID",
    "Phenotype Keyword ID",
    "Affected Structure or Process 2 subterm ID",
    "Post-composed Relationship (rel) ID",
    "Affected Structure or Process 2 superterm ID",
]
ABNORMAL = "PATO:0000460"


@register
class ZfinSlimPipeline(SourcePipeline):
    name = "zfinslim"
    files = {
        "g2p_clean": FileContract(
            file="phenoGeneCleanData_fish.txt",
            url="https://zfin.org/downloads/phenoGeneCleanData_fish.txt",
            columns=CLEAN_PHENO_COLUMNS,
        ),
        "zpmap": ZfinPipeline.files["zpmap"],
    }
    test_ids = ["ZFIN:ZDB-GENE-980526-166"]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        cols = CLEAN_PHENO_COLUMNS
        schema = " ".join(f"`{c}` string," for c in cols).rstrip(",")
        raw = spark.read.option("sep", "\t").schema(schema).csv(
            self.path(raw_dir, "g2p_clean")
        )
        if limit:
            raw = raw.limit(limit)
        staged = raw.select(
            F.concat(F.lit("ZFIN:"), F.trim(F.col("Gene ID"))).alias("gene_curie"),
            F.trim(F.col("Phenotype Tag")).alias("modifier"),
            *[
                F.coalesce(F.trim(F.col(c)), F.lit("")).alias(f"k{i}")
                for i, c in enumerate(_OCTUPLE_SRC)
            ],
            F.when(
                F.trim(F.col("Publication ID")) != "",
                F.concat(F.lit("ZFIN:"), F.trim(F.col("Publication ID"))),
            ).alias("pub_curie"),
        ).filter(F.col("modifier") == "abnormal").withColumn(
            "mod_id", F.lit(ABNORMAL)
        )
        staged = self.test_filter(staged, "gene_curie", test_mode)
        keyed = staged.withColumn(
            "_zpkey", zp_key([f"k{i}" for i in range(7)] + ["mod_id"])
        )
        zp = F.broadcast(ZfinPipeline().zp_map(spark, raw_dir))
        rows = (
            keyed.join(zp, "_zpkey")
            .withColumn("evidence", F.array(F.lit(EXP_PHENO_EVIDENCE)))
            .withColumn("source", F.when(F.col("pub_curie").isNotNull(), F.array("pub_curie")))
        )
        return union_graphs(
            make_triples(
                rows, "gene_curie", F.lit(T.CLIQUE_LEADER), F.lit("true"),
                is_literal=True, datatype="xsd:boolean", graph_id=g,
            ),
            reference_triples(
                rows.filter(F.col("pub_curie").isNotNull()).select("pub_curie").distinct(),
                "pub_curie", type_col=DOCUMENT, graph_id=g,
            ),
            g2p_association_triples(
                rows, "gene_curie", "zp_id", F.lit("RO:0002200"),
                evidence_col="evidence", source_col="source", definedby=g, graph_id=g,
            ),
        ).dropDuplicates(["subject", "predicate", "object"])
