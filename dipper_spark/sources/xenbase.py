"""Xenbase pipeline: gene→XPO phenotype assertions, genepage→gene fan-out,
literature mentions.

Reference behavior: dipper/sources/Xenbase.py —
``_parse_g2p_file`` (106-168: OBAN-shaped tab export; relation
``RO_nnn``→``RO:nnn`` underscore fix, evidence + journal-article source on
the association), ``_parse_genepage2gene`` (170-210: each gene page maps to
its tropicalis/laevis-L/laevis-S genes, all emitted as gene classes),
``_parse_gene_literature`` (212-246: comma-separated gene pages per paper →
``PMID IAO:mentions gene`` through the genepage map).

Spark-first: the genepage dict becomes a broadcast dim; the per-paper
gene-page loop is explode → join → explode over the three per-page genes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import class_triples, g2p_association_triples
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

GENE = "SO:0000704"
MENTIONS = "IAO:0000142"
JOURNAL_ARTICLE = "IAO:0000013"

OBAN_COLS = [
    "SUBJECT", "SUBJECT_LABEL", "SUBJECT_TAXON", "SUBJECT_TAXON_LABEL",
    "OBJECT", "OBJECT_LABEL", "RELATION", "RELATION_LABEL",
    "EVIDENCE", "EVIDENCE_LABEL", "SOURCE", "IS_DEFINED_BY", "QUALIFIER",
]


@register
class XenbasePipeline(SourcePipeline):
    name = "xenbase"
    files = {
        "g2p_assertions": FileContract(
            file="xb_xpo_spo_v_v1.tab",
            url="https://archive.monarchinitiative.org/DipperCache/xenbase/xb_xpo_spo_v_v1.tab",
            columns=OBAN_COLS,
        ),
        "gene_literature": FileContract(
            file="LiteratureMatchedGenesByPaper.txt",
            url="http://ftp.xenbase.org/pub/GenePageReports/LiteratureMatchedGenesByPaper.txt",
            columns=["xb_article", "pmid", "gene_pages"],
        ),
        "genepage2gene": FileContract(
            file="XenbaseGenepageToGeneIdMapping.txt",
            url="http://ftp.xenbase.org/pub/GenePageReports/XenbaseGenepageToGeneIdMapping.txt",
            columns=[
                "gene_page_id", "gene_page_label",
                "tropicalis_id", "tropicalis_label",
                "laevis_l_id", "laevis_l_label",
                "laevis_s_id", "laevis_s_label",
            ],
        ),
    }
    test_ids = ["Xenbase:XB-GENE-1000632"]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        import os

        from dipper_spark.io.readers import read_delim

        g = self.name
        parts: list[DataFrame] = []

        g2p = read_delim(
            spark, self.path(raw_dir, "g2p_assertions"), OBAN_COLS,
            header=True, src_key="g2p_assertions", limit=limit,
        ).select(
            F.col("SUBJECT").alias("gene_id"),
            F.col("SUBJECT_LABEL").alias("gene_label"),
            F.col("SUBJECT_TAXON").alias("tax_id"),
            F.col("OBJECT").alias("phenotype_id"),
            # 'RO_0002200' arrives underscore-separated (Xenbase.py:144)
            F.regexp_replace("RELATION", "_", ":").alias("relation"),
            F.when(F.col("EVIDENCE") != "", F.array("EVIDENCE")).alias("evidence"),
            F.when(F.col("SOURCE") != "", F.col("SOURCE")).alias("src"),
        )
        g2p = self.test_filter(g2p, "gene_id", test_mode)
        parts += [
            class_triples(
                g2p.withColumn("parent", F.lit(GENE)).select(
                    "gene_id", "gene_label", "parent"
                ).distinct(),
                "gene_id", label_col="gene_label", subclass_of_col="parent", graph_id=g,
            ),
            make_triples(g2p, "gene_id", F.lit(T.IN_TAXON), "tax_id", is_literal=False, graph_id=g),
            make_triples(
                g2p.filter(F.col("src").isNotNull()).select("src").distinct(),
                "src", F.lit(T.TYPE), F.lit(JOURNAL_ARTICLE), is_literal=False, graph_id=g,
            ),
            g2p_association_triples(
                g2p.withColumn("source", F.when(F.col("src").isNotNull(), F.array("src"))),
                "gene_id", "phenotype_id", F.col("relation"),
                evidence_col="evidence", source_col="source", definedby=g, graph_id=g,
            ),
        ]

        pages_path = self.path(raw_dir, "genepage2gene")
        if os.path.exists(pages_path):
            pages = read_delim(
                spark, pages_path, self.files["genepage2gene"].columns,
                header=False, src_key="genepage2gene", limit=limit,
            ).select(
                F.col("gene_page_id").alias("gene_page_id"),
                F.array(
                    F.struct(F.concat(F.lit("Xenbase:"), "tropicalis_id").alias("id"),
                             F.col("tropicalis_label").alias("label")),
                    F.struct(F.concat(F.lit("Xenbase:"), "laevis_l_id").alias("id"),
                             F.col("laevis_l_label").alias("label")),
                    F.struct(F.concat(F.lit("Xenbase:"), "laevis_s_id").alias("id"),
                             F.col("laevis_s_label").alias("label")),
                ).alias("genes"),
            )
            page_genes = pages.select("gene_page_id", F.explode("genes").alias("gn")).select(
                "gene_page_id", F.col("gn.id").alias("gene_id"), F.col("gn.label").alias("gene_label")
            )
            parts.append(
                class_triples(
                    page_genes.withColumn("parent", F.lit(GENE)),
                    "gene_id", label_col="gene_label", subclass_of_col="parent", graph_id=g,
                )
            )
            lit_path = self.path(raw_dir, "gene_literature")
            if os.path.exists(lit_path):
                lit = read_delim(
                    spark, lit_path, self.files["gene_literature"].columns,
                    header=False, src_key="gene_literature", limit=limit,
                ).select(
                    F.concat(F.lit("PMID:"), "pmid").alias("pmid"),
                    F.explode(F.split("gene_pages", ",")).alias("page_raw"),
                ).withColumn(
                    # 'XB-GENEPAGE-123 symbol' → id token (Xenbase.py:236-237)
                    "gene_page_id", F.split(F.trim("page_raw"), " ").getItem(0)
                )
                mentions = lit.join(F.broadcast(page_genes), "gene_page_id")
                parts.append(
                    make_triples(mentions, "pmid", F.lit(MENTIONS), "gene_id", is_literal=False, graph_id=g)
                )
        return union_graphs(*parts).dropDuplicates(["subject", "predicate", "object"])
