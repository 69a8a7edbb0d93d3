"""KEGG pipeline: diseases, human genes, OMIM reconciliation (1:1 gate).

Reference behavior: dipper/sources/KEGG.py — ``_process_diseases`` 200-244,
``_process_genes`` 245-340 (first symbol = label, rest synonyms, long name =
definition), ``_process_omim2gene`` 466-560 (equivalent/reverse/original
link-type dispatch; reverse links go through an anonymous variant locus),
``_process_omim2disease`` 560-635 (keep only OMIM↔KEGG disease pairs that
are 1:1 IN BOTH DIRECTIONS), ``_make_variant_locus_id`` (deterministic
bnode + 'some variant of X that is associated with Y' label).

Spark-first: the reference's two direction-hashes + post-pass is the A9
1:1-ness check done relationally — ``groupBy(key).count() == 1`` on each
side, semi-joined back (J11); the label_hash probes are broadcast joins of
the disease/gene label dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.ids import make_id
from dipper_spark.models import class_triples, g2p_association_triples, individual_triples, pairwise_triples
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

GENE = "SO:0000704"
VARIANT_LOCUS = "GENO:0000002"
HAS_AFFECTED_LOCUS = "GENO:0000418"
IS_MARKER_FOR = "RO:0002607"


@register
class KeggPipeline(SourcePipeline):
    name = "kegg"
    files = {
        "disease": FileContract(
            file="disease", url="http://rest.genome.jp/list/disease",
            columns=["disease_id", "disease_name"],
        ),
        "hsa_genes": FileContract(
            file="hsa_genes", url="http://rest.genome.jp/list/hsa",
            columns=["gene_id", "gene_name"],
        ),
        "omim2gene": FileContract(
            file="omim2gene", url="http://rest.genome.jp/link/omim/hsa",
            columns=["kegg_gene_id", "omim_id", "link_type"],
        ),
        "omim": FileContract(
            file="omim2disease", url="http://rest.genome.jp/link/omim/ds",
            columns=["omim_disease_id", "kegg_disease_id", "link_type"],
        ),
    }
    test_ids = ["KEGG-ds:H00021", "KEGG-hsa:100"]

    def _read(self, spark: SparkSession, raw_dir: str, key: str) -> DataFrame:
        cols = self.files[key].columns
        schema = " ".join(f"`{c}` string," for c in cols).rstrip(",")
        return (
            spark.read.option("sep", "\t").option("encoding", "ISO-8859-1")
            .schema(schema).csv(self.path(raw_dir, key))
        )

    def disease_labels(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        return self._read(spark, raw_dir, "disease").select(
            F.concat(F.lit("KEGG-"), F.trim("disease_id")).alias("disease_id"),
            F.col("disease_name").alias("disease_label"),
        )

    def gene_rows(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """First comma-symbol = label, rest = synonyms, ';'-part 2 =
        definition (KEGG.py:290-340)."""
        g = self._read(spark, raw_dir, "hsa_genes").select(
            F.concat(F.lit("KEGG-"), F.trim("gene_id")).alias("gene_id"),
            F.col("gene_name").alias("raw_name"),
        )
        parts = F.split("raw_name", ";")
        symbols = F.split(F.trim(F.get(parts, 0)), ",\\s*")
        return (
            g.withColumn("label", F.get(symbols, 0))
            .withColumn("synonyms", F.when(F.size(symbols) > 1, F.slice(symbols, 2, 1000)))
            .withColumn("definition", F.trim(F.get(parts, 1)))
        )

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        diseases = self.disease_labels(spark, raw_dir)
        genes = self.gene_rows(spark, raw_dir)
        if limit:
            diseases, genes = diseases.limit(limit), genes.limit(limit)

        parts = [
            class_triples(diseases, "disease_id", "disease_label", graph_id=g),
            class_triples(genes, "gene_id", "label", graph_id=g),
            make_triples(genes, "gene_id", F.lit(T.TYPE), F.lit(GENE), graph_id=g),
            make_triples(
                genes.filter(F.col("definition").isNotNull() & (F.col("definition") != "")),
                "gene_id", F.lit(T.DEFINITION), "definition", is_literal=True, graph_id=g,
            ),
        ]
        syn = genes.filter(F.col("synonyms").isNotNull()).select(
            "gene_id", F.explode("synonyms").alias("syn")
        ).filter(F.col("syn") != "")
        parts.append(
            make_triples(syn, "gene_id", F.lit(T.HAS_RELATED_SYNONYM), "syn", is_literal=True, graph_id=g)
        )

        # ---- omim2gene dispatch (KEGG.py:466-560) --------------------------
        o2g = self._read(spark, raw_dir, "omim2gene").select(
            F.concat(F.lit("KEGG-"), F.trim("kegg_gene_id")).alias("kegg_gene_id"),
            F.regexp_replace(F.trim("omim_id"), "omim", "OMIM").alias("omim_id"),
            F.trim("link_type").alias("link_type"),
        )
        equiv = o2g.filter(F.col("link_type") == "equivalent")
        parts += [
            class_triples(equiv, "omim_id", graph_id=g),
            pairwise_triples(equiv, "kegg_gene_id", "omim_id", T.EQUIVALENT_CLASS, graph_id=g),
        ]
        # reverse links: anonymous variant locus between gene and disease
        rev = (
            o2g.filter(F.col("link_type") == "reverse")
            .join(
                F.broadcast(genes.select(F.col("gene_id").alias("kegg_gene_id"), "label")),
                "kegg_gene_id", "left",
            )
            .withColumn(
                "alt_locus_id",
                make_id(
                    F.concat_ws(
                        "-",
                        F.regexp_replace("kegg_gene_id", ":", ""),
                        F.regexp_replace("omim_id", ":", ""),
                        F.lit("VL"),
                    ),
                    prefix="_",
                ),
            )
            .withColumn(
                "alt_label",
                F.when(
                    F.col("label").isNotNull(),
                    F.concat(F.lit("some variant of "), F.col("label")),
                ),
            )
            .withColumn("predicate", F.lit(IS_MARKER_FOR))
        )
        parts += [
            individual_triples(rev, "alt_locus_id", F.lit(VARIANT_LOCUS), label_col="alt_label", graph_id=g),
            make_triples(rev, "alt_locus_id", F.lit(HAS_AFFECTED_LOCUS), "kegg_gene_id", graph_id=g),
            g2p_association_triples(
                rev, "alt_locus_id", "omim_id", "predicate", definedby=self.name, graph_id=g
            ),
        ]
        # 'original' links skipped (KEGG.py:548-552)

        # ---- omim2disease 1:1 reconciliation (KEGG.py:560-635) -------------
        o2d = self._read(spark, raw_dir, "omim").select(
            F.regexp_replace(F.trim("omim_disease_id"), "omim", "OMIM").alias("omim_disease_id"),
            F.concat(F.lit("KEGG-"), F.trim("kegg_disease_id")).alias("kegg_disease_id"),
        ).dropDuplicates()
        # 1:1 in BOTH directions: A9 as groupBy-count semi-joins
        uniq_omim = Window.partitionBy("omim_disease_id")
        uniq_kegg = Window.partitionBy("kegg_disease_id")
        one2one = (
            o2d.withColumn("_n_kegg", F.count(F.lit(1)).over(uniq_omim))
            .withColumn("_n_omim", F.count(F.lit(1)).over(uniq_kegg))
            .filter((F.col("_n_kegg") == 1) & (F.col("_n_omim") == 1))
        )
        parts += [
            class_triples(one2one, "kegg_disease_id", graph_id=g),
            class_triples(one2one, "omim_disease_id", graph_id=g),
            pairwise_triples(one2one, "kegg_disease_id", "omim_disease_id", T.EQUIVALENT_CLASS, graph_id=g),
        ]

        return union_graphs(*parts).dropDuplicates(["subject", "predicate", "object"])
