"""UDP (Undiagnosed Diseases Program) variant→gene disambiguation pipeline.

Reference behavior: dipper/sources/UDP.py:330-446
(``_add_variant_gene_relationship``): each patient variant lists candidate
genes; a gene whose ``[start, end]`` interval contains the variant position
is the affected locus (GENO:0000418 has_affected_feature), genes up/downstream
or without coordinates are only causally influenced (RO:0002566); variant
bnodes are deterministic digests and get ``build-chr:pos ref>alt (GENE)``
labels.  Gene coordinates come from ``_parse_gene_coordinates`` (UDP.py:628-648).

Spark-first: the reference's per-variant Python loop over a coordinate dict
is a **point-in-interval range join** (J5, operators.range_join):
``variants ⋈ genes ON v.chrom = g.chrom AND g.start <= v.pos <= g.end`` —
Catalyst executes the equality on chrom as the shuffle key and the interval
predicate as a post-join filter, so it scales as a partitioned join, not a
broadcast dict probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.ids import make_id
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

HAS_AFFECTED_FEATURE = "GENO:0000418"
CAUSALLY_INFLUENCES = "RO:0002566"
SEQUENCE_ALTERATION = "SO:0001059"


@register
class UdpPipeline(SourcePipeline):
    name = "udp"
    files = {
        "variants": FileContract(
            file="udp_variants.tsv",
            url="https://udp.example/variants.tsv",  # staged export (UDP.py variant map)
            columns=["patient", "build", "chromosome", "position",
                     "reference_allele", "variant_allele", "type", "genes_of_interest"],
        ),
        "gene_coordinates": FileContract(
            file="gene_coordinates.tsv",
            url="https://udp.example/gene_coordinates.tsv",
            columns=["gene_symbol", "chromosome", "start", "end", "strand"],
        ),
    }
    test_ids = ["P0001"]

    def _read(self, spark: SparkSession, raw_dir: str, key: str) -> DataFrame:
        cols = self.files[key].columns
        schema = " ".join(f"`{c}` string," for c in cols).rstrip(",")
        return (
            spark.read.option("sep", "\t").option("header", True).schema(schema)
            .csv(self.path(raw_dir, key))
        )

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        variants = self._read(spark, raw_dir, "variants")
        variants = self.test_filter(variants, "patient", test_mode)
        if limit:
            variants = variants.limit(limit)

        v = (
            variants.withColumn(
                "variant_key",
                F.concat_ws("-", "build", "chromosome", "position", "reference_allele", "variant_allele"),
            )
            .withColumn("variant_bnode", make_id(F.col("variant_key"), prefix="_"))
            .withColumn("pos", F.col("position").cast("long"))
            .withColumn("gene", F.explode(F.split("genes_of_interest", ",")))
            .withColumn("gene", F.trim("gene"))
            .withColumn(
                "n_genes", F.size(F.split("genes_of_interest", ","))
            )
        )
        genes = self._read(spark, raw_dir, "gene_coordinates").select(
            F.col("gene_symbol").alias("gene"),
            F.col("chromosome").alias("g_chrom"),
            F.col("start").cast("long").alias("g_start"),
            F.col("end").cast("long").alias("g_end"),
            F.col("strand").alias("g_strand"),
        )

        # J5 range join: coordinates attach only where the gene is known AND
        # the variant falls inside the interval; a left join keeps the
        # coordinate-less candidates for the causally-influences branch
        joined = v.join(genes, "gene", "left").withColumn(
            "in_interval",
            (F.col("g_chrom") == F.col("chromosome"))
            & (F.col("g_start") <= F.col("pos"))
            & (F.col("pos") <= F.col("g_end")),
        )

        classified = joined.withColumn(
            "relation",
            # single candidate → affected feature regardless of coordinates
            # (UDP.py:358-365); containing interval → affected feature;
            # up/down-stream or unknown coords → causally influences
            F.when(F.col("n_genes") == 1, F.lit(HAS_AFFECTED_FEATURE))
            .when(F.coalesce("in_interval", F.lit(False)), F.lit(HAS_AFFECTED_FEATURE))
            .otherwise(F.lit(CAUSALLY_INFLUENCES)),
        ).withColumn("gene_curie", F.concat(F.lit("HGNC_SYMBOL:"), F.col("gene")))

        affected = classified.filter(F.col("relation") == HAS_AFFECTED_FEATURE)
        labels = affected.withColumn(
            "variant_label",
            F.concat(
                F.col("build"), F.lit("-"), F.col("chromosome"), F.lit(":"),
                F.col("position"), F.col("reference_allele"), F.lit(">"),
                F.col("variant_allele"), F.lit(" ("), F.col("gene"), F.lit(")"),
            ),
        )

        return union_graphs(
            make_triples(v.dropDuplicates(["variant_bnode"]), "variant_bnode", F.lit(T.TYPE), F.lit(SEQUENCE_ALTERATION), graph_id=g),
            make_triples(classified, "variant_bnode", F.col("relation"), "gene_curie", is_literal=False, graph_id=g),
            make_triples(labels, "variant_bnode", F.lit(T.LABEL), "variant_label", is_literal=True, graph_id=g),
        ).dropDuplicates(["subject", "predicate", "object"])
