"""UCSC cytoband pipeline (M6): band-ancestor expansion + interval extent
rollup (A7) + FALDO feature emission.

Reference: dipper/sources/UCSCBands.py — band scan + scaffold classification
271-441, parent-band generation (Monochrom.make_parent_bands,
dipper/sources/Monochrom.py:348-368: ``13q21.31 → 13q21.3, 13q21, 13q2, 13q,
13``), stateful min/max extent accumulation 459-496, graph emission 500-545;
band typing by karyotype notation (Monochrom.getChrPartTypeByNotation,
Monochrom.py:404-434 — note its elif order makes sub-bands match the
``chromosome_band`` branch first; replicated faithfully).

Relational rewrite of the reference's ordered dict-accumulation loop:
``explode(ancestor_prefixes)`` then ``groupBy(chrom, band).agg(min(start),
max(stop))`` — one shuffle, no ordering dependence, scales to any genome
count.  The prefix array is a pure column expression (no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import class_triples, feature_triples
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

STALK = "GENO:0000628"            # globaltt['stalk'] (short arm)
LONG_ARM = "GENO:0000629"
CHROMOSOME_REGION = "GENO:0000614"
CHROMOSOME_BAND = "SO:0000341"
CHROMOSOME_SUBBAND = "GENO:0000616"
CHROMOSOME_PART = "SO:0000830"
CHROMOSOME = "SO:0000340"
ASSEMBLY_COMPONENT = "SO:0000143"
HAS_SEQ_ATTR = "GENO:0000207"
SUBSEQUENCE_OF = "RO:0002525"
PLACED_RE = r"^chr(\d+|X|Y|Z|W|M)$"  # UCSCBands.py:309-313


def band_type_col(band) -> F.Column:
    """getChrPartTypeByNotation (Monochrom.py:404-434), same branch order —
    ``re.match`` is prefix-anchored, so 'q21.31' hits the chromosome_band
    branch before the subband branch ever applies."""
    b = F.col(band) if isinstance(band, str) else band
    return (
        F.when(b == "", F.lit(CHROMOSOME))
        .when(b.rlike(r"^p$"), F.lit(STALK))
        .when(b.rlike(r"^q$"), F.lit(LONG_ARM))
        .when(b.rlike(r"^[pq][A-H\d]$"), F.lit(CHROMOSOME_REGION))
        .when(b.rlike(r"^[pq][A-H\d]\d"), F.lit(CHROMOSOME_BAND))
        .otherwise(F.lit(CHROMOSOME_PART))
    )


@register
class UcscBandsPipeline(SourcePipeline):
    name = "ucscbands"
    files = {
        "bands": FileContract(
            file="cytoBand.txt.gz",
            url="http://hgdownload.soe.ucsc.edu/goldenPath/hg19/database/cytoBand.txt.gz",
            columns=["chrom", "chromStart", "chromEnd", "name", "gieStain"],
        ),
    }
    tax_num = "9606"
    build_num = "hg19"

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        from dipper_spark.io import read_delim

        g = self.name
        cols = self.files["bands"].columns
        df = read_delim(
            spark, self.path(raw_dir, "bands"), cols, header=False,
            comment="#", src_key=self.name, limit=limit,
        )

        # placed scaffolds only at the band level (UCSCBands.py:307-313,384);
        # unlocalized/unplaced become assembly components below
        placed = (
            df.filter(F.col("chrom").rlike(PLACED_RE))
            .select(
                F.regexp_replace("chrom", "^chr", "").alias("chrom_num"),
                F.col("chromStart").cast("long").alias("start"),
                F.col("chromEnd").cast("long").alias("stop"),
                F.coalesce(F.trim("name"), F.lit("")).alias("band"),
                F.col("gieStain").alias("stain"),
            )
        )

        # ancestor prefixes as a pure column expression: substrings of the
        # band name, '.'-stripped, + '' for the chromosome itself
        # (Monochrom.make_parent_bands, Monochrom.py:348-368)
        with_anc = placed.withColumn(
            "ancestors",
            F.expr(
                "array_distinct(concat(array(''), "
                "filter(transform(sequence(1, greatest(length(band)-1, 1)), "
                "i -> regexp_replace(substr(band, 1, i), '\\\\.$', '')), "
                "p -> p rlike '^[pq]')))"
            ),
        )

        # leaf bands keep their stain; grouping bands/chrom roll up extents
        leaves = placed.select("chrom_num", "band", "start", "stop", "stain")
        groups = (
            with_anc.select(
                "chrom_num", F.explode("ancestors").alias("band"), "start", "stop"
            )
            .groupBy("chrom_num", "band")
            .agg(F.min("start").alias("start"), F.max("stop").alias("stop"))
            .withColumn("stain", F.lit(None).cast("string"))
            # a grouping key that equals a real band row (e.g. 'p' both leaf
            # and ancestor) defers to the leaf row
            .join(leaves.select("chrom_num", "band").withColumn("_leaf", F.lit(1)),
                  ["chrom_num", "band"], "left_anti")
        )
        bands = leaves.unionByName(groups).withColumn("btype", band_type_col("band"))

        tax, build = self.tax_num, self.build_num
        keyed = (
            bands.withColumn("key", F.concat_ws("", "chrom_num", "band"))
            .withColumn("class_id", F.concat(F.lit(f":{tax}chr"), F.col("key")))
            .withColumn("build_id", F.concat(F.lit(f":{build}chr"), F.col("key")))
            .withColumn("chrom_in_build", F.concat(F.lit(f":{build}chr"), F.col("chrom_num")))
            .withColumn("label", F.concat(F.lit("chr"), F.col("key"), F.lit(f" ({build})")))
            # immediate parent: band minus last char, '.'-stripped; arms/regions
            # attach to the chromosome (UCSCBands.py:485-496)
            .withColumn(
                "parent_band",
                F.when(F.col("band") == "", F.lit(None)).otherwise(
                    F.regexp_replace(F.expr("substr(band, 1, length(band)-1)"), r"\.$", "")
                ),
            )
            .withColumn(
                "parent_id",
                F.when(F.col("parent_band").isNull(), F.lit(None)).otherwise(
                    F.concat(F.lit(f":{build}chr"), F.col("chrom_num"), F.col("parent_band"))
                ),
            )
        )

        # band classes typed by karyotype notation (UCSCBands.py:509-512)
        classes = class_triples(
            keyed.select(F.col("class_id").alias("id"), F.col("label").alias("lbl")),
            "id", "lbl", graph_id=g,
        ).unionByName(
            make_triples(keyed, "class_id", F.lit(T.SUBCLASS_OF), "btype", graph_id=g)
        )

        # build-specific features with FALDO locations (UCSCBands.py:532-540)
        feats = feature_triples(
            keyed.withColumnRenamed("build_id", "feature_id")
            .withColumnRenamed("chrom_in_build", "chrom_ref"),
            "feature_id", type_col="class_id", label_col="label",
            chrom_col="chrom_ref", start_col="start", stop_col="stop", graph_id=g,
        )

        stains = make_triples(
            keyed.filter(F.col("stain").isNotNull()),
            "build_id", F.lit(HAS_SEQ_ATTR), "stain", is_literal=True, graph_id=g,
        )
        hierarchy = make_triples(
            keyed.filter(F.col("parent_id").isNotNull()),
            "build_id", F.lit(SUBSEQUENCE_OF), "parent_id", graph_id=g,
        )

        # taxon + genome boilerplate (UCSCBands.py:296-306)
        taxon_curie = f"NCBITaxon:{tax}"
        genome = spark.createDataFrame([(taxon_curie,)], "id string")
        tax_triples = class_triples(genome, "id", graph_id=g)

        return union_graphs(classes, feats, stains, hierarchy, tax_triples).dropDuplicates(
            ["subject", "predicate", "object"]
        )
