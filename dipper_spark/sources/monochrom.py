"""Monochrom pipeline: the standalone chromosome-band ONTOLOGY built from
UCSC cytoband files.

Reference behavior: dipper/sources/Monochrom.py:160-434 — per taxon: taxon
class + genome-label synonym, genome bnode class with an in-taxon OWL
restriction; placed scaffolds only; per band row: chromosome class
(``CHR:<taxon>chr<num>``) with a member-of-genome restriction, band class
typed from the stain/region code (monochrom localtt, default
chromosome_part), parent bands expanded by peeling alphanumeric places
(make_parent_bands, 348-368), each parent typed by karyotype notation
(getChrPartTypeByNotation, 404-434) and chained with is-subsequence-of /
has-subsequence restrictions; g(neg|pos|var) stains become
has-sequence-attribute restrictions on band/subband classes.

Spark-first: the recursive parent peeling is the same prefix-array column
expression as ucscbands (one explode, no UDF); each restriction family is
one narrow select through models.restriction_triples.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.vocab import TranslationTable
from dipper_spark.models import class_triples, restriction_triples
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register
from dipper_spark.sources.ucscbands import band_type_col

GENOME = "SO:0001026"
CHROMOSOME = "SO:0000340"
CHROMOSOME_PART = "SO:0000830"
CHROMOSOME_BAND = "SO:0000341"
CHROMOSOME_SUBBAND = "GENO:0000616"
HAS_SEQ_ATTR = "GENO:0000207"
SUBSEQUENCE_OF = "RO:0002525"
HAS_SUBSEQUENCE = "RO:0002524"
MEMBER_OF = "RO:0002350"
PLACED_RE = r"^chr(\d+|X|Y|Z|W|MT|M)$"

_TT = TranslationTable.for_source("monochrom")
#: stain/region code → SO/GENO type (translationtable/monochrom.yaml)
REGION_TYPES = {
    code: _TT.globaltt[label]
    for code, label in _TT.localtt.items()
    if label in _TT.globaltt
}

#: taxon → (cytoband file, genome label); reference files dict
#: (Monochrom.py:72-127)
GENOMES = {
    "9606": ("9606cytoBand.txt.gz", "Human"),
    "10090": ("10090cytoBand.txt.gz", "Mouse"),
    "7955": ("7955cytoBand.txt.gz", "Zebrafish"),
    "10116": ("10116cytoBand.txt.gz", "Rat"),
    "9913": ("bosTau7cytoBand.txt.gz", "cow"),
    "9031": ("galGal4cytoBand.txt.gz", "chicken"),
    "9823": ("susScr3cytoBand.txt.gz", "pig"),
    "9940": ("oviAri3cytoBand.txt.gz", "sheep"),
    "9796": ("equCab2cytoBand.txt.gz", "horse"),
}


def _map_lit(mapping: dict[str, str], key: Column) -> Column:
    return F.element_at(F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]), key)


@register
class MonochromPipeline(SourcePipeline):
    name = "monochrom"
    files = {
        taxon: FileContract(
            file=fname,
            url=f"http://hgdownload.cse.ucsc.edu/goldenPath/{fname}",
        )
        for taxon, (fname, _) in GENOMES.items()
    }
    test_ids = []

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        import os

        parts = []
        for taxon, (fname, label) in GENOMES.items():
            path = f"{raw_dir.rstrip('/')}/{fname}"
            if os.path.exists(path):
                parts.append(self._taxon_triples(spark, path, taxon, label, limit))
        return union_graphs(*parts).dropDuplicates(["subject", "predicate", "object"])

    def _taxon_triples(
        self, spark: SparkSession, path: str, taxon: str, genome_label: str,
        limit: int | None,
    ) -> DataFrame:
        g = self.name
        tax_id = f"NCBITaxon:{taxon}"
        genome_id = f"_:{tax_id}genome"  # makeGenomeID (Genotype.py:569-576)
        raw = (
            spark.read.option("sep", "\t").option("comment", "#")
            .schema("chrom string, start long, stop long, band string, rtype string")
            .csv(path)
        )
        if limit:
            raw = raw.limit(limit)
        rows = (
            raw.filter(F.col("chrom").rlike(PLACED_RE))
            .withColumn("chrnum", F.regexp_replace("chrom", r"ch(r?)[omse]*", ""))
            .withColumn("cclassid", F.concat(F.lit(f"CHR:{taxon}chr"), "chrnum"))
            .withColumn("band", F.coalesce(F.trim("band"), F.lit("")))
        )
        # genome + taxon scaffolding (Monochrom.py:194-207)
        header = spark.createDataFrame(
            [(tax_id, genome_label, genome_id, f"{genome_label} genome")],
            "tax_id string, genome_label string, genome_id string, genome_class_label string",
        )
        chroms = rows.select("cclassid", "chrnum").distinct().withColumn(
            "chr_label", F.concat(F.lit("chr"), "chrnum", F.lit(f" ({genome_label})"))
        ).withColumn("genome_id", F.lit(genome_id))

        # the band itself + its peeled parents, each with the notation type;
        # parent chain pairs feed the subsequence restrictions
        bands = rows.filter(F.col("band") != "").withColumn(
            "prefixes", self._ancestor_prefixes(F.col("band"))
        )
        # full band class: typed from the stain/region code (241-268)
        band_classes = bands.select(
            F.concat("cclassid", "band").alias("class_id"),
            F.concat(F.lit("chr"), "chrnum", "band", F.lit(f" ({genome_label})")).alias("class_label"),
            F.coalesce(_map_lit(REGION_TYPES, F.col("rtype")), F.lit(CHROMOSOME_PART)).alias("type_id"),
            "rtype",
        ).distinct()
        parent_classes = bands.select(
            "cclassid", "chrnum", F.explode("prefixes").alias("pband")
        ).distinct().select(
            F.concat("cclassid", "pband").alias("class_id"),
            F.concat(F.lit("chr"), "chrnum", "pband", F.lit(f" ({genome_label})")).alias("class_label"),
            band_type_col(F.col("pband")).alias("type_id"),
        ).distinct()
        # build (child, parent) pairs: band→prefixes[0], prefixes[i]→prefixes[i+1],
        # last prefix→chromosome; bands with no prefixes attach directly
        pair_rows = bands.select(
            "cclassid", "band",
            F.concat(F.array("band"), "prefixes", F.array(F.lit(""))).alias("chain"),
        ).select(
            "cclassid",
            F.explode(
                F.expr(
                    "transform(slice(chain, 1, size(chain) - 1), (c, i) -> struct(c AS child, chain[i + 1] AS parent))"
                )
            ).alias("p"),
        ).select(
            F.concat("cclassid", F.col("p.child")).alias("child_id"),
            F.concat("cclassid", F.col("p.parent")).alias("parent_id"),
        ).distinct()

        stains = band_classes.filter(
            F.col("rtype").rlike("^g(neg|pos|var)")
            & F.col("type_id").isin(CHROMOSOME_BAND, CHROMOSOME_SUBBAND)
        ).withColumn("stain_id", _map_lit(REGION_TYPES, F.col("rtype")))

        return union_graphs(
            class_triples(header, "tax_id", graph_id=g),
            make_triples(header, "tax_id", F.lit(T.HAS_EXACT_SYNONYM), "genome_label", is_literal=True, graph_id=g),
            class_triples(
                header.withColumn("parent", F.lit(GENOME)),
                "genome_id", label_col="genome_class_label", subclass_of_col="parent", graph_id=g,
            ),
            restriction_triples(header, "genome_id", T.IN_TAXON, "tax_id", graph_id=g),
            class_triples(
                chroms.withColumn("parent", F.lit(CHROMOSOME)),
                "cclassid", label_col="chr_label", subclass_of_col="parent", graph_id=g,
            ),
            restriction_triples(chroms, "cclassid", MEMBER_OF, "genome_id", graph_id=g),
            class_triples(band_classes, "class_id", label_col="class_label",
                          subclass_of_col="type_id", graph_id=g),
            class_triples(parent_classes, "class_id", label_col="class_label",
                          subclass_of_col="type_id", graph_id=g),
            restriction_triples(pair_rows, "child_id", SUBSEQUENCE_OF, "parent_id", graph_id=g),
            restriction_triples(pair_rows, "parent_id", HAS_SUBSEQUENCE, "child_id", graph_id=g),
            restriction_triples(
                stains.filter(F.col("stain_id").isNotNull()),
                "class_id", HAS_SEQ_ATTR, "stain_id", graph_id=g,
            ),
        ).dropDuplicates(["subject", "predicate", "object"])

    @staticmethod
    def _ancestor_prefixes(band: Column) -> Column:
        """make_parent_bands (Monochrom.py:348-368): peel one alphanumeric
        place at a time — '.'-terminated prefixes are skipped — giving e.g.
        q21.31 → [q21.3, q21, q2, q].  Same expression family as
        ucscbands; ordered longest-first (the reference's reverse sort)."""
        # all proper prefixes, longest first, '.'-stripped, deduped, non-empty
        prefixes = F.when(
            F.length(band) > 1,
            F.transform(
                F.sequence(F.length(band) - 1, F.lit(1), F.lit(-1)),
                lambda i: F.regexp_replace(F.substr(band, F.lit(1), i), r"\.$", ""),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.array_distinct(F.filter(prefixes, lambda p: p != ""))
