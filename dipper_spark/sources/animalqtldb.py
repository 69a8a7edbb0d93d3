"""AnimalQTLdb pipeline: QTL genomic locations from per-species GFF files.

Reference behavior: dipper/sources/AnimalQTLdb.py:633-784
(``_process_qtls_genomic_location``): GFF scan (latin-1, gz), attribute-bag
parsing with malformed-attribute tolerance, per-species QTL curie prefixes,
QTL→trait ``is marker for`` associations with P-value scores and
PUBMED/ISU-dispatched references, FALDO feature placement on the assembly
chromosome with FuzzyPosition typing.

Spark-first: the io.readers GFF scan (S6) delivers the ``MapType`` attribute
bag; everything else is element_at + when/otherwise dispatch.  Multi-species
= multi-file union over the same plan (U2), one file-contract per taxon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.io.readers import read_gff
from dipper_spark.models import association_triples, individual_triples, taxon_triples
from dipper_spark.models import terms as T
from dipper_spark.models.feature import feature_triples
from dipper_spark.sources.base import FileContract, SourcePipeline, register

QTL = "SO:0000771"
IS_MARKER_FOR = "RO:0002607"
QTL_EVIDENCE = "ECO:0000061"
JOURNAL_ARTICLE = "IAO:0000013"

#: species registry: (file key, taxon, informal prefix, build id, build label)
SPECIES = [
    ("cattle_gff", "9913", "cattle", "UMD_3.1", "UMD_3.1"),
    ("chicken_gff", "9031", "chicken", "GG_4.0", "Gallus_gallus-4.0"),
    ("pig_gff", "9823", "pig", "SS_10.2", "Sscrofa10.2"),
]


@register
class AnimalQtldbPipeline(SourcePipeline):
    name = "animalqtldb"
    files = {
        key: FileContract(
            file=f"QTL_{key.split('_')[0]}.gff.txt.gz",
            url=f"https://www.animalgenome.org/QTLdb/tmp/QTL_{key.split('_')[0]}.gff.txt.gz",
            # AnimalQTLdb.py GFF contract (9 standard columns)
            columns=["SEQNAME", "SOURCE", "FEATURE", "START", "END", "SCORE", "STRAND", "FRAME", "ATTRIBUTE"],
        )
        for key, *_ in SPECIES
    }
    test_ids = ["2242", "4"]

    def _species_triples(
        self, spark: SparkSession, raw_dir: str, key: str, txid: str,
        common_name: str, build_id: str, g: str, test_mode: bool,
    ) -> DataFrame:
        taxon_curie = f"NCBITaxon:{txid}"
        import os

        path = self.path(raw_dir, key)
        if not os.path.exists(path):
            return None
        gff = read_gff(spark, path)
        rows = (
            gff
            # poorly-formed '"FlankMarkers";' attr dropped by the bag parser;
            # quotes stripped like the reference (AnimalQTLdb.py:705-712)
            .withColumn("attributes", F.expr(
                "map_from_entries(filter(map_entries(attributes), e -> e.value IS NOT NULL))"
            ))
            .withColumn("qtl_num", F.regexp_replace(F.element_at("attributes", "QTL_ID"), '"', ""))
            .filter(F.col("qtl_num").isNotNull())
            .withColumn("qtl_id", F.concat(F.lit(common_name + "QTL:"), F.col("qtl_num")))
            .withColumn(
                "trait_id",
                F.concat(F.lit("AQTLTrait:"), F.regexp_replace(F.element_at("attributes", "trait_ID"), '"', "")),
            )
            # PUBMED_ID: ISU-prefixed ids stay AQTLPub, numeric → PMID
            # (AnimalQTLdb.py:728-741)
            .withColumn("raw_pub", F.regexp_replace(F.element_at("attributes", "PUBMED_ID"), '"', ""))
            .withColumn(
                "pub_id",
                F.when(F.col("raw_pub").rlike("^ISU"), F.concat(F.lit("AQTLPub:"), F.trim("raw_pub")))
                .when(F.col("raw_pub").isNotNull(), F.concat(F.lit("PMID:"), F.trim("raw_pub"))),
            )
            # P-value score: strip '<', ',' → '.', keep numerics
            # (AnimalQTLdb.py:748-755)
            .withColumn(
                "p_score",
                F.regexp_replace(
                    F.regexp_replace(F.regexp_replace(F.element_at("attributes", "P-value"), '"', ""), "<", ""),
                    ",", ".",
                ).cast("double"),
            )
            .withColumn("chromosome", F.regexp_replace("seqname", r"^Chr\.", ""))
            .withColumn("chrom_in_build", F.concat(F.lit(f":{build_id}chr"), F.col("chromosome")))
            .withColumn("taxon_curie", F.lit(taxon_curie))
            .withColumn("predicate", F.lit(IS_MARKER_FOR))
            .withColumn("evidence", F.array(F.lit(QTL_EVIDENCE)))
            .withColumn("source", F.when(F.col("pub_id").isNotNull(), F.array("pub_id")))
        )
        if test_mode:
            rows = rows.filter(F.col("qtl_num").isin(list(self.test_ids)))

        return union_graphs(
            individual_triples(rows, "qtl_id", F.lit(QTL), graph_id=g),
            taxon_triples(rows, "qtl_id", "taxon_curie", graph_id=g),
            # publication typing: PMIDs are journal articles, ISU ids are bare
            # references (Reference.addRefToGraph dispatch)
            make_triples(
                rows.filter(F.col("pub_id").startswith("PMID:")).dropDuplicates(["pub_id"]),
                "pub_id", F.lit(T.TYPE), F.lit(JOURNAL_ARTICLE), graph_id=g,
            ),
            association_triples(
                rows, "qtl_id", "predicate", "trait_id",
                evidence_col="evidence", source_col="source", score_col="p_score",
                definedby=self.name, graph_id=g,
            ),
            # FALDO placement on the assembly chromosome; QTL extents are
            # linkage-derived → FuzzyPosition semantics (start/stop may be '')
            feature_triples(
                rows.filter(F.col("start").isNotNull() | F.col("end").isNotNull()),
                "qtl_id",
                chrom_col="chrom_in_build", start_col="start", stop_col="end",
                strand_col="strand", graph_id=g,
            ),
        )

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        parts = [
            self._species_triples(spark, raw_dir, key, txid, common, build, g, test_mode)
            for key, txid, common, build, _label in SPECIES
        ]
        parts = [p for p in parts if p is not None]
        out = union_graphs(*parts)
        if limit:
            out = out.limit(limit)
        return out.dropDuplicates(["subject", "predicate", "object"])
