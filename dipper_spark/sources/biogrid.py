"""BioGrid gene-interaction pipeline (MITAB inside a zip member).

Reference behavior: dipper/sources/BioGrid.py — ``_get_interactions``
123-200 (15-col MITAB scan from the zip's first member, interactor-string →
curie extraction with locuslink/biogrid/swiss-prot priority, taxon pair
filter, MI-code → predicate and detection-method → ECO resolution with
fallbacks, pubmed→PMID scrub, reified interaction associations),
``_interactor_to_gene_curie`` 209-234.

Spark-first: the zip is unpacked in the staging step (SURVEY S2 — zip/tar
members land as plain files in the landing zone); everything after is one
scan of column expressions: regexp_extract priority chain, two isin taxon
filters directly on the scan, literal-map MI resolution with coalesce
fallbacks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import union_graphs
from dipper_spark.models import association_triples
from dipper_spark.sources.base import FileContract, SourcePipeline, register

INTERACTS_WITH = "RO:0002434"
EXPERIMENTAL_EVIDENCE = "ECO:0000006"

MITAB_COLUMNS = [
    "interactor_a", "interactor_b", "alt_ids_a", "alt_ids_b", "aliases_a",
    "aliases_b", "detection_method", "pub_author", "pub_id", "taxid_a",
    "taxid_b", "interaction_type", "source_db", "interaction_id", "confidence_val",
]

#: MI interaction-type → predicate (translationtable/biogrid.yaml ∘ globaltt);
#: unmapped MI codes fall back to plain interacts-with (BioGrid.py:176-179)
MI_REL = {
    "MI:0403": "RO:0002325",  # colocalizes with
    "MI:0407": INTERACTS_WITH,
    "MI:0914": INTERACTS_WITH,
    "MI:0915": INTERACTS_WITH,
}
#: detection method MI → ECO; unmapped → experimental evidence (BioGrid.py:186-189)
MI_ECO = {
    "MI:0018": "ECO:0000068",  # yeast 2-hybrid
    "MI:0004": "ECO:0000079",  # affinity chromatography
    "MI:0254": "ECO:0000011",  # genetic interaction
    "MI:0686": EXPERIMENTAL_EVIDENCE,
}


def _map_lit(mapping: dict[str, str], key: Column) -> Column:
    return F.element_at(F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]), key)


def interactor_curie(col: Column) -> Column:
    """'entrez gene/locuslink:351|BIOGRID:106848' → NCBIGene:351; priority
    locuslink > biogrid > swiss-prot, else null (BioGrid.py:209-234)."""
    locus = F.regexp_extract(col, r"locuslink:(\d+)", 1)
    biogrid = F.regexp_extract(col, r"biogrid:(\d+)", 1)
    swiss = F.regexp_extract(col, r"swiss-prot:([^|\s]+)", 1)
    return (
        F.when(locus != "", F.concat(F.lit("NCBIGene:"), locus))
        .when(biogrid != "", F.concat(F.lit("BIOGRID:"), biogrid))
        .when(swiss != "", F.concat(F.lit("UniProtKB:"), swiss))
    )


@register
class BioGridPipeline(SourcePipeline):
    name = "biogrid"
    files = {
        "interactions": FileContract(
            # staging unzips BIOGRID-ALL-*.mitab.zip; the member lands here
            file="BIOGRID-ALL.mitab.txt",
            url="https://downloads.thebiogrid.org/Download/BioGRID/Latest-Release/BIOGRID-ALL-LATEST.mitab.zip",
            columns=MITAB_COLUMNS,
        ),
    }
    tax_ids = ["9606", "10090", "7955"]
    test_ids = ["NCBIGene:351", "NCBIGene:805"]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        schema = " ".join(f"`{c}` string," for c in MITAB_COLUMNS).rstrip(",")
        raw = (
            spark.read.option("sep", "\t").option("comment", "#").schema(schema)
            .csv(self.path(raw_dir, "interactions"))
        )
        rows = (
            raw.withColumn("gene_a", interactor_curie(F.col("interactor_a")))
            .withColumn("gene_b", interactor_curie(F.col("interactor_b")))
            .filter(F.col("gene_a").isNotNull() & F.col("gene_b").isNotNull())
            # taxon pair filter directly on the scan (BioGrid.py:167-171)
            .filter(
                F.element_at(F.split(F.trim("taxid_a"), ":"), -1).isin(self.tax_ids)
                & F.element_at(F.split(F.trim("taxid_b"), ":"), -1).isin(self.tax_ids)
            )
            .withColumn("mi_type", F.regexp_extract("interaction_type", r"MI:\d+", 0))
            .withColumn("predicate", F.coalesce(_map_lit(MI_REL, F.col("mi_type")), F.lit(INTERACTS_WITH)))
            .withColumn("mi_det", F.regexp_extract("detection_method", r"MI:\d+", 0))
            .withColumn("eco", F.coalesce(_map_lit(MI_ECO, F.col("mi_det")), F.lit(EXPERIMENTAL_EVIDENCE)))
            .withColumn("evidence", F.array("eco"))
            .withColumn("pub", F.trim(F.regexp_replace("pub_id", "pubmed", "PMID")))
            .withColumn("source", F.when(F.col("pub") != "", F.array("pub")))
        )
        if test_mode:
            rows = rows.filter(
                F.col("gene_a").isin(list(self.test_ids)) & F.col("gene_b").isin(list(self.test_ids))
            )
        if limit:
            rows = rows.limit(limit)

        return union_graphs(
            association_triples(
                rows, "gene_a", "predicate", "gene_b",
                evidence_col="evidence", source_col="source",
                definedby=self.name, graph_id=g,
            ),
        ).dropDuplicates(["subject", "predicate", "object"])
