"""HGNC gene-nomenclature pipeline.

Reference behavior: dipper/sources/HGNC.py:139-300 (``_process_genes``):
Approved-only filter, withdrawn locus types deprecated, '@'-suffixed cluster
symbols skipped, locus-type → SO typing, clique-leader marking, NCBI/ENSEMBL
/OMIM equivalences, pipe-separated pubmed is-about edges, chr/band location
regexes with subsequence placement.

Spark-first: one scan; the chr/band patterns are the reference's own
regexes as ``regexp_extract`` columns; every pipe-bag is explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import class_triples, deprecation_triples, pairwise_triples, taxon_triples
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

TAXON = "NCBITaxon:9606"
IS_ABOUT = "IAO:0000136"
IS_SUBSEQUENCE_OF = "RO:0002525"
CHR_RE = r"^(\d+|X|Y|Z|W|MT)[pq$]"           # HGNC.py chr_pattern
BAND_RE = r"([pq][A-H\d]?\d?(?:\.\d+)?)"      # HGNC.py band_pattern

#: locus_type → SO (translationtable/hgnc.yaml ∘ GLOBAL_TERMS.yaml subset)
LOCUS_TYPE_SO = {
    "gene with protein product": "SO:0001217",
    "pseudogene": "SO:0000336",
    "RNA, long non-coding": "SO:0002127",
    "RNA, micro": "SO:0001265",
    "RNA, transfer": "SO:0001272",
    "RNA, ribosomal": "SO:0001637",
}

COLUMNS = [
    "hgnc_id", "symbol", "name", "locus_group", "locus_type", "status",
    "location", "location_sortable", "alias_symbol", "alias_name",
    "prev_symbol", "prev_name", "gene_family", "gene_family_id",
    "date_approved_reserved", "date_symbol_changed", "date_name_changed",
    "date_modified", "entrez_id", "ensembl_gene_id", "vega_id", "ucsc_id",
    "ena", "refseq_accession", "ccds_id", "uniprot_ids", "pubmed_id",
    "mgd_id", "rgd_id", "lsdb", "cosmic", "omim_id",
]


def _map_lit(mapping: dict[str, str], key: Column) -> Column:
    return F.element_at(F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]), key)


@register
class HgncPipeline(SourcePipeline):
    name = "hgnc"
    files = {
        "genes": FileContract(
            file="hgnc_complete_set.txt",
            url="https://ftp.ebi.ac.uk/pub/databases/genenames/hgnc/tsv/hgnc_complete_set.txt",
            columns=COLUMNS,
        ),
    }
    test_ids = ["HGNC:30497", "HGNC:8"]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        schema = " ".join(f"`{c}` string," for c in COLUMNS).rstrip(",")
        raw = (
            spark.read.option("sep", "\t").option("header", True).option("quote", '"')
            .schema(schema).csv(self.path(raw_dir, "genes"))
        )
        raw = self.test_filter(raw, "hgnc_id", test_mode)
        if limit:
            raw = raw.limit(limit)

        rows = (
            raw.select(*[F.trim(F.coalesce(F.col(c), F.lit(""))).alias(c) for c in COLUMNS])
            .filter(F.col("status") == "Approved")           # HGNC.py:226-228
            .filter(~F.col("symbol").endswith("@"))          # cluster regions skipped
        )
        withdrawn = rows.filter(F.col("locus_type") == "withdrawn")
        live = (
            rows.filter(F.col("locus_type") != "withdrawn")
            .withColumn("gene_type", _map_lit(LOCUS_TYPE_SO, F.col("locus_type")))
            .withColumn("label", F.col("symbol"))
            .withColumn("desc", F.when(F.col("name") != "", F.col("name")))
            .withColumn("chrom", F.regexp_extract("location", CHR_RE, 1))
            .withColumn("band", F.regexp_extract("location", BAND_RE, 1))
            .withColumn("taxon", F.lit(TAXON))
        )
        placed = live.filter(F.col("chrom") != "").withColumn(
            "loc_id",
            F.when(
                F.col("band") != "",
                F.concat(F.lit(":9606chr"), F.col("chrom"), F.col("band")),
            ).otherwise(F.concat(F.lit(":9606chr"), F.col("chrom"))),
        )

        xrefs = []
        for col, prefix in (("entrez_id", "NCBIGene:"), ("ensembl_gene_id", "ENSEMBL:")):
            x = live.filter(F.col(col) != "").withColumn("xref", F.concat(F.lit(prefix), F.col(col)))
            xrefs.append(pairwise_triples(x, "hgnc_id", "xref", T.EQUIVALENT_CLASS, graph_id=g))
        omim = (
            live.filter(F.col("omim_id") != "")
            .select("hgnc_id", F.explode(F.split("omim_id", r"\|")).alias("o"))
            .filter(F.trim("o") != "")
            .withColumn("xref", F.concat(F.lit("OMIM:"), F.trim("o")))
        )
        xrefs.append(pairwise_triples(omim, "hgnc_id", "xref", T.EQUIVALENT_CLASS, graph_id=g))

        pubs = (
            live.filter(F.col("pubmed_id") != "")
            .select("hgnc_id", F.explode(F.split("pubmed_id", r"\|")).alias("p"))
            .filter(F.trim("p") != "")
            .withColumn("pmid", F.concat(F.lit("PMID:"), F.trim("p")))
        )

        return union_graphs(
            class_triples(live, "hgnc_id", "label", description_col="desc", graph_id=g),
            make_triples(
                live.filter(F.col("gene_type").isNotNull()),
                "hgnc_id", F.lit(T.TYPE), "gene_type", graph_id=g,
            ),
            # HGNC is the human clique leader (Model.makeLeader)
            make_triples(
                live, "hgnc_id", F.lit(T.CLIQUE_LEADER), F.lit("true"),
                is_literal=True, datatype="xsd:boolean", graph_id=g,
            ),
            deprecation_triples(withdrawn, "hgnc_id", graph_id=g),
            *xrefs,
            make_triples(pubs, "pmid", F.lit(IS_ABOUT), "hgnc_id", graph_id=g),
            taxon_triples(live, "hgnc_id", "taxon", graph_id=g),
            make_triples(placed, "hgnc_id", F.lit(IS_SUBSEQUENCE_OF), "loc_id", graph_id=g),
            class_triples(
                placed.filter(F.col("band") != "").dropDuplicates(["loc_id"]), "loc_id", graph_id=g
            ),
        ).dropDuplicates(["subject", "predicate", "object"])
