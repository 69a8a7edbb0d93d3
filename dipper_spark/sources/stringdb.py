"""STRING protein-interaction pipeline (M3): threshold filter, broadcast
protein→gene map join, symmetric canonicalization, 1:N cross-product.

Reference: dipper/sources/StringDB.py — links scan + idmap build 146-185
(idmap header is '## NCBI taxid / entrez / STRING ##', entrez '|'-separated
1:N), combined_score > 700 filter 188-192 (P4), taxon-prefix strip +
lexicographic protein ordering 195-208 (J7), map-miss drop w/ count 209-225
(J2/A8), gene×gene expansion 212-218 (J9), interacts-with emission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

GENE = "SO:0000704"
INTERACTS_WITH = "RO:0002434"  # globaltt['interacts with']

LINK_COLUMNS = [
    "protein1", "protein2", "neighborhood", "fusion", "cooccurence",
    "coexpression", "experimental", "database", "textmining", "combined_score",
]


@register
class StringDbPipeline(SourcePipeline):
    name = "stringdb"
    files = {
        "links": FileContract(
            file="protein.links.detailed.txt.gz",
            url="https://stringdb-static.org/download/protein.links.detailed/",
            columns=LINK_COLUMNS,
        ),
        "idmap": FileContract(
            file="entrez_2_string.tsv.gz",
            url="https://string-db.org/mapping_files/entrez/",
            columns=["NCBI_taxid", "entrez", "STRING"],
        ),
        # staged Ensembl biomart export (ENSP → ENSG), the reference's other
        # mapping path (StringDB.py:169-176 via Ensembl.fetch_protein_gene_map)
        "ensembl_p2g": FileContract(file="ensembl_protein_gene.tsv"),
    }
    taxon = "9606"
    score_threshold = 700

    def protein_gene_map(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """protein id → array of gene curies (StringDB.py:151-176).
        Dict-sized → broadcast side of the join.  Prefers the staged Ensembl
        biomart export (ENSP→ENSEMBL:ENSG) when present, else the STRING
        entrez mapping file (→ NCBIGene curies)."""
        import os

        ens = self.path(raw_dir, "ensembl_p2g")
        if os.path.exists(ens):
            return (
                spark.read.option("sep", "\t").option("comment", "#").csv(ens)
                .groupBy(F.col("_c0").alias("protein"))
                .agg(
                    F.collect_set(F.concat(F.lit("ENSEMBL:"), F.col("_c1"))).alias("gene_curies")
                )
            )
        return (
            spark.read.option("sep", "\t").option("comment", "#")
            .csv(self.path(raw_dir, "idmap"))
            .select(
                F.regexp_replace(F.col("_c2"), f"^{self.taxon}\\.", "").alias("protein"),
                F.transform(
                    F.split(F.col("_c1"), r"\|"),
                    lambda e: F.concat(F.lit("NCBIGene:"), F.trim(e)),
                ).alias("gene_curies"),
            )
        )

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        links = (
            spark.read.option("sep", " ").option("header", True)
            .csv(self.path(raw_dir, "links"))
            .select(
                F.regexp_replace("protein1", f"^{self.taxon}\\.", "").alias("p1"),
                F.regexp_replace("protein2", f"^{self.taxon}\\.", "").alias("p2"),
                F.col("combined_score").cast("int").alias("combined_score"),
            )
            # threshold BEFORE any join — pushed into the scan (P4)
            .filter(F.col("combined_score") > self.score_threshold)
        )
        if limit:
            links = links.limit(limit)

        # keep orientation stable: gene1 side is the lexicographically larger
        # protein (StringDB.py:200-208)
        links = links.select(
            F.greatest("p1", "p2").alias("pa"),
            F.least("p1", "p2").alias("pb"),
        )

        pmap = broadcast(self.protein_gene_map(spark, raw_dir))
        joined = (
            links.join(pmap.withColumnRenamed("protein", "pa").withColumnRenamed("gene_curies", "genes_a"), "pa", "inner")
            .join(pmap.withColumnRenamed("protein", "pb").withColumnRenamed("gene_curies", "genes_b"), "pb", "inner")
        )
        # 1:N × 1:N cross-product expansion (StringDB.py:212-218, J9)
        pairs = joined.select(
            F.explode("genes_a").alias("gene1"), F.col("genes_b")
        ).select("gene1", F.explode("genes_b").alias("gene2"))

        return union_graphs(
            make_triples(pairs, "gene1", F.lit(INTERACTS_WITH), "gene2", graph_id=g),
            make_triples(pairs, "gene1", F.lit(T.TYPE), F.lit(GENE), graph_id=g),
            make_triples(pairs, "gene2", F.lit(T.TYPE), F.lit(GENE), graph_id=g),
        ).dropDuplicates(["subject", "predicate", "object"])

    def miss_count(self, spark: SparkSession, raw_dir: str) -> int:
        """Rows dropped for lacking a protein→gene mapping (anti-join metric,
        StringDB.py:209-225, A8)."""
        links = (
            spark.read.option("sep", " ").option("header", True)
            .csv(self.path(raw_dir, "links"))
            .select(F.regexp_replace("protein1", f"^{self.taxon}\\.", "").alias("pa"),
                    F.regexp_replace("protein2", f"^{self.taxon}\\.", "").alias("pb"),
                    F.col("combined_score").cast("int").alias("s"))
            .filter(F.col("s") > self.score_threshold)
        )
        pmap = broadcast(self.protein_gene_map(spark, raw_dir).select(F.col("protein")))
        hit = links.join(pmap.withColumnRenamed("protein", "pa"), "pa", "left_semi").join(
            pmap.withColumnRenamed("protein", "pb"), "pb", "left_semi"
        )
        return links.count() - hit.count()
