"""Ensembl biomart gene pipeline.

Reference behavior: dipper/sources/Ensembl.py:293-390 (``_process_genes``):
per-taxon biomart TSV exports (hgnc_id column only for 9606), biotype → SO
typing with polypeptide default, human entrez as loose xref vs equivalence
for other taxa (HGNC leads the human clique), gene products (peptide +
swissprot individuals with cross-xref), taxon decoration.

Spark-first: per-taxon files are the same plan unioned (U2); the
human/non-human xref-vs-equivalence split is a partitioned when/otherwise,
not two code paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import class_triples, individual_triples, pairwise_triples, taxon_triples, xref_triples
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

POLYPEPTIDE = "SO:0000104"
HAS_GENE_PRODUCT = "RO:0002205"

BIOTYPE_SO = {
    "protein_coding": "SO:0001217",
    "pseudogene": "SO:0000336",
    "lncRNA": "SO:0002127",
    "miRNA": "SO:0001265",
    "rRNA": "SO:0001637",
    "tRNA": "SO:0001272",
}

COLUMNS = [
    "ensembl_gene_id", "external_gene_name", "description", "gene_biotype",
    "entrezgene_id", "ensembl_peptide_id", "uniprotswissprot", "hgnc_id",
]

TAXA = ["9606", "10090", "7955"]


def _map_lit(mapping: dict[str, str], key: Column) -> Column:
    return F.element_at(F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]), key)


@register
class EnsemblPipeline(SourcePipeline):
    name = "ensembl"
    files = {
        tax: FileContract(
            file=f"ensembl_biomart_{tax}.txt",
            url="https://uswest.ensembl.org/biomart/martservice",  # XML-query POST, staged
            columns=COLUMNS,
        )
        for tax in TAXA
    }
    test_ids = ["ENSEMBL:ENSG00000136828"]

    def _taxon_triples(
        self, spark: SparkSession, raw_dir: str, tax: str, g: str, test_mode: bool,
    ) -> DataFrame | None:
        import os

        path = self.path(raw_dir, tax)
        if not os.path.exists(path):
            return None
        schema = " ".join(f"`{c}` string," for c in COLUMNS).rstrip(",")
        raw = (
            spark.read.option("sep", "\t").option("header", True).schema(schema).csv(path)
        )
        rows = (
            raw.select(*[F.trim(F.coalesce(F.col(c), F.lit(""))).alias(c) for c in COLUMNS])
            .withColumn("gene_id", F.concat(F.lit("ENSEMBL:"), F.col("ensembl_gene_id")))
            .withColumn("label", F.when(F.col("external_gene_name") != "", F.col("external_gene_name")))
            .withColumn("desc", F.when(F.col("description") != "", F.col("description")))
            .withColumn("gene_type", F.coalesce(_map_lit(BIOTYPE_SO, F.col("gene_biotype")), F.lit(POLYPEPTIDE)))
            .withColumn("taxon", F.lit(f"NCBITaxon:{tax}"))
            .withColumn(
                "entrez_curie",
                F.when(F.col("entrezgene_id") != "", F.concat(F.lit("NCBIGene:"), F.col("entrezgene_id"))),
            )
            .withColumn("hgnc_curie", F.when(F.col("hgnc_id") != "", F.col("hgnc_id")))
            .withColumn(
                "peptide_curie",
                F.when(F.col("ensembl_peptide_id") != "", F.concat(F.lit("ENSEMBL:"), F.col("ensembl_peptide_id"))),
            )
            .withColumn(
                "uniprot_curie",
                F.when(F.col("uniprotswissprot") != "", F.concat(F.lit("UniProtKB:"), F.col("uniprotswissprot"))),
            )
        )
        rows = self.test_filter(rows, "gene_id", test_mode)

        entrez = rows.filter(F.col("entrez_curie").isNotNull())
        pep = rows.filter(F.col("peptide_curie").isNotNull())
        upep = pep.filter(F.col("uniprot_curie").isNotNull())
        parts = [
            class_triples(rows, "gene_id", "label", description_col="desc", graph_id=g),
            make_triples(rows, "gene_id", F.lit(T.TYPE), "gene_type", graph_id=g),
            taxon_triples(rows, "gene_id", "taxon", graph_id=g),
            # human: entrez is a loose xref (HGNC leads); others: equivalence
            # (Ensembl.py:350-360)
            xref_triples(entrez.filter(F.lit(tax == "9606")), "gene_id", "entrez_curie", graph_id=g),
            pairwise_triples(
                entrez.filter(F.lit(tax != "9606")), "gene_id", "entrez_curie",
                T.EQUIVALENT_CLASS, graph_id=g,
            ),
            pairwise_triples(
                rows.filter(F.col("hgnc_curie").isNotNull()), "gene_id", "hgnc_curie",
                T.EQUIVALENT_CLASS, graph_id=g,
            ),
            # gene products (Ensembl.py:368-375)
            individual_triples(pep, "peptide_curie", F.col("gene_type"), graph_id=g),
            make_triples(pep, "gene_id", F.lit(HAS_GENE_PRODUCT), "peptide_curie", graph_id=g),
            individual_triples(upep, "uniprot_curie", F.col("gene_type"), graph_id=g),
            make_triples(upep, "gene_id", F.lit(HAS_GENE_PRODUCT), "uniprot_curie", graph_id=g),
            xref_triples(upep, "peptide_curie", "uniprot_curie", graph_id=g),
        ]
        return union_graphs(*parts)

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        parts = [
            self._taxon_triples(spark, raw_dir, tax, self.name, test_mode) for tax in TAXA
        ]
        parts = [p for p in parts if p is not None]
        out = union_graphs(*parts)
        if limit:
            out = out.limit(limit)
        return out.dropDuplicates(["subject", "predicate", "object"])
