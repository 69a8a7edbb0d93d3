"""Panther pairwise-orthology pipeline.

Reference: dipper/sources/Panther.py — tar-member TSV scan 179-195, pair
parsing + taxon OR-filter 196-232 (P5), gene-id rewrites (``MGI=MGI=``→MGI:
etc., ``_clean_up_gene_id`` 287-331, P8), orthology-type resolve
(translationtable/panther.yaml:32-38 → RO:HOM terms), orthology association
with phylogenetic evidence (ECO:0000080) + PANTHER family membership.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models.assoc import association_triples, with_assoc_id
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

#: species abbr → NCBITaxon number (panther.yaml:8-29 composed with globaltt)
SPECIES_TAXON = {
    "HUMAN": "9606", "MOUSE": "10090", "RAT": "10116", "DANRE": "7955",
    "CAEEL": "6239", "DROME": "7227", "CHICK": "9031", "PIG": "9823",
    "BOVIN": "9913", "CANLF": "9615", "FELCA": "9685", "HORSE": "9796",
    "MACMU": "9544", "PANTR": "9598", "YEAST": "559292", "SCHPO": "4896",
    "XENTR": "8364",
}
#: orthology code → RO (panther.yaml:32-38 + GLOBAL_TERMS 491-495)
ORTHOLOGY_REL = {
    "LDO": "RO:HOM0000020",  # least diverged → 1:1 orthology
    "O": "RO:HOM0000017",
    "P": "RO:HOM0000011",
    "X": "RO:HOM0000018",
    "LDX": "RO:HOM0000018",
}
PHYLO_EVIDENCE = "ECO:0000080"
GENE = "SO:0000704"
HAS_MEMBER = "RO:0002351"        # globaltt['has member'] — Family.addMember
GENE_FAMILY = "EDAM-DATA:3148"   # globaltt['gene_family']

PANTHER_COLUMNS = [
    "Gene", "Ortholog", "Type_of_ortholog", "Common_ancestor", "Panther_id",
]


def _clean_gene_id(gene: Column, species: Column) -> Column:
    """_clean_up_gene_id (Panther.py:287-331): keep last two ':' tokens,
    then per-species prefix rewrites; unknown prefixes → NULL (dropped +
    counted upstream)."""
    # '=' → ':' (Panther.py:234-235), keep penultimate+ultimate tokens
    # (collapses 'MGI:MGI:97490' → 'MGI:97490')
    gid = F.regexp_replace(gene, "=", ":")
    parts = F.split(gid, ":")
    n = F.size(parts)
    gid = F.when(
        n >= 2, F.concat_ws(":", F.element_at(parts, -2), F.element_at(parts, -1))
    ).otherwise(gid)
    worm = (
        F.when(gid.startswith("EnsemblGenome:"), F.concat(F.lit("WormBase:"), F.substring(gid, 15, 1000)))
        .when(gid.startswith("Gene:CELE"), F.concat(F.lit("WormBase:"), F.substring(gid, 10, 1000)))
        .when(gid.startswith("Gene:"), F.concat(F.lit("WormBase:"), F.substring(gid, 6, 1000)))
        .otherwise(gid)
    )
    fly = (
        F.when(gid.startswith("EnsemblGenome:"), F.concat(F.lit("FlyBase:"), F.substring(gid, 15, 1000)))
        .when(gid.startswith("Gene:Dmel_"), F.concat(F.lit("FlyBase:"), F.substring(gid, 11, 1000)))
        .when(gid.startswith("Gene:CG"), F.concat(F.lit("FlyBase:"), F.substring(gid, 6, 1000)))
        .otherwise(gid)
    )
    other = (
        F.when(gid.startswith("Ensembl:"), F.concat(F.lit("ENSEMBL:"), F.substring(gid, 9, 1000)))
        .when(gid.startswith("GeneID:"), F.concat(F.lit("NCBIGene:"), F.substring(gid, 8, 1000)))
        .when(gid.startswith("Gene:ENS"), F.concat(F.lit("ENSEMBL:"), F.substring(gid, 6, 1000)))
        .otherwise(gid)
    )
    cleaned = (
        F.when(species == "CAEEL", worm).when(species == "DROME", fly).otherwise(other)
    )
    known = F.split(cleaned, ":").getItem(0).isin(
        "MGI", "NCBIGene", "ENSEMBL", "WormBase", "FlyBase", "UniProtKB", "ZFIN", "RGD", "HGNC"
    )
    return F.when(known, cleaned)


def _static(mapping: dict[str, str], col: Column) -> Column:
    expr = F.lit(None).cast("string")
    for k, v in mapping.items():
        expr = F.when(col == k, F.lit(v)).otherwise(expr)
    return expr


@register
class PantherPipeline(SourcePipeline):
    name = "panther"
    files = {
        "orthologs": FileContract(
            file="RefGenomeOrthologs*.tsv*",
            url="ftp://ftp.pantherdb.org/ortholog/current_release/RefGenomeOrthologs.tar.gz",
            columns=PANTHER_COLUMNS,
        ),
    }
    tax_ids = ["9606", "10090", "10116", "7955", "6239", "7227"]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        from dipper_spark.io import read_delim

        g = self.name
        df = read_delim(
            spark, self.path(raw_dir, "orthologs"), PANTHER_COLUMNS,
            header=False, src_key=self.name, limit=limit,
        )

        pair = df.select(
            F.split("Gene", r"\|").alias("a"),
            F.split("Ortholog", r"\|").alias("b"),
            F.col("Type_of_ortholog").alias("otype"),
            F.col("Panther_id").alias("panther_id"),
        ).select(
            F.element_at("a", 1).alias("species_a"),
            F.element_at("a", 2).alias("raw_gene_a"),
            F.element_at("b", 1).alias("species_b"),
            F.element_at("b", 2).alias("raw_gene_b"),
            "otype", "panther_id",
        )
        pair = (
            pair.withColumn("taxon_a", _static(SPECIES_TAXON, F.col("species_a")))
            .withColumn("taxon_b", _static(SPECIES_TAXON, F.col("species_b")))
            # OR-semantics taxon filter (Panther.py:223-230, P5)
            .filter(F.col("taxon_a").isin(self.tax_ids) | F.col("taxon_b").isin(self.tax_ids))
            .withColumn("gene_a", _clean_gene_id(F.col("raw_gene_a"), F.col("species_a")))
            .withColumn("gene_b", _clean_gene_id(F.col("raw_gene_b"), F.col("species_b")))
            # unprocessable ids dropped (Panther.py:239-247)
            .filter(F.col("gene_a").isNotNull() & F.col("gene_b").isNotNull())
            .withColumn("predicate", _static(ORTHOLOGY_REL, F.col("otype")))
            .filter(F.col("predicate").isNotNull())
            .withColumn("evidence", F.array(F.lit(PHYLO_EVIDENCE)))
            .withColumn("family_id", F.concat(F.lit("PANTHER:"), F.col("panther_id")))
        )

        # definedby is the SOURCE name in the id digest: OrthologyAssoc is
        # constructed with definedby=self.name (Panther.py:254)
        assoc = association_triples(
            pair, "gene_a", "predicate", "gene_b", evidence_col="evidence",
            definedby=g, graph_id=g,
        )
        keyed = with_assoc_id(pair, "gene_a", "predicate", "gene_b", definedby=g)
        # family membership points FAMILY → gene via 'has member'
        # (OrthologyAssoc.add_gene_family_to_graph → Family.addMember,
        # Family.py:22-31); the family node is typed gene_family directly
        # (addIndividualToGraph with an explicit type, no NamedIndividual)
        family = union_graphs(
            make_triples(keyed, "family_id", F.lit(T.TYPE), F.lit(GENE_FAMILY), graph_id=g),
            make_triples(keyed, "family_id", F.lit(HAS_MEMBER), "gene_a", graph_id=g),
            make_triples(keyed, "family_id", F.lit(HAS_MEMBER), "gene_b", graph_id=g),
        )
        facts = union_graphs(
            make_triples(pair, "gene_a", F.lit(T.TYPE), F.lit(GENE), graph_id=g),
            make_triples(pair, "gene_b", F.lit(T.TYPE), F.lit(GENE), graph_id=g),
            make_triples(
                pair, "gene_a", F.lit(T.IN_TAXON),
                F.concat(F.lit("NCBITaxon:"), F.col("taxon_a")), graph_id=g,
            ),
            make_triples(
                pair, "gene_b", F.lit(T.IN_TAXON),
                F.concat(F.lit("NCBITaxon:"), F.col("taxon_b")), graph_id=g,
            ),
        )
        return union_graphs(assoc, family, facts).dropDuplicates(
            ["subject", "predicate", "object"]
        )
