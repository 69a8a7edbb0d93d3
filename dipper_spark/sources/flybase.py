"""FlyBase pipeline: allele phenotypes with qualifier disambiguation, gene
xrefs, allele→gene loci, disease models.

Reference behavior: dipper/sources/FlyBase.py —
``_process_allele_phenotype`` (213-358: ``@FBcv0000351:lethal@``-style term
strings; first term is the phenotype, the rest become has-qualifier terms
that ALSO participate in the association id so qualifier-variants stay
distinct assocs; FBrf pubs fall back to FlyBase curies with titles),
``_species_to_ncbi_tax`` (359-415: the ``species.ab`` prefix→taxon map with
hardcoded P/Drer additions), ``_get_foreign_transgenic_alleles`` (458-497:
non-drosophilid allele-symbol prefixes), ``_process_gene_xref`` (499-547:
EntrezGene/HGNC equivalentClass cliques), ``_process_allele_gene``
(548-675: allele individuals + gene classes + affected-locus edges, foreign
transgenics skipped, non-drosophilid genes unlabelled),
``_process_disease_model`` (676-765: 'model of' rows → is-model-of with
pub-map-resolved sources, mutant-phenotype ECO or free-text description).

Spark-first: every driver dict (species map, pub map, transgenic list) is a
broadcast dim; the @term@ explosion is regexp_extract_all + explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import (
    association_triples,
    class_triples,
    individual_triples,
    pairwise_triples,
    reference_triples,
)
from dipper_spark.models import terms as T
from dipper_spark.models.assoc import with_assoc_id
from dipper_spark.sources.base import FileContract, SourcePipeline, register

GENE = "SO:0000704"
ALLELE = "GENO:0000512"
HAS_PHENOTYPE = "RO:0002200"
IS_MODEL_OF = "RO:0003301"
MUTANT_PHENOTYPE = "ECO:0000015"
DMEL = "NCBITaxon:7227"
DRER = "NCBITaxon:7955"

#: prefixes kept under the FlyBase curie (FlyBase.py:249)
FLY_PREFIXES = ["FBal", "FBti", "FBab", "FBba", "FBtp"]

ALLELE_PHENO_COLS = ["allele_id", "pheno_desc", "pheno_type", "pub_id", "pub_title", "pmid_id"]
GENE_XREF_COLS = ["gene_id", "xref_id", "xref_source"]
ALLELE_GENE_COLS = ["AlleleID", "AlleleSymbol", "GeneID", "GeneSymbol"]
DISEASE_COLS = [
    "FBgn ID", "Gene symbol", "HGNC ID", "DO qualifier", "DO ID", "DO term",
    "Allele used in model (FBal ID)", "Allele used in model (symbol)",
    "Based on orthology with (HGNC ID)", "Based on orthology with (symbol)",
    "Evidence/interacting alleles", "Reference (FBrf ID)",
]
SPECIES_COLS = [
    "internal_id", "taxgroup", "abbreviation", "genus", "species name",
    "common name", "comment", "ncbi-taxon-id",
]
REF_PUBMED_COLS = ["FBrf", "PMID", "PMCID", "DOI", "pub_type", "miniref", "pmid_added"]

#: '@FBcv0000351:lethal@' — id:label pairs bordered by @ (FlyBase.py:252-253)
TERM_RE = r"@([\w]*):([^:@]*)@"
ID_RE = r"^([a-zA-Z]+)(\d+)"


def _term_curie(term: Column) -> Column:
    """Raw term id ('FBcv0000351' / 'FBal0130657') → curie: fly prefixes keep
    the whole token under FlyBase:, others split prefix:digits
    (FlyBase.py:334-344)."""
    prefix = F.regexp_extract(term, ID_RE, 1)
    digits = F.regexp_extract(term, ID_RE, 2)
    return F.when(
        prefix.isin(*FLY_PREFIXES), F.concat(F.lit("FlyBase:"), term)
    ).otherwise(F.concat_ws(":", prefix, digits))


@register
class FlyBasePipeline(SourcePipeline):
    name = "flybase"
    files = {
        "allele_phenotype": FileContract(
            file="allele_phenotype.tsv", url=None, columns=ALLELE_PHENO_COLS,
        ),
        "gene_xref": FileContract(
            file="gene_xref.tsv", url=None, columns=GENE_XREF_COLS,
        ),
        "disease_model": FileContract(
            file="disease_model_annotations.tsv.gz",
            url="ftp://ftp.flybase.net/releases/current/precomputed_files/human_disease/disease_model_annotations.tsv.gz",
            columns=DISEASE_COLS,
        ),
        "species_map": FileContract(
            file="species.ab.gz",
            url="ftp://ftp.flybase.net/releases/current/precomputed_files/species/species.ab.gz",
            columns=SPECIES_COLS,
        ),
        "allele_gene": FileContract(
            file="fbal_to_fbgn_fb.tsv.gz",
            url="ftp://ftp.flybase.net/releases/current/precomputed_files/alleles/fbal_to_fbgn_fb.tsv.gz",
            columns=ALLELE_GENE_COLS,
        ),
        "ref_pubmed": FileContract(
            file="fbrf_pmid_pmcid_doi_fb.tsv.gz",
            url="ftp://ftp.flybase.net/releases/current/precomputed_files/references/fbrf_pmid_pmcid_doi_fb.tsv.gz",
            columns=REF_PUBMED_COLS,
        ),
    }
    test_ids = ["FlyBase:FBal0195705"]

    # ---- dimension builders ------------------------------------------------

    def _species_dim(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """prefix → (taxgroup, taxon curie); ' | '-delimited with comment
        preamble; hardcoded P/Drer rows appended (FlyBase.py:359-414)."""
        from dipper_spark.io.readers import read_delim

        # the real species.ab preamble uses '!' comment lines
        raw = read_delim(
            spark, self.path(raw_dir, "species_map"), None,
            sep="|", header=False, comment="!", src_key="species_map",
        )
        cols = [F.trim(F.col(c)).alias(n) for c, n in zip(raw.columns, SPECIES_COLS)]
        sp = (
            raw.select(*cols)
            .select(
                F.col("abbreviation").alias("prefix"),
                F.col("taxgroup"),
                F.regexp_replace("ncbi-taxon-id", "taxon", "NCBITaxon").alias("taxon"),
            )
            .filter(
                F.col("prefix").isNotNull() & (F.col("prefix") != "")
                & F.col("taxon").isNotNull() & (F.col("taxon") != "")
                & F.col("taxon").startswith("NCBITaxon:")
            )
        )
        extra = sp.sparkSession.createDataFrame(
            [("P", "drosophilid", DMEL), ("Drer", "non-drosophilid eukaryote", DRER)],
            ["prefix", "taxgroup", "taxon"],
        )
        return sp.unionByName(extra.join(sp.select("prefix"), "prefix", "left_anti"))

    def _pub_dim(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """FBrf → PMID curie (FlyBase.py:416-456; latin-1, '#'-comment
        preamble and trailer)."""
        from dipper_spark.io.readers import read_delim

        raw = read_delim(
            spark, self.path(raw_dir, "ref_pubmed"), None,
            header=False, comment="#", encoding="ISO-8859-1", src_key="ref_pubmed",
        )
        return raw.select(
            F.col(raw.columns[0]).alias("FBrf"),
            F.concat(F.lit("PMID:"), F.col(raw.columns[1])).alias("pmid"),
        ).filter(F.col("FBrf").startswith("FBrf") & F.col(raw.columns[1]).isNotNull())

    def _allele_gene_rows(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """fbal_to_fbgn rows with the allele/gene symbol species prefixes
        extracted (FlyBase.py:548-586); '#'-prefixed header + version line."""
        from dipper_spark.io.readers import read_delim

        raw = read_delim(
            spark, self.path(raw_dir, "allele_gene"), None,
            header=False, comment="#", src_key="allele_gene",
        )
        named = raw.select(
            *[F.col(c).alias(n) for c, n in zip(raw.columns, ALLELE_GENE_COLS)]
        ).filter(F.col("AlleleID").startswith("FBal"))
        # species prefix = token before a literal backslash in the symbol
        return named.select(
            "AlleleID", "AlleleSymbol", "GeneID", "GeneSymbol",
            F.regexp_extract("AlleleSymbol", r"^(\w*)\\", 1).alias("allele_prefix"),
            F.regexp_extract("GeneSymbol", r"^(\w*)\\", 1).alias("gene_prefix"),
        )

    def _transgenic_alleles(self, allele_gene: DataFrame, species: DataFrame) -> DataFrame:
        """FBal ids whose symbol prefix is non-drosophilid or unknown
        (FlyBase.py:458-497) — one column 'allele_id'."""
        prefixed = allele_gene.filter(F.col("allele_prefix") != "")
        joined = prefixed.join(
            F.broadcast(species.withColumnRenamed("prefix", "allele_prefix")),
            "allele_prefix", "left",
        )
        return joined.filter(
            F.col("taxgroup").isNull() | (F.col("taxgroup") != "drosophilid")
        ).select(F.col("AlleleID").alias("allele_id")).distinct()

    # ---- transform ---------------------------------------------------------

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        import os

        from dipper_spark.io.readers import read_delim

        g = self.name
        species = self._species_dim(spark, raw_dir)
        allele_gene = self._allele_gene_rows(spark, raw_dir)
        transgenic = self._transgenic_alleles(allele_gene, species)

        parts: list[DataFrame] = [self._allele_gene_triples(allele_gene, species, g)]

        pheno_path = self.path(raw_dir, "allele_phenotype")
        if os.path.exists(pheno_path):
            pheno = read_delim(
                spark, pheno_path, ALLELE_PHENO_COLS,
                header=True, src_key="allele_phenotype", limit=limit,
            )
            parts.append(self._allele_phenotype_triples(pheno, transgenic, g))

        xref_path = self.path(raw_dir, "gene_xref")
        if os.path.exists(xref_path):
            xref = read_delim(
                spark, xref_path, GENE_XREF_COLS,
                header=True, src_key="gene_xref", limit=limit,
            )
            parts.append(self._gene_xref_triples(xref, g))

        disease_path = self.path(raw_dir, "disease_model")
        if os.path.exists(disease_path):
            raw = read_delim(
                spark, disease_path, None,
                header=False, comment="#", src_key="disease_model", limit=limit,
            )
            disease = raw.select(
                *[F.col(c).alias(n) for c, n in zip(raw.columns, DISEASE_COLS)]
            ).filter(F.col("FBgn ID").startswith("FBgn"))
            parts.append(self._disease_model_triples(
                disease, transgenic, self._pub_dim(spark, raw_dir), g))

        return union_graphs(*parts).dropDuplicates(["subject", "predicate", "object"])

    # ---- per-file emitters -------------------------------------------------

    @staticmethod
    def _allele_phenotype_triples(
        pheno: DataFrame, transgenic: DataFrame, g: str
    ) -> DataFrame:
        """_process_allele_phenotype (FlyBase.py:213-358)."""
        rows = (
            pheno.withColumnRenamed("allele_id", "fbal")
            .join(
                F.broadcast(transgenic.withColumnRenamed("allele_id", "fbal")),
                "fbal", "left_anti",
            )
            .filter(F.col("pheno_type") == "derived_pheno_class")
            .withColumn("allele_curie", F.concat(F.lit("FlyBase:"), "fbal"))
            # Column-arg form: a SQL string literal would eat the '\w' backslash
            .withColumn("term_ids", F.regexp_extract_all("pheno_desc", F.lit(TERM_RE), 1))
            .filter(F.size("term_ids") > 0)
            .withColumn("first_term", F.get("term_ids", 0))
            # derived_pheno_class rows must lead with an FBcv term
            .filter(F.col("first_term").startswith("FBcv"))
            .withColumn(
                "phenotype_curie",
                F.concat_ws(
                    ":",
                    F.regexp_extract("first_term", ID_RE, 1),
                    F.regexp_extract("first_term", ID_RE, 2),
                ),
            )
            .withColumn("quals", F.slice("term_ids", 2, 10000))
            # qualifiers participate in the association id so variants of the
            # same (allele, phenotype) stay distinct (FlyBase.py:319-326)
            .withColumn(
                "qual_key",
                F.when(F.size("quals") > 0, F.array_join("quals", "+")),
            )
            .withColumn(
                "ref_curie",
                F.when(
                    F.col("pmid_id").isNotNull() & (F.col("pmid_id") != ""),
                    F.concat(F.lit("PMID:"), "pmid_id"),
                ).otherwise(F.concat(F.lit("FlyBase:"), "pub_id")),
            )
            .withColumn("source", F.array("ref_curie"))
            .withColumn("_pred", F.lit(HAS_PHENOTYPE))
        )
        fb_refs = (
            rows.filter(~F.col("ref_curie").startswith("PMID:"))
            .select("ref_curie", F.col("pub_title").alias("title"))
            .distinct()
        )
        quals = (
            with_assoc_id(
                rows, "allele_curie", "_pred", "phenotype_curie",
                definedby="flybase", extra_cols=["qual_key"],
            )
            .select("assoc_id", F.explode("quals").alias("term"))
            .filter(F.col("term") != "")
            .withColumn("qual_curie", _term_curie(F.col("term")))
        )
        return union_graphs(
            association_triples(
                rows, "allele_curie", "_pred", "phenotype_curie",
                definedby="flybase", extra_id_cols=["qual_key"],
                source_col="source", graph_id=g,
            ),
            reference_triples(fb_refs, "ref_curie", title_col="title", graph_id=g),
            make_triples(quals, "assoc_id", F.lit(T.HAS_QUALIFIER), "qual_curie", is_literal=False, graph_id=g),
        )

    @staticmethod
    def _gene_xref_triples(xref: DataFrame, g: str) -> DataFrame:
        """_process_gene_xref (FlyBase.py:499-547): clique-merge equivalences."""
        rows = (
            xref.filter(F.col("xref_source").isin("EntrezGene", "HGNC"))
            .select(
                F.concat(F.lit("FlyBase:"), "gene_id").alias("gene_curie"),
                F.concat_ws(
                    ":",
                    F.when(F.col("xref_source") == "EntrezGene", F.lit("NCBIGene"))
                    .otherwise(F.lit("HGNC")),
                    F.col("xref_id"),
                ).alias("xref_curie"),
            )
        )
        return pairwise_triples(rows, "gene_curie", "xref_curie", T.EQUIVALENT_CLASS, graph_id=g)

    @staticmethod
    def _allele_gene_triples(
        allele_gene: DataFrame, species: DataFrame, g: str
    ) -> DataFrame:
        """_process_allele_gene (FlyBase.py:548-675)."""
        ag = (
            allele_gene
            .join(
                F.broadcast(
                    species.select(
                        F.col("prefix").alias("allele_prefix"),
                        F.col("taxgroup").alias("a_group"),
                        F.col("taxon").alias("a_taxon"),
                    )
                ),
                "allele_prefix", "left",
            )
            .join(
                F.broadcast(
                    species.select(
                        F.col("prefix").alias("gene_prefix"),
                        F.col("taxgroup").alias("g_group"),
                        F.col("taxon").alias("g_taxon"),
                    )
                ),
                "gene_prefix", "left",
            )
            # foreign transgenic alleles (non-drosophilid or unknown prefix)
            # are skipped entirely (FlyBase.py:588-617)
            .filter(
                (F.col("allele_prefix") == "")
                | (F.coalesce(F.col("a_group"), F.lit("?")) == "drosophilid")
            )
            .withColumn("allele_curie", F.concat(F.lit("FlyBase:"), "AlleleID"))
            .withColumn("gene_curie", F.concat(F.lit("FlyBase:"), "GeneID"))
            .withColumn("allele_taxon", F.coalesce("a_taxon", F.lit(DMEL)))
            # non-drosophilid / unknown-prefix genes stay unlabelled
            .withColumn(
                "gene_label",
                F.when(
                    (F.col("gene_prefix") == "")
                    | (F.coalesce("g_group", F.lit("?")) == "drosophilid"),
                    F.col("GeneSymbol"),
                ),
            )
        )
        return union_graphs(
            individual_triples(ag, "allele_curie", F.lit(ALLELE), label_col="AlleleSymbol", graph_id=g),
            make_triples(ag, "allele_curie", F.lit(T.IN_TAXON), "allele_taxon", is_literal=False, graph_id=g),
            class_triples(
                ag.withColumn("parent", F.lit(GENE)),
                "gene_curie", label_col="gene_label", subclass_of_col="parent", graph_id=g,
            ),
            make_triples(
                ag.filter(F.col("g_taxon").isNotNull()),
                "gene_curie", F.lit(T.IN_TAXON), "g_taxon", is_literal=False, graph_id=g,
            ),
            make_triples(ag, "allele_curie", F.lit(T.HAS_AFFECTED_FEATURE), "gene_curie", is_literal=False, graph_id=g),
        )

    @staticmethod
    def _disease_model_triples(
        disease: DataFrame, transgenic: DataFrame, pubs: DataFrame, g: str
    ) -> DataFrame:
        """_process_disease_model (FlyBase.py:676-765): 'model of' rows only."""
        rows = (
            disease
            .withColumnRenamed("Allele used in model (FBal ID)", "fbal")
            .filter(F.col("fbal").isNotNull() & (F.col("fbal") != ""))
            .join(
                F.broadcast(transgenic.withColumnRenamed("allele_id", "fbal")),
                "fbal", "left_anti",
            )
            .filter(F.col("DO qualifier") == "model of")
            .withColumn("allele_curie", F.concat(F.lit("FlyBase:"), "fbal"))
            .withColumnRenamed("DO ID", "doid")
            .withColumnRenamed("Reference (FBrf ID)", "fbrf")
            .join(F.broadcast(pubs.withColumnRenamed("FBrf", "fbrf")), "fbrf", "left")
            .withColumn(
                "ref_curie",
                F.when(
                    F.col("fbrf") != "",
                    F.coalesce("pmid", F.concat(F.lit("FlyBase:"), "fbrf")),
                ),
            )
            .withColumn("source", F.when(F.col("ref_curie").isNotNull(), F.array("ref_curie")))
            .withColumnRenamed("Evidence/interacting alleles", "ev_text")
            .withColumn(
                "evidence",
                F.when(
                    F.col("ev_text") == "inferred from mutant phenotype",
                    F.array(F.lit(MUTANT_PHENOTYPE)),
                ),
            )
            .withColumn(
                "desc",
                F.when(F.col("ev_text") != "inferred from mutant phenotype", F.col("ev_text")),
            )
            .withColumn("_pred", F.lit(IS_MODEL_OF))
        )
        descs = make_triples(
            with_assoc_id(rows, "allele_curie", "_pred", "doid", definedby="flybase")
            .filter(F.col("desc").isNotNull() & (F.col("desc") != "")),
            "assoc_id", F.lit(T.DESCRIPTION), "desc", is_literal=True, graph_id=g,
        )
        return union_graphs(
            association_triples(
                rows, "allele_curie", "_pred", "doid",
                definedby="flybase", evidence_col="evidence", source_col="source", graph_id=g,
            ),
            descs,
        )
