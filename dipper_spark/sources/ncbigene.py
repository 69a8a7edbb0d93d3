"""NCBI Gene pipeline: gene_info + gene_history + gene2pubmed + gene_group.

Reference behavior: dipper/sources/NCBIGene.py —
``_get_gene_info`` 183-402 (typed gene classes/individuals, synonyms,
dbxref equivalencies with per-prefix dispatch, chromosome/band placement),
``_get_gene_history`` 495-586 (deprecation + replaced-by),
``_get_gene2pubmed`` 588-667 (publication is_about gene),
``add_orthologs_by_gene_group`` 676-770 (human-anchored ortholog groups).

Spark-first shape: four independent scans, each a pure column pipeline
(explode for the pipe-separated bags, when/otherwise for the per-prefix
dbxref dispatch, regexp for the band classification).  The reference's
"two-way hash" orthology build is a self-join of the gene_group table on
the human anchor gene — no driver-side dicts.  Taxon filters sit directly
on each scan (partition-prunable if staging lands data as taxon=.../).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import (
    class_triples,
    deprecation_triples,
    individual_triples,
    orthology_triples,
    pairwise_triples,
    synonym_triples,
    taxon_triples,
    xref_triples,
)
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

GENE = "SO:0000704"
SEQUENCE_FEATURE = "SO:0000110"
HAS_GENE_PRODUCT = "RO:0002205"
IS_SUBSEQUENCE_OF = "RO:0002525"
JOURNAL_ARTICLE = "IAO:0000013"
IS_ABOUT = "IAO:0000136"
ORTHOLOGY_EVIDENCE_PUB = "PMID:24063302"  # NCBIGene.py:695-696

#: type_of_gene → SO term, the ncbigene localtt composed with globaltt
#: (translationtable/ncbigene.yaml, resolved via Source.resolve semantics)
GENE_TYPE_SO = {
    "ncRNA": "SO:0001263",
    "other": SEQUENCE_FEATURE,
    "protein-coding": "SO:0001217",
    "pseudo": "SO:0000336",
    "rRNA": "SO:0001637",
    "snRNA": "SO:0001268",
    "snoRNA": "SO:0001267",
    "tRNA": "SO:0001272",
    "unknown": SEQUENCE_FEATURE,
    "scRNA": "SO:0001266",
    "miscRNA": "SO:0000233",
    "biological-region": "SO:0001411",
}

#: dbxref curie-prefix rewrites (localtt "Curie prefixs" block) — de-stutter
#: + vendor renames; applied after taking the LAST two ':'-segments
PREFIX_REWRITES = {
    "MIM": "OMIM",
    "HGNC:HGNC": "HGNC",
    "MGI:MGI": "MGI",
    "Ensembl": "ENSEMBL",
    "FLYBASE": "FlyBase",
    "VGNC:VGNC": "VGNC",
}
PREFIX_FILTER_OUT = ["Vega", "IMGT/GENE-DB", "Araport", ""]

BAND_RE = r"[0-9A-Z]+[pq](\d+)?(\.\d+)?$"  # NCBIGene.py:211


def _map_lit(mapping: dict[str, str], key: Column) -> Column:
    return F.element_at(
        F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]), key
    )


def chrom_id(chrom: Column, tax_num: Column) -> Column:
    """makeChromID (GenomicFeature.py:402-434): ``:<tax>chr<chrom>`` in the
    base namespace — same convention as sources/ucscbands.py:127-129."""
    return F.concat(F.lit(":"), tax_num, F.lit("chr"), chrom)


@register
class NcbiGenePipeline(SourcePipeline):
    name = "ncbigene"
    files = {
        "gene_info": FileContract(
            file="gene_info.gz",
            url="https://ftp.ncbi.nih.gov/gene/DATA/gene_info.gz",
            # NCBIGene.py:46-75
            columns=[
                "tax_id", "GeneID", "Symbol", "LocusTag", "Synonyms", "dbXrefs",
                "chromosome", "map_location", "description", "type_of_gene",
                "Symbol_from_nomenclature_authority",
                "Full_name_from_nomenclature_authority", "Nomenclature_status",
                "Other_designations", "Modification_date", "Feature_type",
            ],
        ),
        "gene_history": FileContract(
            file="gene_history.gz",
            url="https://ftp.ncbi.nih.gov/gene/DATA/gene_history.gz",
            columns=["tax_id", "GeneID", "Discontinued_GeneID", "Discontinued_Symbol", "Discontinue_Date"],
        ),
        "gene2pubmed": FileContract(
            file="gene2pubmed.gz",
            url="https://ftp.ncbi.nih.gov/gene/DATA/gene2pubmed.gz",
            columns=["tax_id", "GeneID", "PubMed_ID"],
        ),
        "gene_group": FileContract(
            file="gene_group.gz",
            url="https://ftp.ncbi.nih.gov/gene/DATA/gene_group.gz",
            columns=["tax_id", "GeneID", "relationship", "Other_tax_id", "Other_GeneID"],
        ),
    }
    tax_ids = ["9606", "10090", "7955"]
    test_ids = ["NCBIGene:8", "NCBIGene:17", "NCBIGene:30188"]

    def _read(self, spark: SparkSession, raw_dir: str, key: str) -> DataFrame:
        cols = self.files[key].columns
        schema = " ".join(f"`{c}` string," for c in cols).rstrip(",")
        df = spark.read.option("sep", "\t").schema(schema).csv(self.path(raw_dir, key))
        # header line is '#tax_id ...' and comments are '#...' (NCBIGene.py:224-233)
        return df.filter(~F.col(cols[0]).startswith("#"))

    # ---- gene_info ---------------------------------------------------------

    def _gene_info_triples(self, info: DataFrame, g: str) -> list[DataFrame]:
        base = (
            info.filter(F.col("tax_id").isin(self.tax_ids))
            .select(
                F.concat(F.lit("NCBIGene:"), F.col("GeneID")).alias("gene_id"),
                F.concat(F.lit("NCBITaxon:"), F.col("tax_id")).alias("tax_curie"),
                F.col("tax_id").alias("tax_num"),
                F.when(F.col("Symbol") != "NEWENTRY", F.col("Symbol")).alias("label"),
                F.coalesce(_map_lit(GENE_TYPE_SO, F.col("type_of_gene")), F.lit(SEQUENCE_FEATURE)).alias("gene_type"),
                F.when(F.col("description") != "", F.col("description")).alias("desc"),
                F.when(F.col("Full_name_from_nomenclature_authority") != "-",
                       F.col("Full_name_from_nomenclature_authority")).alias("name"),
                F.when(F.col("Synonyms") != "-", F.split("Synonyms", r"\|")).alias("synonyms"),
                F.when(F.col("Other_designations") != "-", F.split("Other_designations", r"\|")).alias("designations"),
                F.when(F.col("dbXrefs") != "-", F.split("dbXrefs", r"\|")).alias("dbxrefs"),
                F.trim(F.col("chromosome")).alias("chrom"),
                F.trim(F.col("map_location")).alias("map_loc"),
            )
            # class-vs-individual split: sequence features aren't genes
            # (NCBIGene.py:273-278)
            .withColumn("is_class", F.col("gene_type") != SEQUENCE_FEATURE)
        )

        classes = base.filter("is_class")
        indivs = base.filter(~F.col("is_class"))
        parts = [
            class_triples(classes, "gene_id", "label", graph_id=g),
            make_triples(classes, "gene_id", F.lit(T.TYPE), "gene_type", is_literal=False, graph_id=g),
            make_triples(
                classes.filter(F.col("desc").isNotNull()),
                "gene_id", F.lit(T.DEFINITION), "desc", is_literal=True, graph_id=g,
            ),
            individual_triples(indivs, "gene_id", F.col("gene_type"), label_col="label", graph_id=g),
            make_triples(
                indivs.filter(F.col("desc").isNotNull()),
                "gene_id", F.lit(T.DEFINITION), "desc", is_literal=True, graph_id=g,
            ),
            # nomenclature full name → exact synonym (NCBIGene.py:292-293)
            make_triples(
                base.filter(F.col("name").isNotNull()),
                "gene_id", F.lit(T.HAS_EXACT_SYNONYM), "name", is_literal=True, graph_id=g,
            ),
            # pipe bags → related synonyms (NCBIGene.py:295-308)
            synonym_triples(base, "gene_id", "synonyms", synonym_type=T.HAS_RELATED_SYNONYM, graph_id=g),
            synonym_triples(base, "gene_id", "designations", synonym_type=T.HAS_RELATED_SYNONYM, graph_id=g),
            taxon_triples(base, "gene_id", "tax_curie", graph_id=g),
        ]
        parts += self._dbxref_triples(base, g)
        parts += self._placement_triples(base, g)
        return parts

    def _dbxref_triples(self, base: DataFrame, g: str) -> list[DataFrame]:
        """Per-prefix equivalency dispatch (NCBIGene.py:404-494): HPRD → gene
        product, ENSEMBL → loose xref, others → equivalentClass (classes) or
        sameAs (individuals)."""
        x = (
            base.filter(F.col("dbxrefs").isNotNull())
            .select("gene_id", "is_class", F.explode("dbxrefs").alias("dbxref"))
            .withColumn("dbxref", F.trim("dbxref"))
            # de-stutter: last two ':'-segments (NCBIGene.py:428-430)
            .withColumn("segs", F.split("dbxref", ":"))
            .withColumn("local_id", F.trim(F.element_at("segs", -1)))
            .withColumn("prefix", F.trim(F.element_at("segs", -2)))
            .filter((F.col("local_id") != "") & ~F.col("prefix").isin(PREFIX_FILTER_OUT))
            .withColumn("prefix", F.coalesce(_map_lit(PREFIX_REWRITES, F.col("prefix")), F.col("prefix")))
            .withColumn("curie", F.concat_ws(":", "prefix", "local_id"))
        )
        return [
            make_triples(
                x.filter(F.col("prefix") == "HPRD"),
                "gene_id", F.lit(HAS_GENE_PRODUCT), "curie", is_literal=False, graph_id=g,
            ),
            xref_triples(x.filter(F.col("prefix") == "ENSEMBL"), "gene_id", "curie", graph_id=g),
            pairwise_triples(
                x.filter(F.col("is_class") & ~F.col("prefix").isin("HPRD", "ENSEMBL")),
                "gene_id", "curie", T.EQUIVALENT_CLASS, graph_id=g,
            ),
            pairwise_triples(
                x.filter(~F.col("is_class") & ~F.col("prefix").isin("HPRD", "ENSEMBL")),
                "gene_id", "curie", T.SAME_AS, graph_id=g,
            ),
        ]

    def _placement_triples(self, base: DataFrame, g: str) -> list[DataFrame]:
        """Chromosome/band placement (NCBIGene.py:343-400): reject ambiguous
        multi-chromosome rows except the X|Y PAR (explode those), then either
        band-level or chromosome-level ``is subsequence of``."""
        placed = (
            base.filter((F.col("chrom") != "-") & (F.col("chrom") != ""))
            .withColumn("chrom", F.when(F.col("chrom") == "X; Y", F.lit("X|Y")).otherwise(F.col("chrom")))
            .filter(~F.col("chrom").contains("|") | (F.col("chrom") == "X|Y"))
            .select("gene_id", "tax_num", "map_loc", F.explode(F.split("chrom", r"\|")).alias("chromosome"))
            .withColumn("chrom_iri", chrom_id(F.col("chromosome"), F.col("tax_num")))
            .withColumn("band_ok", F.col("map_loc").rlike(BAND_RE))
            .withColumn(
                "band_iri",
                F.when(
                    F.col("band_ok"),
                    chrom_id(
                        # maploc already carries the chromosome prefix —
                        # strip it then re-prepend once (NCBIGene.py:377-381)
                        F.concat(
                            F.col("chromosome"),
                            F.expr("substring(map_loc, length(chromosome) + 1)"),
                        ),
                        F.col("tax_num"),
                    ),
                ),
            )
        )
        chrom_level = placed.filter(~F.col("band_ok"))
        band_level = placed.filter(F.col("band_ok"))
        return [
            # chromosome synonym label e.g. "chr1 (Homo sapiens)" simplified to
            # the tax-disambiguated label (makeChromLabel)
            make_triples(
                placed.dropDuplicates(["chrom_iri"]),
                "chrom_iri", F.lit(T.LABEL),
                F.concat(F.lit("chr"), F.col("chromosome"), F.lit(" (NCBITaxon:"), F.col("tax_num"), F.lit(")")),
                is_literal=True, graph_id=g,
            ),
            make_triples(band_level, "gene_id", F.lit(IS_SUBSEQUENCE_OF), "band_iri", is_literal=False, graph_id=g),
            make_triples(
                band_level.dropDuplicates(["band_iri"]),
                "band_iri", F.lit(T.TYPE), F.lit(T.FALDO_REGION), graph_id=g,
            ),
            make_triples(chrom_level, "gene_id", F.lit(IS_SUBSEQUENCE_OF), "chrom_iri", is_literal=False, graph_id=g),
        ]

    # ---- gene_history ------------------------------------------------------

    def _history_triples(self, hist: DataFrame, g: str) -> list[DataFrame]:
        rows = (
            hist.filter(F.col("tax_id").isin(self.tax_ids))
            .filter((F.col("GeneID") != "-") & (F.col("Discontinued_GeneID") != "-"))
            .select(
                F.concat(F.lit("NCBIGene:"), F.col("GeneID")).alias("gene_id"),
                F.concat(F.lit("NCBIGene:"), F.col("Discontinued_GeneID")).alias("old_id"),
                F.when(F.col("Discontinued_Symbol") != "-", F.col("Discontinued_Symbol")).alias("old_symbol"),
            )
        )
        return [
            class_triples(rows, "gene_id", graph_id=g),
            class_triples(rows.filter(F.col("old_symbol").isNotNull()), "old_id", "old_symbol", graph_id=g),
            # deprecate old id, point at replacement (NCBIGene.py:559-585)
            deprecation_triples(rows, "old_id", replaced_by_col="gene_id", graph_id=g),
            # old symbol becomes a synonym of the surviving gene
            make_triples(
                rows.filter(F.col("old_symbol").isNotNull()),
                "gene_id", F.lit(T.HAS_RELATED_SYNONYM), "old_symbol", is_literal=True, graph_id=g,
            ),
        ]

    # ---- gene2pubmed -------------------------------------------------------

    def _pubmed_triples(self, g2p: DataFrame, g: str) -> list[DataFrame]:
        rows = (
            g2p.filter(F.col("tax_id").isin(self.tax_ids))
            .filter((F.col("GeneID") != "-") & (F.col("PubMed_ID") != "-"))
            .select(
                F.concat(F.lit("NCBIGene:"), F.col("GeneID")).alias("gene_id"),
                F.concat(F.lit("PMID:"), F.col("PubMed_ID")).alias("pub_id"),
            )
        )
        return [
            make_triples(rows, "pub_id", F.lit(IS_ABOUT), "gene_id", is_literal=False, graph_id=g),
            make_triples(
                rows.dropDuplicates(["pub_id"]),
                "pub_id", F.lit(T.TYPE), F.lit(JOURNAL_ARTICLE), graph_id=g,
            ),
        ]

    # ---- gene_group orthology ---------------------------------------------

    def _ortholog_triples(self, grp: DataFrame, g: str) -> list[DataFrame]:
        """The reference builds group→orthologs and gene→group dicts keyed on
        the human anchor gene (NCBIGene.py:706-742) — relationally that's a
        self-join on the anchor: all genes sharing an anchor (anchor included,
        line 741) are pairwise orthologous through it."""
        edges = (
            grp.filter(F.col("relationship") == "Ortholog")
            .select(
                F.col("GeneID").alias("anchor"),
                F.col("Other_GeneID").alias("member"),
                F.col("Other_tax_id").alias("member_tax"),
            )
        )
        # anchor is a member of its own group (NCBIGene.py:740-741)
        anchors = grp.filter(F.col("relationship") == "Ortholog").select(
            F.col("GeneID").alias("anchor"),
            F.col("GeneID").alias("member"),
            F.col("tax_id").alias("member_tax"),
        ).dropDuplicates()
        members = edges.unionByName(anchors)
        pairs = (
            members.alias("a")
            .join(members.alias("b"), "anchor")
            .filter(F.col("a.member") != F.col("b.member"))
            .select(
                F.concat(F.lit("NCBIGene:"), F.col("a.member")).alias("gene1"),
                F.concat(F.lit("NCBIGene:"), F.col("b.member")).alias("gene2"),
                F.concat(F.lit("NCBITaxon:"), F.col("b.member_tax")).alias("tax2"),
            )
            .dropDuplicates(["gene1", "gene2"])
        )
        targets = pairs.select(F.col("gene2").alias("gene_id"), F.col("tax2").alias("tax_curie")).dropDuplicates()
        return [
            orthology_triples(pairs, "gene1", "gene2", graph_id=g),
            class_triples(targets, "gene_id", graph_id=g),
            make_triples(targets, "gene_id", F.lit(T.TYPE), F.lit(GENE), graph_id=g),
            taxon_triples(targets, "gene_id", "tax_curie", graph_id=g),
            # assoc provenance: the NCBI orthology-method paper
            make_triples(
                pairs, "gene1", F.lit(T.SOURCE), F.lit(ORTHOLOGY_EVIDENCE_PUB), is_literal=False, graph_id=g,
            ),
        ]

    # ---- pipeline ----------------------------------------------------------

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        info = self._read(spark, raw_dir, "gene_info")
        hist = self._read(spark, raw_dir, "gene_history")
        g2p = self._read(spark, raw_dir, "gene2pubmed")
        grp = self._read(spark, raw_dir, "gene_group")
        if test_mode:
            nums = [t.split(":")[1] for t in self.test_ids]
            info = info.filter(F.col("GeneID").isin(nums))
            hist = hist.filter(F.col("GeneID").isin(nums))
            g2p = g2p.filter(F.col("GeneID").isin(nums))
        if limit:
            info, hist, g2p, grp = (d.limit(limit) for d in (info, hist, g2p, grp))

        parts = (
            self._gene_info_triples(info, g)
            + self._history_triples(hist, g)
            + self._pubmed_triples(g2p, g)
            + self._ortholog_triples(grp, g)
        )
        return union_graphs(*parts).dropDuplicates(["subject", "predicate", "object"])
