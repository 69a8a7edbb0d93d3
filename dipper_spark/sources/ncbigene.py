"""NCBI Gene pipeline: gene_info + gene_history + gene2pubmed + gene_group.

Reference behavior: dipper/sources/NCBIGene.py —
``parse()`` 164-181 runs gene_info → gene_history → gene2pubmed;
``_get_gene_info`` 183-402 (per-taxon genome/taxon preamble, typed gene
classes/individuals, synonyms, dbxref equivalencies with per-prefix
dispatch incl. the OMIM gene-type gate and clique-leader designation,
chromosome/band placement with chromosome-class stanzas),
``_get_gene_history`` 495-586 (class-vs-individual deprecation +
replaced-by, resolved through the ``class_or_indiv`` assignment made by
gene_info), ``_get_gene2pubmed`` 588-667 (publication is_about gene,
pub typed NamedIndividual + journal article),
``add_orthologs_by_gene_group`` 676-770 — NOT run by parse()
(NCBIGene.py:691-692 "We do not run this within the NCBI parser itself");
exposed here the same way, as the composition surface ``ortholog_graph``
that OMIA-style callers invoke with their annotated gene list.

Spark-first shape: three independent scans, each a pure column pipeline
(explode for the pipe-separated bags, when/otherwise for the per-prefix
dbxref dispatch, regexp for the band classification).  The reference's
``class_or_indiv`` driver dict becomes a broadcast (gene_id → C/I) frame
joined by history/pubmed.  The OMIM gene-type gate reuses
``OmimPipeline.mim_types`` as a broadcast dimension when mimTitles.txt is
staged (same graceful-absence contract as sources/omia.py).  The
"two-way hash" orthology build is a self-join of the gene_group table on
the human anchor gene — no driver-side dicts.  Taxon filters sit directly
on each scan (partition-prunable if staging lands data as taxon=.../).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import (
    association_triples,
    class_triples,
    deprecation_triples,
    individual_triples,
    synonym_triples,
    taxon_triples,
    xref_triples,
)
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

GENE = "SO:0000704"
GENOME = "SO:0001026"
CHROMOSOME = "SO:0000340"
SEQUENCE_FEATURE = "SO:0000110"
HAS_GENE_PRODUCT = "RO:0002205"
IS_SUBSEQUENCE_OF = "RO:0002525"
ORTHOLOGOUS_TO = "RO:HOM0000017"
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

#: taxon → clique-leader curie prefix (resources/clique_leader.yaml,
#: consumed by _add_gene_equivalencies NCBIGene.py:483-489)
CLIQUE_MAP = {
    "NCBITaxon:9606": "HGNC",
    "NCBITaxon:10116": "RGD",
    "NCBITaxon:10090": "MGI",
    "NCBITaxon:7955": "ZFIN",
    "NCBITaxon:6239": "WormBase",
    "NCBITaxon:7227": "FlyBase",
    "NCBITaxon:4932": "SGD",
    "NCBITaxon:8364": "Xenbase",
    "NCBITaxon:559292": "SGD",
}

#: farm-animal taxa whose AnimalQTLdb synonyms/xrefs get informal prefixes
#: (NCBIGene.py:106-113, applied at :298-302 and :440-441)
INFORMAL_SPECIES = {
    "NCBITaxon:9913": "cattle",
    "NCBITaxon:9031": "chicken",
    "NCBITaxon:9823": "pig",
    "NCBITaxon:9940": "sheep",
    "NCBITaxon:9796": "horse",
    "NCBITaxon:8022": "rainbow_trout",
}

BAND_RE = r"[0-9A-Z]+[pq](\d+)?(\.\d+)?$"  # NCBIGene.py:211


def _map_lit(mapping: dict[str, str], key: Column) -> Column:
    return F.element_at(
        F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]), key
    )


def chrom_id(chrom: Column, tax_num: Column) -> Column:
    """makeChromID (GenomicFeature.py:402-434): ``:<tax>chr<chrom>`` in the
    base namespace — same convention as sources/ucscbands.py:127-129 so the
    gene placements land on the SAME nodes UCSCBands populates.  (The
    reference routes these through the 'CHR' OBO prefix; the base-namespace
    spelling is this repo's declared cross-source convention.)"""
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
        # optional OMIM typing dimension for the dbxref gate
        # (OMIMSource.py:28-41; graceful absence like sources/omia.py)
        "mimtitles": FileContract(
            file="mimTitles.txt",
            url="https://omim.org/static/omim/data/mimTitles.txt",
            columns=["Prefix", "MIM Number", "Preferred Title; symbol",
                     "Alternative Title(s); symbol(s)", "Included Title(s); symbols"],
            optional=True,
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

    # ---- per-taxon preamble (NCBIGene.py:212-218) --------------------------

    def _preamble_triples(self, spark: SparkSession, g: str) -> list[DataFrame]:
        """geno.addGenome(tax_curie, tax_num) + model.addClassToGraph(tax, None)
        for every taxon in the filter: the ``_:NCBITaxon:<tax>genome`` bnode
        class (label "<tax> genome", subClassOf genome — Genotype.py:529-551
        keeps the numeric label because the mangled double-prefix lookup never
        hits the translation table) and the bare taxon class."""
        taxa = spark.createDataFrame(
            [(f"NCBITaxon:{t}", t) for t in self.tax_ids], ["tax_curie", "tax_num"]
        ).withColumn(
            "genome_id", F.concat(F.lit("_:"), F.col("tax_curie"), F.lit("genome"))
        ).withColumn("genome_label", F.concat(F.col("tax_num"), F.lit(" genome")))
        return [
            class_triples(taxa, "genome_id", "genome_label", graph_id=g),
            make_triples(taxa, "genome_id", F.lit(T.SUBCLASS_OF), F.lit(GENOME), graph_id=g),
            class_triples(taxa, "tax_curie", graph_id=g),
        ]

    # ---- gene_info ---------------------------------------------------------

    def _gene_info_base(self, info: DataFrame) -> DataFrame:
        return (
            info.select(
                F.concat(F.lit("NCBIGene:"), F.col("GeneID")).alias("gene_id"),
                F.concat(F.lit("NCBITaxon:"), F.col("tax_id")).alias("tax_curie"),
                F.col("tax_id").alias("tax_num"),
                F.when(F.col("Symbol") != "NEWENTRY", F.col("Symbol")).alias("label"),
                F.coalesce(_map_lit(GENE_TYPE_SO, F.trim("type_of_gene")), F.lit(SEQUENCE_FEATURE)).alias("gene_type"),
                F.when(F.col("description") != "", F.col("description")).alias("desc"),
                F.when(F.col("Full_name_from_nomenclature_authority") != "-",
                       F.col("Full_name_from_nomenclature_authority")).alias("name"),
                F.when(F.trim("Synonyms") != "-", F.split(F.trim("Synonyms"), r"\|")).alias("synonyms"),
                F.when(F.trim("Other_designations") != "-", F.split(F.trim("Other_designations"), r"\|")).alias("designations"),
                F.when(F.trim("dbXrefs") != "-", F.split(F.trim("dbXrefs"), r"\|")).alias("dbxrefs"),
                F.trim(F.col("chromosome")).alias("chrom"),
                F.trim(F.col("map_location")).alias("map_loc"),
            )
            # class-vs-individual split: sequence features aren't genes
            # (NCBIGene.py:273-278)
            .withColumn("is_class", F.col("gene_type") != SEQUENCE_FEATURE)
            # multi-chromosome rows other than the X|Y PAR are rejected with
            # `continue` (NCBIGene.py:341-352) — which ALSO skips the row's
            # trailing geno.addTaxon (:400); bug-faithful
            .withColumn(
                "multi_skip",
                F.col("chrom").contains("|") & ~F.col("chrom").isin("X|Y", "X; Y"),
            )
        )

    def _gene_info_triples(self, base: DataFrame, g: str, mim: DataFrame | None) -> list[DataFrame]:
        classes = base.filter("is_class")
        indivs = base.filter(~F.col("is_class"))
        parts = [
            # addClassToGraph(gene_id, label, type, desc): class decl + label
            # + SUBCLASS edge for the type + dc:description (Model.py:74-128)
            class_triples(classes, "gene_id", "label", description_col="desc",
                          subclass_of_col="gene_type", graph_id=g),
            individual_triples(indivs, "gene_id", F.col("gene_type"), label_col="label", graph_id=g),
            make_triples(
                indivs.filter(F.col("desc").isNotNull()),
                "gene_id", F.lit(T.DESCRIPTION), "desc", is_literal=True, graph_id=g,
            ),
            # nomenclature full name → exact synonym (NCBIGene.py:292-293)
            make_triples(
                base.filter(F.col("name").isNotNull()),
                "gene_id", F.lit(T.HAS_EXACT_SYNONYM), "name", is_literal=True, graph_id=g,
            ),
            # pipe bags → related synonyms (NCBIGene.py:295-308); AnimalQTLdb-
            # prefixed synonyms of informal species are re-prefixed
            synonym_triples(
                base.withColumn(
                    "synonyms",
                    F.transform(
                        "synonyms",
                        lambda s: F.when(
                            F.trim(s).startswith("AnimalQTLdb:")
                            & _map_lit(INFORMAL_SPECIES, F.col("tax_curie")).isNotNull(),
                            F.concat(
                                _map_lit(INFORMAL_SPECIES, F.col("tax_curie")),
                                F.lit("QTL:"),
                                F.substring(F.trim(s), 13, 10_000),
                            ),
                        ).otherwise(F.trim(s)),
                    ),
                ),
                "gene_id", "synonyms", synonym_type=T.HAS_RELATED_SYNONYM, graph_id=g,
            ),
            synonym_triples(base, "gene_id", "designations", synonym_type=T.HAS_RELATED_SYNONYM, graph_id=g),
            # geno.addTaxon at row end (NCBIGene.py:400) — except rows the
            # multi-chromosome `continue` already ejected
            taxon_triples(base.filter(~F.col("multi_skip")), "gene_id", "tax_curie", graph_id=g),
        ]
        parts += self._dbxref_triples(base, g, mim)
        parts += self._placement_triples(base, g)
        return parts

    def _dbxref_triples(self, base: DataFrame, g: str, mim: DataFrame | None) -> list[DataFrame]:
        """Per-prefix equivalency dispatch (NCBIGene.py:404-494): HPRD → gene
        product, ENSEMBL → loose xref, OMIM → gene-typed-only xref +
        equivalence (with moved-to replacement, last gene wins), others →
        equivalentClass (classes, + clique-leader designation) or sameAs
        (individuals)."""
        x = (
            base.filter(F.col("dbxrefs").isNotNull())
            .select("gene_id", "is_class", "tax_curie", F.explode("dbxrefs").alias("dbxref"))
            .withColumn("dbxref", F.trim("dbxref"))
            # de-stutter: last two ':'-segments (NCBIGene.py:428-430)
            .withColumn("segs", F.split("dbxref", ":"))
            .withColumn("local_id", F.trim(F.element_at("segs", -1)))
            .withColumn("prefix", F.trim(F.element_at("segs", -2)))
            .filter((F.col("local_id") != "") & ~F.col("prefix").isin(PREFIX_FILTER_OUT))
            .withColumn("prefix", F.coalesce(_map_lit(PREFIX_REWRITES, F.col("prefix")), F.col("prefix")))
            # AnimalQTLdb xrefs of informal species re-prefix (:440-441)
            .withColumn(
                "prefix",
                F.when(
                    (F.col("prefix") == "AnimalQTLdb")
                    & _map_lit(INFORMAL_SPECIES, F.col("tax_curie")).isNotNull(),
                    F.concat(_map_lit(INFORMAL_SPECIES, F.col("tax_curie")), F.lit("QTL")),
                ).otherwise(F.col("prefix")),
            )
            .withColumn("curie", F.concat_ws(":", "prefix", "local_id"))
        )
        omim = x.filter(F.col("prefix") == "OMIM")
        if mim is not None:
            # replacement pass: a moved-to target that is gene-typed takes
            # over the curie — "last gene wins" (NCBIGene.py:460-467)
            typed = F.broadcast(mim.select("omim_num", "omim_type", "replaced_by"))
            gene_typed = F.broadcast(
                mim.filter(F.col("omim_type") == GENE).select(
                    F.col("omim_num").alias("rep_num"), F.lit(True).alias("rep_is_gene")
                )
            )
            omim = (
                omim.join(typed, omim["local_id"] == typed["omim_num"], "left")
                .select(
                    "*",
                    F.posexplode_outer(
                        F.coalesce("replaced_by", F.array(F.lit(None)))
                    ).alias("rep_pos", "rep"),
                )
                .join(gene_typed, F.col("rep") == F.col("rep_num"), "left")
                .withColumn(
                    "eff_num",
                    F.when(F.col("rep_is_gene"), F.col("rep")).otherwise(F.col("local_id")),
                )
                .withColumn(
                    "eff_type",
                    F.when(F.col("rep_is_gene"), F.lit(GENE)).otherwise(F.col("omim_type")),
                )
                # LAST gene-typed replacement wins, deterministically: the
                # reference overwrites in list order (NCBIGene.py:460-467),
                # so rank by (is-gene, position-in-replaced_by)
                .withColumn(
                    "rep_rank",
                    F.when(
                        F.col("rep_is_gene"), F.lit(1000) + F.col("rep_pos")
                    ).otherwise(F.lit(0)),
                )
                .groupBy("gene_id", "is_class", "tax_curie", "dbxref")
                .agg(
                    F.max_by("eff_num", F.col("rep_rank")).alias("local_id"),
                    F.max_by("eff_type", F.col("rep_rank")).alias("eff_type"),
                )
                # OMIM entries that are not gene-typed never link (:468-474)
                .filter(F.col("eff_type") == GENE)
                .withColumn("prefix", F.lit("OMIM"))
                .withColumn("curie", F.concat_ws(":", "prefix", "local_id"))
                .select("gene_id", "is_class", "tax_curie", "prefix", "curie")
            )
        else:
            # degraded mode (mimTitles.txt not staged): without the typing
            # dimension every OMIM xref would link UNGATED, equating genes
            # with phenotype/disease MIM entries and corrupting downstream
            # cliques.  The reference's gate drops untypable entries
            # (omim_num not in omim_type -> continue, NCBIGene.py:455-459),
            # so degrade in the safe direction: drop all OMIM dbxrefs.
            omim = omim.select(
                "gene_id", "is_class", "tax_curie", "prefix", "curie"
            ).filter(F.lit(False))

        equiv = (
            x.filter(~F.col("prefix").isin("HPRD", "ENSEMBL", "OMIM"))
            .select("gene_id", "is_class", "tax_curie", "prefix", "curie")
            .unionByName(omim)
        )
        parts_extra = []
        if mim is not None:
            # gene-typed OMIM also gets the loose xref before the
            # equivalence (NCBIGene.py:468-469); only meaningful when the
            # typing dimension is staged
            parts_extra.append(xref_triples(omim, "gene_id", "curie", graph_id=g))
        # clique-leader designation (NCBIGene.py:483-489): fires in the class
        # branch when the taxon's configured leader namespace matches
        leaders = equiv.filter(
            F.col("is_class")
            & (_map_lit(CLIQUE_MAP, F.col("tax_curie")) == F.col("prefix"))
        )
        return [
            make_triples(
                x.filter(F.col("prefix") == "HPRD"),
                "gene_id", F.lit(HAS_GENE_PRODUCT), "curie", is_literal=False, graph_id=g,
            ),
            xref_triples(x.filter(F.col("prefix") == "ENSEMBL"), "gene_id", "curie", graph_id=g),
            make_triples(
                equiv.filter(F.col("is_class")),
                "gene_id", F.lit(T.EQUIVALENT_CLASS), "curie", is_literal=False, graph_id=g,
            ),
            make_triples(
                equiv.filter(~F.col("is_class")),
                "gene_id", F.lit(T.SAME_AS), "curie", is_literal=False, graph_id=g,
            ),
            make_triples(
                leaders, "curie", F.lit(T.CLIQUE_LEADER), F.lit("true"),
                is_literal=True, datatype="xsd:boolean", graph_id=g,
            ),
        ] + parts_extra

    def _placement_triples(self, base: DataFrame, g: str) -> list[DataFrame]:
        """Chromosome/band placement (NCBIGene.py:343-400): reject ambiguous
        multi-chromosome rows except the X|Y PAR (explode those), then either
        band-level or chromosome-level ``is subsequence of``.  Every placed
        chromosome also gets its class stanza (geno.addChromosomeClass:
        class + subClassOf chromosome + "chr<N>" label, Genotype.py:617-625)
        and the taxon-disambiguated "chr<N> (<tax>)" exact synonym
        (NCBIGene.py:369-372)."""
        placed = (
            base.filter((F.col("chrom") != "-") & (F.col("chrom") != "") & ~F.col("multi_skip"))
            .withColumn("chrom", F.when(F.col("chrom") == "X; Y", F.lit("X|Y")).otherwise(F.col("chrom")))
            .select("gene_id", "tax_num", "map_loc", F.explode(F.split("chrom", r"\|")).alias("chromosome"))
            .withColumn("chrom_iri", chrom_id(F.col("chromosome"), F.col("tax_num")))
            # anchored like the reference's re.match (NCBIGene.py:366-368):
            # values that merely END in a band token (e.g. the X|Y PAR
            # "Xp22.3; Yp11.3", or "22q13.3|22q13.3") must fall through to
            # the chromosome-level branch, not mint malformed band IRIs
            .withColumn("band_ok", F.col("map_loc").rlike("^" + BAND_RE))
            .withColumn(
                "band_iri",
                F.when(
                    F.col("band_ok"),
                    chrom_id(
                        # maploc usually carries the chromosome prefix —
                        # strip it then re-prepend once; the reference's
                        # re.sub(r'^'+chrom, '', maploc) (NCBIGene.py:377-381)
                        # is a no-op when maploc does NOT start with chrom,
                        # so guard the strip the same way
                        F.concat(
                            F.col("chromosome"),
                            F.when(
                                F.col("map_loc").startswith(F.col("chromosome")),
                                F.expr("substring(map_loc, length(chromosome) + 1)"),
                            ).otherwise(F.col("map_loc")),
                        ),
                        F.col("tax_num"),
                    ),
                ),
            )
        )
        chroms = placed.dropDuplicates(["chrom_iri"]).withColumn(
            "chrom_label", F.concat(F.lit("chr"), F.col("chromosome"))
        ).withColumn(
            "chrom_syn",
            F.concat(F.lit("chr"), F.col("chromosome"), F.lit(" ("), F.col("tax_num"), F.lit(")")),
        )
        chrom_level = placed.filter(~F.col("band_ok"))
        band_level = placed.filter(F.col("band_ok"))
        return [
            # addChromosomeClass: class + label "chrN" + subClassOf chromosome
            class_triples(chroms, "chrom_iri", "chrom_label", graph_id=g),
            make_triples(chroms, "chrom_iri", F.lit(T.SUBCLASS_OF), F.lit(CHROMOSOME), graph_id=g),
            # makeChromLabel(chrom, tax_num) synonym (NCBIGene.py:371-372)
            make_triples(chroms, "chrom_iri", F.lit(T.HAS_EXACT_SYNONYM), "chrom_syn", is_literal=True, graph_id=g),
            make_triples(band_level, "gene_id", F.lit(IS_SUBSEQUENCE_OF), "band_iri", is_literal=False, graph_id=g),
            # the band Feature has no label/type/coords, so its whole stanza
            # is the individual declaration (Feature.addFeatureToGraph with
            # start=stop=None skips the region, GenomicFeature.py:160-172)
            make_triples(
                band_level.dropDuplicates(["band_iri"]),
                "band_iri", F.lit(T.TYPE), F.lit(T.NAMED_INDIVIDUAL), graph_id=g,
            ),
            make_triples(chrom_level, "gene_id", F.lit(IS_SUBSEQUENCE_OF), "chrom_iri", is_literal=False, graph_id=g),
        ]

    # ---- gene_history ------------------------------------------------------

    def _history_triples(self, hist: DataFrame, ci: DataFrame, g: str) -> list[DataFrame]:
        """NCBIGene.py:495-586: the branch is chosen by gene_info's
        ``class_or_indiv`` verdict for the SURVIVING gene — genes never seen
        there fall to the individual branch (dict .get returns None)."""
        rows = (
            hist.filter((F.col("GeneID") != "-") & (F.col("Discontinued_GeneID") != "-"))
            .select(
                F.concat(F.lit("NCBIGene:"), F.trim("GeneID")).alias("gene_id"),
                F.concat(F.lit("NCBIGene:"), F.trim("Discontinued_GeneID")).alias("old_id"),
                F.when(F.trim("Discontinued_Symbol") != "-", F.trim("Discontinued_Symbol")).alias("old_symbol"),
            )
            .join(F.broadcast(ci), "gene_id", "left")
            .withColumn("is_class", F.coalesce("is_class", F.lit(False)))
        )
        cls, ind = rows.filter("is_class"), rows.filter(~F.col("is_class"))
        return [
            # class branch (NCBIGene.py:555-568)
            class_triples(cls, "gene_id", graph_id=g),
            class_triples(cls, "old_id", "old_symbol", graph_id=g),
            deprecation_triples(cls, "old_id", replaced_by_col="gene_id", graph_id=g),
            # individual branch (:569-580): addDeprecatedIndividual types the
            # old id owl:NamedIndividual (Model.py:291-314)
            individual_triples(ind, "gene_id", graph_id=g),
            individual_triples(ind, "old_id", label_col="old_symbol", graph_id=g),
            make_triples(ind, "old_id", F.lit(T.TYPE), F.lit(T.NAMED_INDIVIDUAL), graph_id=g),
            deprecation_triples(ind, "old_id", replaced_by_col="gene_id", graph_id=g),
            # old symbol becomes an EXACT synonym of the surviving gene
            # (addSynonym default, NCBIGene.py:583)
            make_triples(
                rows.filter(F.col("old_symbol").isNotNull()),
                "gene_id", F.lit(T.HAS_EXACT_SYNONYM), "old_symbol", is_literal=True, graph_id=g,
            ),
        ]

    # ---- gene2pubmed -------------------------------------------------------

    def _pubmed_triples(self, g2p: DataFrame, ci: DataFrame, g: str) -> list[DataFrame]:
        """NCBIGene.py:588-667: re-declare the gene (class or individual per
        gene_info's verdict), declare the publication as a NamedIndividual
        AND journal article (Reference.addRefToGraph), then is_about."""
        rows = (
            g2p.filter((F.col("GeneID") != "-") & (F.col("PubMed_ID") != "-"))
            .select(
                F.concat(F.lit("NCBIGene:"), F.trim("GeneID")).alias("gene_id"),
                F.concat(F.lit("PMID:"), F.trim("PubMed_ID")).alias("pub_id"),
            )
            .join(F.broadcast(ci), "gene_id", "left")
            .withColumn("is_class", F.coalesce("is_class", F.lit(False)))
        )
        genes = rows.dropDuplicates(["gene_id"])
        pubs = rows.dropDuplicates(["pub_id"])
        return [
            class_triples(genes.filter("is_class"), "gene_id", graph_id=g),
            individual_triples(genes.filter(~F.col("is_class")), "gene_id", graph_id=g),
            make_triples(pubs, "pub_id", F.lit(T.TYPE), F.lit(T.NAMED_INDIVIDUAL), graph_id=g),
            make_triples(pubs, "pub_id", F.lit(T.TYPE), F.lit(JOURNAL_ARTICLE), graph_id=g),
            make_triples(rows, "pub_id", F.lit(IS_ABOUT), "gene_id", is_literal=False, graph_id=g),
        ]

    # ---- gene_group orthology (composition surface, not in parse) ----------

    def ortholog_graph(
        self,
        spark: SparkSession,
        raw_dir: str,
        gene_ids: list[str] | DataFrame,
        *,
        graph_id: str | None = None,
    ) -> DataFrame:
        """add_orthologs_by_gene_group (NCBIGene.py:676-770) — the reference
        does NOT run this in parse(); it is the convenience surface OMIA
        calls with its annotated gene list (OMIA.py:172).  The "two-way
        hash" becomes two joins: requested genes → their anchor groups →
        every member of those groups (anchor included, and the requested
        gene itself — the reference loop does not exclude self-pairs).
        Emits the reified orthology association (definedby=ncbigene,
        source PMID:24063302), the target's gene-class stanza, and its
        taxon.

        ``gene_ids`` is either a driver-side curie list (reference-shaped
        convenience) or a DataFrame with a ``gene_id`` curie column — the
        distributed path composing pipelines should prefer, since the
        annotated-gene set then never leaves the cluster.  ``graph_id``
        lets the CALLING source claim the triples for its own output file
        (the reference writes into the caller's graph, OMIA.py:172) while
        definedby stays 'ncbigene' like the reference's OrthologyAssoc."""
        g = graph_id or self.name
        grp = self._read(spark, raw_dir, "gene_group")
        edges = grp.filter(F.col("relationship") == "Ortholog").select(
            F.trim("GeneID").alias("anchor"),
            F.col("tax_id").alias("anchor_tax"),
            F.trim("Other_GeneID").alias("member"),
            F.col("Other_tax_id").alias("member_tax"),
        )
        # group_to_orthology[anchor] = members ∪ {anchor} (NCBIGene.py:740-741)
        members = edges.select("anchor", "member", "member_tax").unionByName(
            edges.select("anchor", F.col("anchor").alias("member"),
                         F.col("anchor_tax").alias("member_tax")).dropDuplicates()
        )
        if isinstance(gene_ids, DataFrame):
            wanted = gene_ids.select(
                F.regexp_replace("gene_id", "^NCBIGene:", "").alias("gene_num")
            ).dropDuplicates()
        else:
            wanted = spark.createDataFrame(
                [(i.replace("NCBIGene:", ""),) for i in gene_ids], ["gene_num"]
            )
        # gene_to_group membership is via the MEMBER side only (:736-738)
        my_groups = edges.join(
            F.broadcast(wanted), edges["member"] == wanted["gene_num"], "inner"
        ).select("gene_num", "anchor").dropDuplicates()
        pairs = (
            my_groups.join(members, "anchor")
            .select(
                F.concat(F.lit("NCBIGene:"), F.col("gene_num")).alias("gene1"),
                F.concat(F.lit("NCBIGene:"), F.col("member")).alias("gene2"),
                F.concat(F.lit("NCBITaxon:"), F.col("member_tax")).alias("tax2"),
            )
            .dropDuplicates(["gene1", "gene2"])
        )
        targets = pairs.select(F.col("gene2").alias("gene_id"), F.col("tax2").alias("tax_curie"))
        parts = [
            # addClassToGraph(oid, None, globaltt['gene']) (:760)
            class_triples(targets, "gene_id", graph_id=g),
            make_triples(targets, "gene_id", F.lit(T.SUBCLASS_OF), F.lit(GENE), graph_id=g),
            taxon_triples(targets, "gene_id", "tax_curie", graph_id=g),
            association_triples(
                pairs.withColumn("pred", F.lit(ORTHOLOGOUS_TO))
                .withColumn("src", F.array(F.lit(ORTHOLOGY_EVIDENCE_PUB))),
                "gene1", "pred", "gene2",
                definedby=self.name, source_col="src", graph_id=g,
            ),
        ]
        return union_graphs(*parts).dropDuplicates(["subject", "predicate", "object"])

    # ---- pipeline ----------------------------------------------------------

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        info = self._read(spark, raw_dir, "gene_info")
        hist = self._read(spark, raw_dir, "gene_history")
        g2p = self._read(spark, raw_dir, "gene2pubmed")
        if test_mode:
            # test mode filters on gene id ONLY — no taxon filter
            # (NCBIGene.py:262-266 and analogs in history/pubmed)
            nums = [t.split(":")[1] for t in self.test_ids]
            info = info.filter(F.col("GeneID").isin(nums))
            hist = hist.filter(F.col("GeneID").isin(nums))
            g2p = g2p.filter(F.col("GeneID").isin(nums))
        else:
            info = info.filter(F.col("tax_id").isin(self.tax_ids))
            hist = hist.filter(F.col("tax_id").isin(self.tax_ids))
            g2p = g2p.filter(F.col("tax_id").isin(self.tax_ids))
        if limit:
            info, hist, g2p = (d.limit(limit) for d in (info, hist, g2p))

        base = self._gene_info_base(info)
        # the reference's class_or_indiv driver dict, relationally
        ci = base.select("gene_id", "is_class").dropDuplicates(["gene_id"])
        mim = self._mim_dim(spark, raw_dir)

        parts = (
            self._preamble_triples(spark, g)
            + self._gene_info_triples(base, g, mim)
            + self._history_triples(hist, ci, g)
            + self._pubmed_triples(g2p, ci, g)
        )
        return union_graphs(*parts).dropDuplicates(["subject", "predicate", "object"])

    def _mim_dim(self, spark: SparkSession, raw_dir: str) -> DataFrame | None:
        """OMIM typing dimension for the dbxref gate; absent mimTitles.txt →
        ALL OMIM dbxrefs dropped (safe-direction degradation — see the
        `mim is None` branch in _add_gene_equivalencies above)."""
        import os

        if not os.path.exists(self.path(raw_dir, "mimtitles")):
            import logging

            logging.getLogger(__name__).warning(
                "ncbigene: no mimTitles.txt staged; dropping ALL OMIM "
                "dbxrefs (the gene-type gate cannot run without the typing "
                "dimension, and ungated equivalences corrupt cliques)"
            )
            return None
        from dipper_spark.sources.omim import OmimPipeline

        return OmimPipeline().mim_types(spark, raw_dir)
