"""WormBase pipeline: gene inventory, allele/RNAi phenotypes, GFF3 feature
placements, disease models.

Reference behavior: dipper/sources/WormBase.py —
``process_gene_ids`` (316-363: gene classes, Dead→deprecated, taxon,
synonyms), ``process_allele_phenotype`` (411-572: GAF 2.0 scan with the
variant/person ref-column unswap, WBVar→sequence-alteration-allele vs
WBRNAi→reagent-targeted-gene dispatch, person refs add
background-knowledge ECO), ``process_rnai_phenotypes`` (574-649:
space-separated RNAi|paper sets, reagent-targeted-gene bnodes labelled
``symbol<rnai>``), ``process_feature_loc`` (689-853: the second GFF3
consumer — typed features with FALDO placement on build chromosomes),
``process_disease_association`` (854-901: GAF → is-model-of assocs).
Version/WSnum probing from CHECKSUMS: WormBase.py:278-287.

Spark-first: every file is one declarative scan (read_delim/read_gaf/
read_gff); the reference's per-row regex dispatch becomes column
expressions; reagent-targeted-gene ids reuse the digest bnode family.

Known reference divergence: the Alias/other_name synonym loop
(WormBase.py:816-819) iterates both values but always emits ``other_name``;
we emit each value itself (the evident intent).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.ids import make_id
from dipper_spark.core.vocab import TranslationTable
from dipper_spark.models import (
    class_triples,
    deprecation_triples,
    family_triples,
    feature_triples,
    g2p_association_triples,
    individual_triples,
    reference_triples,
)
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register
from dipper_spark.sources.geneontology import GAF_ECO

GENE = "SO:0000704"
SEQ_ALT = "SO:0001059"
RNAI_REAGENT = "SO:0000337"
REAGENT_TARGETED_GENE = "GENO:0000504"
IS_EXPRESSION_VARIANT_OF = "GENO:0000443"
IS_ALLELE_OF = "GENO:0000408"
IS_TARGETED_BY = "GENO:0000634"
TARGETS_GENE = "GENO:0000414"
CHROMOSOME = "SO:0000340"
IS_MODEL_OF = "RO:0003301"
PERSON = "foaf:Person"
JOURNAL_ARTICLE = "IAO:0000013"
BACKGROUND_KNOWLEDGE = "ECO:0000001"  # inference from background scientific knowledge

#: non-gene feature type → SO (globaltt lookups the reference makes at
#: WormBase.py:822-825; 'inverted_repeat' is absent from the global table —
#: the reference would raise on such a row, we drop it)
FEATURE_TYPES = {
    "point_mutation": "SO:1000008",
    "deletion": "SO:0000159",
    "RNAi_reagent": "SO:0000337",
    "duplication": "SO:1000035",
    "enhancer": "SO:0000165",
    "binding_site": "SO:0000409",
    "biological_region": "SO:0001411",
    "complex_substitution": "SO:1000005",
    "substitution": "SO:1000002",
    "insertion": "SO:0000667",
}

_TT = TranslationTable.for_source("wormbase")
#: gene biotype → SO gene subtype (translationtable/wormbase.yaml ∘ global)
BIOTYPE_MAP = {
    code: _TT.globaltt[label]
    for code, label in _TT.localtt.items()
    if label in _TT.globaltt
}

GENE_ID_COLUMNS = ["taxon_num", "gene_num", "gene_symbol", "gene_synonym", "live", "gene_type"]
RNAI_COLUMNS = ["gene_num", "gene_alt_symbol", "phenotype_label", "phenotype_id", "rnai_and_refs"]


def _map_lit(mapping: dict[str, str], key: Column) -> Column:
    return F.element_at(F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]), key)


@register
class WormBasePipeline(SourcePipeline):
    name = "wormbase"
    files = {
        "gene_ids": FileContract(
            file="c_elegans.PRJNA13758.geneIDs.txt.gz",
            url="ftp://ftp.wormbase.org/pub/wormbase/releases/current-production-release/species/c_elegans/PRJNA13758/annotation/c_elegans.PRJNA13758.WSNUMBER.geneIDs.txt.gz",
            columns=GENE_ID_COLUMNS,
        ),
        "allele_pheno": FileContract(
            file="phenotype_association.wb",
            url="ftp://ftp.wormbase.org/pub/wormbase/releases/current-production-release/ONTOLOGY/phenotype_association.WSNUMBER.wb",
        ),
        "rnai_pheno": FileContract(
            file="rnai_phenotypes.wb",
            url="ftp://ftp.wormbase.org/pub/wormbase/releases/current-production-release/ONTOLOGY/rnai_phenotypes.WSNUMBER.wb",
            columns=RNAI_COLUMNS,
        ),
        "feature_loc": FileContract(
            file="c_elegans.PRJNA13758.annotations.gff3.gz",
            url="ftp://ftp.wormbase.org/pub/wormbase/releases/current-production-release/species/c_elegans/PRJNA13758/c_elegans.PRJNA13758.WSNUMBER.annotations.gff3.gz",
        ),
        "disease_assoc": FileContract(
            file="disease_association.wb",
            url="ftp://ftp.wormbase.org/pub/wormbase/releases/current-production-release/ONTOLOGY/disease_association.WSNUMBER.wb",
        ),
        "checksums": FileContract(file="CHECKSUMS", url=None),
    }
    test_ids = ["WormBase:WBGene00000898", "WormBase:WBGene00000001"]

    def _build_num(self, raw_dir: str) -> str:
        """WSnum probe from the CHECKSUMS first line (WormBase.py:278-287)."""
        path = self.path(raw_dir, "checksums")
        if os.path.exists(path):
            with open(path) as fh:
                m = re.search(r"\.(WS\d+)", fh.readline())
                if m:
                    return m.group(1)
        return "WScurrent"

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        from dipper_spark.io.readers import read_delim, read_gaf, read_gff

        g = self.name
        build_num = self._build_num(raw_dir)
        build_id = f"WormBase:{build_num}"

        parts = [self._gene_triples(spark, raw_dir, limit, test_mode, g)]
        if os.path.exists(self.path(raw_dir, "allele_pheno")):
            parts.append(self._allele_pheno_triples(
                read_gaf(spark, self.path(raw_dir, "allele_pheno"), limit=limit), g))
        if os.path.exists(self.path(raw_dir, "rnai_pheno")):
            rnai = read_delim(
                spark, self.path(raw_dir, "rnai_pheno"), RNAI_COLUMNS,
                header=False, src_key="rnai_pheno", limit=limit,
            )
            parts.append(self._rnai_pheno_triples(rnai, g))
        if os.path.exists(self.path(raw_dir, "feature_loc")):
            parts.append(self._feature_loc_triples(
                read_gff(spark, self.path(raw_dir, "feature_loc"), limit=limit),
                build_id, build_num, g))
        if os.path.exists(self.path(raw_dir, "disease_assoc")):
            parts.append(self._disease_triples(
                read_gaf(spark, self.path(raw_dir, "disease_assoc"), limit=limit), g))
        return union_graphs(*parts).dropDuplicates(["subject", "predicate", "object"])

    def _gene_triples(
        self, spark: SparkSession, raw_dir: str, limit: int | None,
        test_mode: bool, g: str,
    ) -> DataFrame:
        """process_gene_ids (WormBase.py:316-363)."""
        from dipper_spark.io.readers import read_delim

        genes = read_delim(
            spark, self.path(raw_dir, "gene_ids"), GENE_ID_COLUMNS,
            sep=",", header=False, src_key="gene_ids", limit=limit,
        ).select(
            F.concat(F.lit("WormBase:"), "gene_num").alias("gene_curie"),
            F.concat(F.lit("NCBITaxon:"), "taxon_num").alias("tax_curie"),
            # symbol falls back to the synonym column (WormBase.py:349-352)
            F.coalesce(
                F.when(F.col("gene_symbol") != "", F.col("gene_symbol")),
                F.when(F.col("gene_synonym") != "", F.col("gene_synonym")),
            ).alias("symbol"),
            F.when(
                F.col("gene_synonym").isNotNull() & (F.col("gene_synonym") != ""),
                F.col("gene_synonym"),
            ).alias("synonym"),
            "live",
        )
        genes = self.test_filter(genes, "gene_curie", test_mode)
        return union_graphs(
            class_triples(
                genes.withColumn("parent", F.lit(GENE)),
                "gene_curie", label_col="symbol", subclass_of_col="parent", graph_id=g,
            ),
            deprecation_triples(genes.filter(F.col("live") == "Dead"), "gene_curie", graph_id=g),
            make_triples(genes, "gene_curie", F.lit(T.IN_TAXON), "tax_curie", is_literal=False, graph_id=g),
            make_triples(
                genes.filter(F.col("synonym").isNotNull()),
                "gene_curie", F.lit(T.HAS_EXACT_SYNONYM), "synonym", is_literal=True, graph_id=g,
            ),
        )

    @staticmethod
    def _allele_pheno_triples(gaf: DataFrame, g: str) -> DataFrame:
        """process_allele_phenotype (WormBase.py:411-572): the ref/with
        column unswap, then WBVar/WBRNAi dispatch per exploded allele."""
        rows = gaf.filter(F.col("Qualifier") != "NOT")
        ref0 = F.trim(F.array_join("refs", "|"))
        with0 = F.array_join("with_from", "|")
        has_var = ref0.rlike("WBVar|WBRNAi")
        has_person = with0.rlike("WBPerson")
        swap = has_var | has_person
        rows = rows.select(
            F.col("DB_Object_ID").alias("gene_num"),
            F.col("GO_ID").alias("phenotype_id"),
            F.trim(F.col("Evidence_Code")).alias("eco_symbol"),
            F.when(swap, F.when(has_var, ref0)).otherwise(with0).alias("with_col"),
            F.when(swap, F.when(has_person, with0)).otherwise(ref0).alias("ref"),
        )
        alleles = (
            rows.filter(F.col("with_col").isNotNull() & (F.col("with_col") != ""))
            .select(
                "gene_num", "phenotype_id", "eco_symbol", "ref",
                F.explode(F.split("with_col", r"\|")).alias("allele_raw"),
            )
            .withColumn("allele_num", F.regexp_replace(F.trim("allele_raw"), r"^WB:", ""))
            .withColumn("allele_id", F.concat(F.lit("WormBase:"), "allele_num"))
            .withColumn("gene_id", F.concat(F.lit("WormBase:"), "gene_num"))
            .filter(F.col("allele_num").rlike("WBVar|WBRNAi"))
            .withColumn("is_rnai", F.col("allele_num").rlike("WBRNAi"))
            .withColumn(
                "ref_fixed",
                F.when(
                    F.col("ref").isNotNull() & (F.col("ref") != ""),
                    F.regexp_replace("ref", r"(WB:|WB_REF:)", "WormBase:"),
                ),
            )
            .withColumn("is_person", F.coalesce(F.col("ref_fixed").rlike("Person"), F.lit(False)))
            .withColumn("eco_id", _map_lit(GAF_ECO, F.col("eco_symbol")))
            .withColumn(
                "evidence",
                F.filter(
                    F.array(
                        F.col("eco_id"),
                        F.when(F.col("is_person"), F.lit(BACKGROUND_KNOWLEDGE)),
                    ),
                    lambda x: x.isNotNull(),
                ),
            )
            .withColumn("source", F.when(F.col("ref_fixed").isNotNull(), F.array("ref_fixed")))
        )
        rnai = alleles.filter("is_rnai")
        wbvar = alleles.filter(~F.col("is_rnai"))
        refs = alleles.filter(F.col("ref_fixed").isNotNull()).select("ref_fixed", "is_person").distinct()
        return union_graphs(
            # WBRNAi ids annotated directly as reagent-targeted genes
            individual_triples(rnai, "allele_id", F.lit(REAGENT_TARGETED_GENE), graph_id=g),
            make_triples(rnai, "allele_id", F.lit(IS_EXPRESSION_VARIANT_OF), "gene_id", is_literal=False, graph_id=g),
            # WBVars are sequence alterations treated as alleles
            individual_triples(wbvar, "allele_id", F.lit(SEQ_ALT), graph_id=g),
            make_triples(wbvar, "allele_id", F.lit(IS_ALLELE_OF), "gene_id", is_literal=False, graph_id=g),
            reference_triples(
                refs.withColumn(
                    "rtype",
                    F.when(F.col("is_person"), F.lit(PERSON)).otherwise(F.lit("IAO:0000311")),
                ),
                "ref_fixed", type_col=F.col("rtype"), graph_id=g,
            ),
            g2p_association_triples(
                alleles, "allele_id", "phenotype_id", F.lit("RO:0002200"),
                evidence_col="evidence", source_col="source", definedby="wormbase", graph_id=g,
            ),
        )

    @staticmethod
    def _rnai_pheno_triples(rnai: DataFrame, g: str) -> DataFrame:
        """process_rnai_phenotypes (WormBase.py:574-649)."""
        rows = (
            rnai.select(
                "gene_num", "gene_alt_symbol", "phenotype_id",
                F.explode(F.split("rnai_and_refs", " ")).alias("pair"),
            )
            .withColumn("rnai_num", F.split("pair", r"\|").getItem(0))
            .withColumn("ref_num", F.split("pair", r"\|").getItem(1))
            .filter(F.col("rnai_num") != "")
            .withColumn("gene_curie", F.concat(F.lit("WormBase:"), "gene_num"))
            .withColumn("rnai_curie", F.concat(F.lit("WormBase:"), "rnai_num"))
            .withColumn(
                "allele_id",
                make_id(F.concat_ws("-", "gene_num", "rnai_num"), prefix="_"),
            )
            .withColumn(
                "allele_label",
                F.concat("gene_alt_symbol", F.lit("<"), "rnai_num", F.lit(">")),
            )
            .withColumn(
                "source",
                F.when(
                    F.col("ref_num").isNotNull(),
                    F.array(F.concat(F.lit("WormBase:"), "ref_num")),
                ),
            )
        )
        return union_graphs(
            # addGeneTargetingReagent: reagent individual + targets-gene edge
            individual_triples(rows, "rnai_curie", F.lit(RNAI_REAGENT), graph_id=g),
            make_triples(rows, "rnai_curie", F.lit(TARGETS_GENE), "gene_curie", is_literal=False, graph_id=g),
            # addReagentTargetedGene: targeted-gene bnode + variant/targeted edges
            individual_triples(
                rows, "allele_id", F.lit(REAGENT_TARGETED_GENE),
                label_col="allele_label", graph_id=g,
            ),
            make_triples(rows, "allele_id", F.lit(IS_EXPRESSION_VARIANT_OF), "gene_curie", is_literal=False, graph_id=g),
            make_triples(rows, "allele_id", F.lit(IS_TARGETED_BY), "rnai_curie", is_literal=False, graph_id=g),
            g2p_association_triples(
                rows, "allele_id", "phenotype_id", F.lit("RO:0002200"),
                source_col="source", definedby="wormbase", graph_id=g,
            ),
        )

    @staticmethod
    def _feature_loc_triples(
        gff: DataFrame, build_id: str, build_num: str, g: str
    ) -> DataFrame:
        """process_feature_loc (WormBase.py:689-853)."""
        kept = gff.filter(
            F.col("feature_type").isin("gene", *FEATURE_TYPES.keys())
        )
        a = F.col("attributes")
        fid0 = a.getItem("ID")
        rows = (
            kept
            # gmap/landmark ids are skipped outright (WormBase.py:748-750)
            .filter(~F.coalesce(fid0.rlike("^(gmap|landmark)"), F.lit(False)))
            # polymorphisms aren't interesting (WormBase.py:795-797)
            .filter(a.getItem("polymorphism").isNull())
            .withColumn(
                "fid",
                F.coalesce(
                    F.when(
                        F.coalesce(fid0.rlike(r"WB(Gene|Var|sf)"), F.lit(False)),
                        F.regexp_replace(fid0, r"^\w+:WB", "WormBase:WB"),
                    ),
                    F.when(
                        a.getItem("variation").isNotNull(),
                        F.concat(F.lit("WormBase:"), a.getItem("variation")),
                    ),
                    F.when(
                        F.coalesce(a.getItem("Name").rlike("^WBsf"), F.lit(False)),
                        F.concat(F.lit("WormBase:"), a.getItem("Name")),
                    ),
                ),
            )
            .filter(F.col("fid").isNotNull())
            .withColumn("is_variation", a.getItem("variation").isNotNull())
            .withColumn(
                "flabel",
                F.when(F.col("is_variation"), a.getItem("public_name")),
            )
            # Name becomes the label when no variation label, else a synonym —
            # unless it is already embedded in the id (WormBase.py:799-806)
            .withColumn(
                "name",
                F.when(
                    a.getItem("Name").isNotNull()
                    & ~F.col("fid").contains(F.coalesce(a.getItem("Name"), F.lit(""))),
                    a.getItem("Name"),
                ),
            )
            .withColumn("flabel", F.coalesce("flabel", "name"))
            .withColumn(
                "desc",
                F.when(
                    F.col("is_variation") & a.getItem("substitution").isNotNull(),
                    F.concat(F.lit("substitution="), a.getItem("substitution")),
                ).when(
                    F.col("is_variation") & a.getItem("insertion").isNotNull(),
                    F.concat(F.lit("insertion="), a.getItem("insertion")),
                ),
            )
            .withColumn(
                "ftype",
                F.when(
                    F.col("feature_type") == "gene",
                    F.coalesce(_map_lit(BIOTYPE_MAP, a.getItem("biotype")), F.lit(GENE)),
                ).otherwise(_map_lit(FEATURE_TYPES, F.col("feature_type"))),
            )
            .withColumn("chrnum", F.regexp_replace("seqname", r"ch(r?)[omse]*", ""))
            .withColumn("chr_id", F.concat(F.lit(f"CHR:{build_num}chr"), "chrnum"))
            .withColumn("chr_inst", F.concat(F.lit(f"MONARCH:{build_num}chr"), "chrnum"))
            .withColumn(
                "chr_label",
                F.concat(F.lit("chr"), "chrnum", F.lit(f" ({build_num})")),
            )
            .withColumn("note", a.getItem("Note"))
            .withColumn("alias", a.getItem("Alias"))
            .withColumn("other_name", a.getItem("other_name"))
        )
        chroms = rows.select("chr_inst", "chr_label").distinct().withColumn(
            "build", F.lit(build_id)
        )
        syns = (
            rows.select("fid", F.explode(F.array("alias", "other_name")).alias("syn"))
            .filter(F.col("syn").isNotNull())
            .union(
                rows.filter(F.col("name").isNotNull() & F.col("is_variation")
                            & (F.col("flabel") != F.col("name")))
                .select("fid", F.col("name").alias("syn"))
            )
        )
        return union_graphs(
            # reference passes `start` for BOTH begin and end (WormBase.py:833-834)
            feature_triples(
                rows, "fid", type_col="ftype", label_col="flabel",
                chrom_col="chr_id", start_col="start", stop_col="start",
                strand_col="strand", graph_id=g,
            ),
            make_triples(
                rows.filter(F.col("desc").isNotNull()),
                "fid", F.lit(T.DESCRIPTION), "desc", is_literal=True, graph_id=g,
            ),
            make_triples(
                rows.filter(F.col("note").isNotNull() & (F.col("note") != "")),
                "fid", F.lit(T.DESCRIPTION), "note", is_literal=True, graph_id=g,
            ),
            make_triples(syns, "fid", F.lit(T.HAS_EXACT_SYNONYM), "syn", is_literal=True, graph_id=g),
            individual_triples(chroms, "chr_inst", F.lit(CHROMOSOME), label_col="chr_label", graph_id=g),
            family_triples(chroms, "build", "chr_inst", both_directions=True, graph_id=g),
        )

    @staticmethod
    def _disease_triples(gaf: DataFrame, g: str) -> DataFrame:
        """process_disease_association (WormBase.py:854-901)."""
        rows = (
            gaf.filter(F.col("Qualifier") != "NOT")
            .select(
                F.concat(F.lit("WormBase:"), "DB_Object_ID").alias("gene_id"),
                F.col("GO_ID").alias("disease_id"),
                F.trim(F.array_join("refs", "|")).alias("ref"),
                F.col("Evidence_Code").alias("eco_symbol"),
            )
            .withColumn("eco_id", _map_lit(GAF_ECO, F.col("eco_symbol")))
            .withColumn("evidence", F.when(F.col("eco_id").isNotNull(), F.array("eco_id")))
            .withColumn(
                "source",
                F.when(
                    F.col("ref") != "",
                    F.array(F.regexp_replace("ref", "WB_REF:", "WormBase:")),
                ),
            )
        )
        return g2p_association_triples(
            rows, "gene_id", "disease_id", F.lit(IS_MODEL_OF),
            evidence_col="evidence", source_col="source", definedby="wormbase", graph_id=g,
        )
