"""IMPC genotype→phenotype pipeline with the full GENO part hierarchy and
SEPIO evidence/provenance star.

Reference behavior: dipper/sources/IMPC.py — ``_process_data`` 199-559
(zygosity/sex resolution, allele/strain bnode rewrites, sequence-alteration
extraction from ``Gene<tm1a>`` symbols, colony → VSLC → genotype →
sex-qualified-genotype chain, hardcoded ECO:0000015 evidence),
``_add_study_provenance`` 592-697, ``_add_evidence`` 699-760,
``_add_assertion_provenance`` 560-590.  The reference's golden test
(tests/test_impc.py:56-135) hard-codes the deterministic bnode sha1s this
pipeline reproduces via the same ``'b'+sha1[1:20]`` digests.

Spark-first: one scan; every bnode id is a column expression over the same
concatenations the reference hashes; the 6-level genotype partonomy is six
narrow selects unioned, not a stateful builder.  Nothing shuffles until the
final dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.ids import make_id
from dipper_spark.core.vocab import TranslationTable
from dipper_spark.models import g2p_association_triples, individual_triples, taxon_triples
from dipper_spark.models import terms as T
from dipper_spark.models.assoc import with_assoc_id
from dipper_spark.sources.base import FileContract, SourcePipeline, register

TAXON = "NCBITaxon:10090"
GENE = "SO:0000704"
SEQ_ALT = "SO:0001059"
VARIANT_LOCUS = "GENO:0000002"
IS_ALLELE_OF = "GENO:0000408"
VSLC = "GENO:0000030"
GVC = "GENO:0000009"
HAS_VARIANT_PART = "GENO:0000382"
HAS_REFERENCE_PART = "GENO:0000385"
HAS_ZYGOSITY = "GENO:0000608"
HAS_GENOTYPE = "GENO:0000222"
SEQ_DERIVES_FROM = "GENO:0000639"
GENOMIC_BACKGROUND = "GENO:0000611"
INTRINSIC_GENOTYPE = "GENO:0000719"
STEM_CELL_LINE = "ERO:0002002"
HAS_PHENOTYPE = "RO:0002200"
MUTANT_PHENOTYPE_EVIDENCE = "ECO:0000015"
STUDY = "OBI:0000471"
P_VALUE = "OBI:0000175"
EFFECT_SIZE = "STATO:0000085"
FOLD_CHANGE = "STATO:0000169"
HAS_VALUE = "STATO:0000129"
OUTPUT_OF = "RO:0002353"
MEASURES_PARAMETER = "SEPIO:0000114"
HAS_SUPPORTING_ACTIVITY = "SEPIO:0000085"
IS_ASSERTION_SUPPORTED_BY = "SEPIO:0000111"
HAS_AGENT = "SEPIO:0000017"
ORGANIZATION = "foaf:organization"
HAS_SEX_SPECIFICITY = ":has_sex_specificity"

#: impc localtt ∘ globaltt (translationtable/impc.yaml + GLOBAL_TERMS.yaml)
ZYGOSITY_ID = {
    "heterozygote": "GENO:0000458",   # simple heterozygous
    "homozygote": "GENO:0000136",
    "hemizygote": "GENO:0000134",
    "not_applicable": "GENO:0000137",  # indeterminate
}
INDETERMINATE = "GENO:0000137"
SEX_GENOTYPE_TYPE = {"male": "GENO:0000646", "female": "GENO:0000647"}
SEX_TERM = {"male": "PATO:0000384", "female": "PATO:0000383"}
STATISTICAL_MODEL = "STATO:0000107"  # fallback: localtt 'Unknown' → 'statistical model'
PROJECT = "VIVO:Project"
IMPC_AGENT = "https://www.mousephenotype.org/"  # localtt['IMPC']
IMPC_AGENT_LABEL = "International Mouse Phenotyping Consortium"

#: the impc localtt ∘ globaltt chain (translationtable/impc.yaml)
_TT = TranslationTable.for_source("impc")


def _map_lit(mapping: dict[str, str], key: Column) -> Column:
    return F.element_at(F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]), key)


def _bnode(*parts: Column) -> Column:
    """make_id(..., '_') — dipper's deterministic blank node (IMPC.py:248-256)."""
    return make_id(F.concat(*parts), prefix="_")


def study_provenance_triples(df: DataFrame, graph_id: str = "impc") -> DataFrame:
    """_add_study_provenance (IMPC.py:593-697): the study bnode (sha1 over its
    8 defining fields) typed OBI:0000471, has_part procedure + resolved
    statistical method, measures_parameter, the colony individual, the
    localtt-resolved phenotyping-center agent, and part_of pipeline +
    comma-split project(s).

    Input columns: phenotyping_center colony_id project_name pipeline_name
    pipeline_stable_id procedure_stable_id procedure_name parameter_stable_id
    parameter_name statistical_method resource_name.
    """
    g = graph_id
    d = (
        df.withColumn(
            "study_bnode",
            _bnode(
                F.concat(
                    "phenotyping_center", "colony_id", "project_name", "pipeline_stable_id",
                    "procedure_stable_id", "parameter_stable_id", "statistical_method",
                    "resource_name",
                )
            ),
        )
        .withColumn("procedure_curie", F.concat(F.lit("IMPC-proc:"), F.col("procedure_stable_id")))
        .withColumn("pipeline_curie", F.concat(F.lit("IMPC-pipe:"), F.col("pipeline_stable_id")))
        .withColumn(
            "parameter_curie",
            F.concat(
                F.lit("IMPC-param:"), F.col("procedure_stable_id"), F.lit("#"), F.col("parameter_stable_id")
            ),
        )
        .withColumn("parameter_label", F.concat(F.col("parameter_name"), F.lit(" ("), F.col("procedure_name"), F.lit(")")))
        .withColumn("stat_method_id", _TT.resolve("statistical_method", default=F.lit(STATISTICAL_MODEL)))
        .withColumn("colony_bnode", _bnode(F.col("colony_id")))
        # reference: self.localtt[phenotyping_center] — strict lookup; a miss
        # raises there, here the null rows are filtered (vocab.py contract)
        .withColumn("center_id", _map_lit(_TT.localtt, F.col("phenotyping_center")))
    )
    centers = d.filter(F.col("center_id").isNotNull())
    projects = (
        d.filter(F.col("project_name") != "")
        .select("study_bnode", "project_name", F.explode(F.split("project_name", ",")).alias("_prj"))
        .withColumn("project_id", _map_lit(_TT.localtt, F.col("_prj")))
        .filter(F.col("project_id").isNotNull())
    )
    return union_graphs(
        individual_triples(d, "study_bnode", F.lit(STUDY), graph_id=g),
        individual_triples(d, "procedure_curie", label_col="procedure_name", graph_id=g),
        make_triples(d, "study_bnode", F.lit(T.HAS_PART), "procedure_curie", graph_id=g),
        make_triples(d, "study_bnode", F.lit(T.HAS_PART), "stat_method_id", graph_id=g),
        individual_triples(d, "parameter_curie", label_col="parameter_label", graph_id=g),
        make_triples(d, "study_bnode", F.lit(MEASURES_PARAMETER), "parameter_curie", graph_id=g),
        individual_triples(d, "colony_bnode", label_col="colony_id", graph_id=g),
        individual_triples(centers, "center_id", F.lit(ORGANIZATION), label_col="phenotyping_center", graph_id=g),
        make_triples(centers, "study_bnode", F.lit(HAS_AGENT), "center_id", graph_id=g),
        individual_triples(d, "pipeline_curie", label_col="pipeline_name", graph_id=g),
        make_triples(d, "study_bnode", F.lit(T.PART_OF), "pipeline_curie", graph_id=g),
        individual_triples(projects, "project_id", F.lit(PROJECT), label_col="project_name", graph_id=g),
        make_triples(projects, "study_bnode", F.lit(T.PART_OF), "project_id", graph_id=g),
    )


def evidence_triples(df: DataFrame, graph_id: str = "impc") -> DataFrame:
    """_add_evidence (IMPC.py:699-760): evidence-line bnode sha1(assoc_id +
    study_bnode) typed by the ECO id, SEPIO:0000084 measurement bnodes for
    p-value (xsd:double-typed when parseable, mirroring the reference's
    ``float(p_value)``), percentage_change (only when non-empty — the one
    properly-guarded branch) and effect_size (always, kept a string), each
    output_of the study; evidence line has_supporting_activity study.

    Input columns: assoc_id eco_id p_value percentage_change effect_size
    study_bnode.
    """
    g = graph_id
    d = (
        df.withColumn("evidence_line", _bnode(F.concat("assoc_id", "study_bnode")))
        .withColumn("p_value_bnode", _bnode(F.col("evidence_line"), F.lit("p_value"), F.col("p_value")))
        .withColumn("_p_double", F.expr("try_cast(p_value as double)"))
        .withColumn("effect_bnode", _bnode(F.col("evidence_line"), F.lit("effect_size"), F.col("effect_size")))
        .withColumn(
            "pct_bnode",
            F.when(
                F.col("percentage_change") != "",
                _bnode(F.col("evidence_line"), F.lit("percentage_change"), F.col("percentage_change")),
            ),
        )
    )
    pct = d.filter(F.col("pct_bnode").isNotNull())
    return union_graphs(
        make_triples(d, "assoc_id", F.lit(T.HAS_SUPPORTING_EVIDENCE), "evidence_line", graph_id=g),
        individual_triples(d, "evidence_line", F.col("eco_id"), graph_id=g),
        # p-value measurement: Evidence.add_supporting_data emits the value
        # only when non-empty; float-parseable values are typed doubles
        individual_triples(d, "p_value_bnode", F.lit(P_VALUE), graph_id=g),
        make_triples(d, "evidence_line", F.lit(T.IS_EVIDENCE_FOR), "p_value_bnode", graph_id=g),
        make_triples(
            d.filter(F.col("_p_double").isNotNull()),
            "p_value_bnode", F.lit(HAS_VALUE), F.col("_p_double").cast("string"),
            is_literal=True, datatype="xsd:double", graph_id=g,
        ),
        make_triples(
            d.filter(F.col("_p_double").isNull() & (F.col("p_value") != "")),
            "p_value_bnode", F.lit(HAS_VALUE), "p_value", is_literal=True, graph_id=g,
        ),
        make_triples(d, "p_value_bnode", F.lit(OUTPUT_OF), "study_bnode", graph_id=g),
        # effect size: bnode always (reference's or-guard is always true),
        # value stays a plain string
        individual_triples(d, "effect_bnode", F.lit(EFFECT_SIZE), graph_id=g),
        make_triples(d, "evidence_line", F.lit(T.IS_EVIDENCE_FOR), "effect_bnode", graph_id=g),
        make_triples(
            d.filter(F.col("effect_size") != ""),
            "effect_bnode", F.lit(HAS_VALUE), "effect_size", is_literal=True, graph_id=g,
        ),
        make_triples(d, "effect_bnode", F.lit(OUTPUT_OF), "study_bnode", graph_id=g),
        # percentage change: only when non-empty
        individual_triples(pct, "pct_bnode", F.lit(FOLD_CHANGE), graph_id=g),
        make_triples(pct, "evidence_line", F.lit(T.IS_EVIDENCE_FOR), "pct_bnode", graph_id=g),
        make_triples(pct, "pct_bnode", F.lit(HAS_VALUE), "percentage_change", is_literal=True, graph_id=g),
        make_triples(pct, "pct_bnode", F.lit(OUTPUT_OF), "study_bnode", graph_id=g),
        make_triples(d, "evidence_line", F.lit(HAS_SUPPORTING_ACTIVITY), "study_bnode", graph_id=g),
    )


def assertion_provenance_triples(df: DataFrame, graph_id: str = "impc") -> DataFrame:
    """_add_assertion_provenance (IMPC.py:561-590): assertion bnode
    sha1('assertion' + assoc_id + localtt['IMPC']) typed SEPIO:0000001,
    created_by the IMPC agent (a labeled foaf:organization), asserted-in
    link from the association and supported-by link to the evidence line.

    Input columns: assoc_id evidence_line.
    """
    g = graph_id
    d = (
        df.withColumn("assertion_bnode", _bnode(F.lit("assertion"), F.col("assoc_id"), F.lit(IMPC_AGENT)))
        .withColumn("_agent", F.lit(IMPC_AGENT))
        .withColumn("_agent_label", F.lit(IMPC_AGENT_LABEL))
    )
    return union_graphs(
        individual_triples(d, "assertion_bnode", F.lit(T.ASSERTION), graph_id=g),
        individual_triples(d, "_agent", F.lit(ORGANIZATION), label_col="_agent_label", graph_id=g),
        make_triples(d, "assertion_bnode", F.lit(T.CREATED_BY), "_agent", graph_id=g),
        make_triples(d, "assoc_id", F.lit(T.IS_ASSERTED_IN), "assertion_bnode", graph_id=g),
        make_triples(d, "assertion_bnode", F.lit(IS_ASSERTION_SUPPORTED_BY), "evidence_line", graph_id=g),
    )


@register
class ImpcPipeline(SourcePipeline):
    name = "impc"
    files = {
        "g2p_assertions": FileContract(
            file="ALL_genotype_phenotype.csv.gz",
            url="ftp://ftp.ebi.ac.uk/pub/databases/impc/latest/csv/ALL_genotype_phenotype.csv.gz",
            # IMPC.py:68-105
            columns=[
                "marker_accession_id", "marker_symbol", "phenotyping_center",
                "colony_id", "sex", "zygosity", "allele_accession_id",
                "allele_symbol", "allele_name", "strain_accession_id",
                "strain_name", "project_name", "project_fullname",
                "pipeline_name", "pipeline_stable_id", "procedure_stable_id",
                "procedure_name", "parameter_stable_id", "parameter_name",
                "top_level_mp_term_id", "top_level_mp_term_name",
                "mp_term_id", "mp_term_name", "p_value", "percentage_change",
                "effect_size", "statistical_method", "resource_name",
            ],
        ),
    }
    test_ids = ["MGI:2442444", "MGI:2444824"]

    def read(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        df = spark.read.option("header", True).csv(self.path(raw_dir, "g2p_assertions"))
        for c in self.files["g2p_assertions"].columns:
            if c not in df.columns:
                df = df.withColumn(c, F.lit(""))
        for c in df.columns:
            df = df.withColumn(c, F.trim(F.coalesce(F.col(c), F.lit(""))))
        return df

    def _stage(self, df: DataFrame) -> DataFrame:
        """All id/label derivations as columns — the reference's per-row
        cleanup block (IMPC.py:238-261) and label algebra (IMPC.py:369-397)."""
        has_angle = F.col("allele_symbol").rlike("<.*>")
        mgi_allele = F.col("allele_accession_id").startswith("MGI:")
        staged = (
            df.withColumn("zygosity_id", F.coalesce(_map_lit(ZYGOSITY_ID, F.col("zygosity")), F.lit(INDETERMINATE)))
            # non-MGI allele accessions become bnodes (IMPC.py:243-245)
            .withColumn(
                "allele_id",
                F.when(mgi_allele, F.col("allele_accession_id")).otherwise(
                    _bnode(F.lit("IMPC-"), F.col("allele_accession_id"))
                ),
            )
            # strain rewrites (IMPC.py:247-256)
            .withColumn(
                "strain_id",
                F.when(F.col("strain_accession_id").startswith("MGI:"), F.col("strain_accession_id"))
                .when(F.col("strain_accession_id") == "", F.lit(None))
                .when(
                    F.col("strain_accession_id").startswith("IMPC-CURATE-"),
                    _bnode(F.col("strain_accession_id")),
                )
                .otherwise(_bnode(F.lit("IMPC:"), F.col("strain_accession_id"))),
            )
            # <tm1a(EUCOMM)Wtsi> → sequence-alteration name (IMPC.py:266-272)
            .withColumn(
                "seqalt_name",
                F.when(has_angle, F.regexp_extract("allele_symbol", r".*<(.*)>", 1)).otherwise(
                    F.col("allele_symbol")
                ),
            )
            .withColumn("has_marker", F.col("marker_accession_id") != "")
            .withColumn(
                "seqalt_id",
                F.when(~F.col("has_marker"), F.col("allele_id")).otherwise(
                    _bnode(F.lit("seqalt"), F.col("allele_id"))
                ),
            )
            # colony (IMPC.py:322-331)
            .withColumn("colony_label", F.concat_ws("|", "colony_id", "phenotyping_center"))
            .withColumn("colony_curie", _bnode(F.col("colony_label")))
            # colony VSLC of unknown zygosity (IMPC.py:333-356)
            .withColumn("vslc_colony", _bnode(F.col("allele_id"), F.lit(INDETERMINATE)))
            .withColumn("vslc_colony_label", F.concat(F.col("allele_symbol"), F.lit("/<?>")))
            # sex-agnostic genotype (IMPC.py:362-365)
            .withColumn(
                "genotype_id",
                make_id(
                    F.concat(
                        "colony_curie", "phenotyping_center", "zygosity",
                        F.coalesce("strain_id", F.lit("")),
                    )
                ),
            )
            # zygosity-dispatched second allele (IMPC.py:369-397)
            .withColumn(
                "allele2_label",
                F.when(F.col("zygosity") == "homozygote", F.col("allele_symbol"))
                .when(F.col("zygosity") == "heterozygote", F.regexp_replace("allele_symbol", "<.*", "<+>"))
                .when(F.col("zygosity") == "hemizygote", F.regexp_replace("allele_symbol", "<.*", "<0>"))
                .otherwise(F.regexp_replace("allele_symbol", "<.*", "<?>")),
            )
            .withColumn(
                "allele2_id",
                F.when(F.col("zygosity") == "homozygote", F.col("allele_id")),
            )
            .withColumn("vslc_name", F.concat_ws("/", "allele_symbol", "allele2_label"))
            .withColumn(
                "vslc_id",
                _bnode(F.concat_ws("-", "marker_accession_id", "allele_id", "zygosity")),
            )
            # phenotyping-center-specific background strain (IMPC.py:436-461)
            .withColumn(
                "pcs_label",
                F.when(
                    F.col("strain_id").isNotNull(),
                    F.concat_ws("-", "strain_name", "phenotyping_center", "colony_id"),
                ),
            )
            .withColumn("pcs_curie", F.when(F.col("pcs_label").isNotNull(), _bnode(F.col("pcs_label"))))
            .withColumn(
                "genotype_name",
                F.when(
                    F.col("pcs_label").isNotNull(),
                    F.concat(F.col("vslc_name"), F.lit(" ["), F.col("pcs_label"), F.lit("]")),
                ).otherwise(F.col("vslc_name")),
            )
            # sex-qualified genotype (IMPC.py:466-487)
            .withColumn(
                "sq_id",
                make_id(
                    F.concat(
                        "colony_curie", "phenotyping_center", "zygosity",
                        F.coalesce("strain_id", F.lit("")), "sex",
                    )
                ),
            )
            .withColumn("sq_label", F.concat(F.col("genotype_name"), F.lit(" ("), F.col("sex"), F.lit(")")))
            .withColumn(
                "sq_type",
                F.coalesce(_map_lit(SEX_GENOTYPE_TYPE, F.col("sex")), F.lit(INTRINSIC_GENOTYPE)),
            )
            # study + evidence bnodes (IMPC.py:660-674, 717-719)
            .withColumn(
                "study_bnode",
                _bnode(
                    F.concat(
                        "phenotyping_center", "colony_id", "project_name", "pipeline_stable_id",
                        "procedure_stable_id", "parameter_stable_id", "statistical_method",
                        "resource_name",
                    )
                ),
            )
        )
        return staged

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        df = self.read(spark, raw_dir)
        df = self.test_filter(df, "marker_accession_id", test_mode)
        if limit:
            df = df.limit(limit)
        # rows without a phenotype produce genotype scaffolding but no assoc
        # (IMPC.py:503-506 `continue` happens AFTER the genotype build)
        rows = self._stage(df)
        with_marker = rows.filter("has_marker")

        geno_parts = [
            # gene + variant locus + allele-of (IMPC.py:278-290)
            make_triples(with_marker, "marker_accession_id", F.lit(T.TYPE), F.lit(GENE), graph_id=g),
            make_triples(
                with_marker.filter(F.col("marker_symbol") != ""),
                "marker_accession_id", F.lit(T.LABEL), "marker_symbol", is_literal=True, graph_id=g,
            ),
            individual_triples(with_marker, "allele_id", F.lit(VARIANT_LOCUS), label_col="allele_symbol", graph_id=g),
            make_triples(with_marker, "allele_id", F.lit(IS_ALLELE_OF), "marker_accession_id", graph_id=g),
            make_triples(with_marker, "allele_id", F.lit(HAS_VARIANT_PART), "seqalt_id", graph_id=g),
            # sequence alteration node (typed for all rows, IMPC.py:297-302)
            individual_triples(rows, "seqalt_id", F.lit(SEQ_ALT), graph_id=g),
            make_triples(
                rows.filter(F.col("seqalt_name") != ""),
                "seqalt_id", F.lit(T.LABEL), "seqalt_name", is_literal=True, graph_id=g,
            ),
            # colony individual + its unknown-zygosity VSLC/genotype (IMPC.py:322-356)
            individual_triples(rows, "colony_curie", F.lit(STEM_CELL_LINE), label_col="colony_label", graph_id=g),
            individual_triples(rows, "vslc_colony", F.lit(INTRINSIC_GENOTYPE), label_col="vslc_colony_label", graph_id=g),
            make_triples(rows, "vslc_colony", F.lit(HAS_VARIANT_PART), "allele_id", graph_id=g),
            make_triples(rows, "vslc_colony", F.lit(HAS_ZYGOSITY), F.lit(INDETERMINATE), graph_id=g),
            make_triples(rows, "colony_curie", F.lit(HAS_GENOTYPE), "vslc_colony", graph_id=g),
            # sex-agnostic genotype stanza (IMPC.py:362-431)
            individual_triples(rows, "genotype_id", F.lit(INTRINSIC_GENOTYPE), label_col="genotype_name", graph_id=g),
            make_triples(rows, "genotype_id", F.lit(SEQ_DERIVES_FROM), "colony_curie", graph_id=g),
            individual_triples(rows, "vslc_id", F.lit(VSLC), label_col="vslc_name", graph_id=g),
            make_triples(rows, "vslc_id", F.lit(T.TYPE), F.lit(GVC), graph_id=g),
            make_triples(rows, "vslc_id", F.lit(HAS_VARIANT_PART), "allele_id", graph_id=g),
            make_triples(
                rows.filter(F.col("allele2_id").isNotNull()),
                "vslc_id", F.lit(HAS_VARIANT_PART), "allele2_id", graph_id=g,
            ),
            make_triples(rows, "vslc_id", F.lit(HAS_ZYGOSITY), "zygosity_id", graph_id=g),
            make_triples(rows, "genotype_id", F.lit(HAS_VARIANT_PART), "vslc_id", graph_id=g),
        ]

        bg = rows.filter(F.col("strain_id").isNotNull())
        background_parts = [
            individual_triples(bg, "strain_id", F.lit(GENOMIC_BACKGROUND), label_col="strain_name", graph_id=g),
            individual_triples(bg, "pcs_curie", F.lit(GENOMIC_BACKGROUND), label_col="pcs_label", graph_id=g),
            make_triples(bg, "pcs_curie", F.lit(SEQ_DERIVES_FROM), "strain_id", graph_id=g),
            make_triples(bg, "genotype_id", F.lit(HAS_REFERENCE_PART), "pcs_curie", graph_id=g),
            taxon_triples(bg.select(F.col("pcs_curie").alias("e"), F.lit(TAXON).alias("t")), "e", "t", graph_id=g),
            taxon_triples(bg.select(F.col("strain_id").alias("e"), F.lit(TAXON).alias("t")), "e", "t", graph_id=g),
            taxon_triples(
                rows.filter(F.col("strain_id").isNull()).select(F.col("genotype_id").alias("e"), F.lit(TAXON).alias("t")),
                "e", "t", graph_id=g,
            ),
        ]

        sq_parts = [
            individual_triples(rows, "sq_id", F.col("sq_type"), label_col="sq_label", graph_id=g),
            make_triples(rows, "sq_id", F.lit(HAS_VARIANT_PART), "genotype_id", graph_id=g),
        ]

        # ---- G2P association + SEPIO star (phenotype rows only) ------------
        ph = (
            rows.filter(F.col("mp_term_id") != "")
            .withColumn("predicate", F.lit(HAS_PHENOTYPE))
            .withColumn("evidence", F.array(F.lit(MUTANT_PHENOTYPE_EVIDENCE)))
        )
        assoc = g2p_association_triples(
            ph, "sq_id", "mp_term_id", "predicate",
            evidence_col="evidence", definedby="impc", graph_id=g,
        )
        keyed = with_assoc_id(ph, "sq_id", "predicate", "mp_term_id", definedby="impc")
        _eff_d = F.expr("try_cast(effect_size as double)")
        _p_d = F.expr("try_cast(p_value as double)")
        _desc_tokens = [
            "mp_term_name", F.lit("phenotype determined by"), "phenotyping_center",
            F.lit("in an"), "procedure_name", F.lit("assay where"), F.trim("parameter_name"),
            F.lit("was measured with an effect_size of"),
        ]
        keyed = (
            keyed.withColumn("eco_id", F.lit(MUTANT_PHENOTYPE_EVIDENCE))
            .withColumn("evidence_line", _bnode(F.col("assoc_id"), F.col("study_bnode")))
            # free-text description (IMPC.py:526-539): numeric formatting when
            # both parse, the reference's ValueError fallback keeps raw strings
            .withColumn(
                "description",
                F.when(
                    _eff_d.isNotNull() & _p_d.isNotNull(),
                    F.concat_ws(
                        " ", *_desc_tokens,
                        F.round(_eff_d, 5).cast("string"),
                        F.lit("(p ="), F.format_string("%.4e", _p_d), F.lit(")."),
                    ),
                ).otherwise(
                    F.concat_ws(
                        " ", *_desc_tokens, "effect_size",
                        F.lit("(p ="), "p_value", F.lit(")."),
                    )
                ),
            )
        )
        evidence_parts = [
            # sex specificity on the assoc node (IMPC.py:527)
            make_triples(
                keyed.filter(F.col("sex").isin(*SEX_TERM)),
                "assoc_id", F.lit(HAS_SEX_SPECIFICITY), _map_lit(SEX_TERM, F.col("sex")), graph_id=g,
            ),
            evidence_triples(keyed, graph_id=g),
            study_provenance_triples(keyed, graph_id=g),
            assertion_provenance_triples(keyed, graph_id=g),
            # description lands on the evidence line (IMPC.py:553)
            make_triples(keyed, "evidence_line", F.lit(T.DESCRIPTION), "description", is_literal=True, graph_id=g),
        ]

        return union_graphs(
            *geno_parts, *background_parts, *sq_parts, assoc, *evidence_parts
        ).dropDuplicates(["subject", "predicate", "object"])
