"""Coriell cell-line repository pipeline (latin-1 CSV).

Reference behavior: dipper/sources/Coriell.py:249-786 (``_process_data``):
strict header assert, cell-line individuals labeled
``<collection-prefix>-<catalog_id>``, dna_ref → sameAs equivalent lines,
derives-from patient + cell type, repository membership, anonymous patient
bnodes with affected/gender/relprob labels, CoriellFamily membership,
dbSNP-individual genotypes, and affected-patient → OMIM disease
associations.

Genotype block (Coriell.py:503-733), fully decomposed Spark-first:
karyotype → bnode karyotype_variation_complement with per-affected-
chromosome anonymous sequence-alteration features (regex decomposition of
the ISCN string, Coriell.py:816-846) placed via coordinate-less FALDO
locations; OMIM variant ids → per-locus VSLCs with indeterminate zygosity;
karyotype+variants → GVC; GVC+dbSNP/anonymous genotype → intrinsic
genotype on the patient.  Everything is one latin-1 scan + column
expressions (one posexplode for the variant list, one explode for affected
chromosomes); the family/repository edges use the models.context emitters.

Two reference bugs implemented as evident intent (both driver-state
carry-over artifacts of its row loop): ``varl`` is only assigned when
gene != '' (Coriell.py:576-579), so gene-less variant rows would reuse the
PREVIOUS row's label — here they simply get no label; the omim_map
accumulation (Coriell.py:632-643) re-appends the previous var_num when a
variant fails the locus regex — here unmatched variants are dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.ids import make_id
from dipper_spark.core.literals import remove_control_chars
from dipper_spark.models import (
    class_triples,
    family_triples,
    feature_triples,
    g2p_association_triples,
    individual_triples,
)
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

CELL_LINE = "CLO:0000031"
ERO_COLLECTION = "ERO:0002190"  # globaltt['collection']
FOAF_PAGE = "foaf:page"
PERSON = "foaf:Person"
FAMILY = "PCO:0000020"
HAS_GENOTYPE = "GENO:0000222"
DERIVES_FROM = "RO:0001000"
HAS_PHENOTYPE = "RO:0002200"
MEMBER_OF = "RO:0002350"
IN_TAXON = "RO:0002162"
KARYOTYPE_VC = "GENO:0000644"  # karyotype_variation_complement
GVC = "GENO:0000009"  # genomic_variation_complement
VSLC = "GENO:0000030"  # variant single locus complement
INTRINSIC_GENOTYPE = "GENO:0000719"
SEQ_ALT = "SO:0001059"
HAS_VARIANT_PART = "GENO:0000382"
HAS_REFERENCE_PART = "GENO:0000385"
HAS_ZYGOSITY = "GENO:0000608"
INDETERMINATE = "GENO:0000137"
WILDTYPE = "GENO:0000511"

#: species → taxon (reference: resolve(species) through GLOBAL_TERMS;
#: blank defaults to human, Coriell.py:518-523)
SPECIES_TAXON = {
    "Homo sapiens": "NCBITaxon:9606",
    "Mus musculus": "NCBITaxon:10090",
    "Rattus norvegicus": "NCBITaxon:10116",
}

#: ISCN decomposition regexes (Coriell.py:820-823) — Java-regex compatible
ABERRATION_RE = r"(?:add|del|der|i|idic|inv|r|rec|t)\([\w;]+\)"
CHR_TOKEN_RE = r"(\d+|X|Y|M|\?)"
SEX_CHR_RE = r"(?:;)(X{2,}Y+|X?Y{2,}|X{3,}|X|Y)(?:;|$)"

COLUMNS = [
    "catalog_id", "description", "omim_num", "sample_type",
    "cell_line_available", "dna_in_stock", "dna_ref", "gender", "age",
    "race", "ethnicity", "affected", "karyotype", "relprob", "mutation",
    "gene", "fam", "collection", "url", "cat_remark", "pubmed_ids",
    "fammember", "variant_id", "dbsnp_id", "species",
]

#: sample_type → CL/CLO (coriell localtt ∘ globaltt)
CELL_TYPE = {"Fibroblast": "CL:0000057", "Lymphoblast": "CL:0000542"}
#: collection → repository curie (coriell localtt)
REPOSITORY = {
    "NIGMS Human Genetic Cell Repository": "CoriellCollection:NIGMS",
    "NINDS Repository": "CoriellCollection:NINDS",
    "NHGRI Sample Repository for Human Genetic Research": "CoriellCollection:NHGRI",
    "NIA Aging Cell Culture Repository": "CoriellCollection:NIA",
}


def _map_lit(mapping: dict[str, str], key: Column) -> Column:
    return F.element_at(F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]), key)


@register
class CoriellPipeline(SourcePipeline):
    name = "coriell"
    files = {
        "NIGMS": FileContract(
            file="NIGMS.csv",
            url="https://www.coriell.org/...",  # sftp-staged in the reference (Coriell.py:156-231)
            columns=COLUMNS,
        ),
    }
    test_ids = ["GM00003", "GM00325"]

    @staticmethod
    def _with_genotype_columns(rows: DataFrame) -> DataFrame:
        """Row-level genotype derivations (Coriell.py:503-615): cleaned
        karyotype + bnode id, normalized variant list, GVC id/label,
        genotype id with the normal-karyotype fallback, taxon."""
        kid_word = make_id(F.col("kary"))  # MONARCH:bxxxx
        stripped_kid = F.regexp_replace(F.col("karyotype_id"), r"^\w*:", "")
        return (
            rows
            # hidden control codes in karyotypes (Coriell.py:538-541)
            .withColumn("kary", F.trim(remove_control_chars(F.col("karyotype"))))
            .withColumn("is_normal_kary", F.col("kary").isin("46;XX", "46;XY", ""))
            # bnode digest-of-digest (Coriell.py:542-544)
            .withColumn(
                "karyotype_id",
                F.when(
                    F.col("kary") != "",
                    make_id(F.regexp_replace(kid_word, "^MONARCH:", ""), prefix="_"),
                ),
            )
            # variant_id fixed to sorted-unique order (Coriell.py:581-584)
            .withColumn(
                "variant_norm",
                F.when(
                    F.col("variant_id") != "",
                    F.array_join(F.array_sort(F.array_distinct(F.split("variant_id", ";"))), ";"),
                ).otherwise(F.lit("")),
            )
            .withColumn(
                "varl",
                F.when(
                    F.col("gene") != "",
                    F.concat(F.col("gene"), F.lit("("), F.col("mutation"), F.lit(")")),
                ),
            )
            .withColumn("abnormal_kary", (F.col("kary") != "") & ~F.col("is_normal_kary"))
            # GVC id dispatch (Coriell.py:586-605)
            .withColumn(
                "gvc_id",
                F.when(
                    F.col("abnormal_kary") & (F.col("variant_norm") != ""),
                    make_id(
                        F.concat(
                            F.regexp_replace("variant_norm", ";", "-"),
                            F.lit("-"),
                            stripped_kid,
                        ),
                        prefix="_",
                    ),
                )
                .when(F.col("abnormal_kary"), F.col("karyotype_id"))
                .when(
                    F.col("variant_norm") != "",
                    make_id(F.regexp_replace("variant_norm", ";", "-"), prefix="_"),
                ),
            )
            .withColumn(
                "gvc_label",
                F.when(
                    F.col("abnormal_kary") & (F.col("mutation") != ""),
                    F.concat_ws("; ", "varl", "kary"),
                )
                .when(F.col("abnormal_kary"), F.col("kary"))
                .when(F.col("variant_norm") != "", F.col("varl")),
            )
            # blank species is assumed human (Coriell.py:518-523)
            .withColumn(
                "taxon",
                F.coalesce(
                    _map_lit(SPECIES_TAXON, F.col("species")),
                    F.lit("NCBITaxon:9606"),
                ),
            )
            .withColumn("tax_num", F.get(F.split("taxon", ":"), 1))
            # dbSNP genotype, else anonymous bnode for non-unaffected
            # (Coriell.py:525-531, 677-682)
            .withColumn(
                "genotype_id0",
                F.when(
                    F.col("dbsnp_id") != "",
                    F.concat(F.lit("dbSNPIndividual:"), F.col("dbsnp_id")),
                ).when(
                    F.col("affected_n") != "unaffected",
                    make_id(F.concat(F.lit("geno"), F.col("catalog_id")), prefix="_"),
                ),
            )
            # normal-karyotype fallback: karyotype_id BECOMES the genotype
            # when there is a GVC but no genotype id (Coriell.py:698-711)
            .withColumn(
                "normal_kary_case",
                F.col("gvc_id").isNotNull()
                & F.col("karyotype_id").isNotNull()
                & F.col("is_normal_kary"),
            )
            .withColumn(
                "genotype_id",
                F.when(
                    F.col("normal_kary_case") & F.col("genotype_id0").isNull(),
                    F.col("karyotype_id"),
                ).otherwise(F.col("genotype_id0")),
            )
            .withColumn(
                "genotype_label",
                F.when(
                    F.col("gvc_id").isNotNull(),
                    F.concat(
                        F.when(
                            F.col("normal_kary_case"),
                            F.when(
                                F.col("gvc_label").isNotNull() & (F.col("gvc_label") != ""),
                                F.concat_ws("; ", "gvc_label", "kary"),
                            ).otherwise(F.col("kary")),
                        ).otherwise(F.col("gvc_label")),
                        F.lit(" ["),
                        F.col("catalog_id"),
                        F.lit("]"),
                    ),
                ),
            )
        )

    def _karyotype_triples(self, rows: DataFrame, g: str) -> list[DataFrame]:
        """Karyotype complement stanza + per-affected-chromosome anonymous
        alteration features (Coriell.py:545-574, 816-846)."""
        kar = rows.filter(F.col("karyotype_id").isNotNull())
        feats = (
            kar
            # aberration tokens → chromosome tokens; ? dropped (816-835)
            .withColumn(
                "chrs",
                F.flatten(
                    F.transform(
                        F.regexp_extract_all("kary", F.lit(ABERRATION_RE), 0),
                        lambda a: F.regexp_extract_all(a, F.lit(CHR_TOKEN_RE), 1),
                    )
                ),
            )
            # abnormal sex-chromosome run: extra Y wins, else X (837-844)
            .withColumn("sex_run", F.regexp_extract("kary", SEX_CHR_RE, 1))
            .withColumn(
                "chrs",
                F.when(
                    F.col("sex_run") == "", F.col("chrs")
                ).otherwise(
                    F.array_union(
                        F.col("chrs"),
                        F.array(
                            F.when(F.col("sex_run").rlike("X?Y{2,}"), F.lit("Y")).otherwise(F.lit("X"))
                        ),
                    )
                ),
            )
            .select(
                "karyotype_id", "tax_num",
                F.explode(F.array_distinct(F.array_remove("chrs", "?"))).alias("chrom"),
            )
            .withColumn("feature_id", F.concat_ws("-", "karyotype_id", "chrom"))
            .withColumn(
                "feature_label",
                F.concat(F.lit("some karyotype alteration on chr"), F.col("chrom")),
            )
            .withColumn("ftype", F.lit(SEQ_ALT))
            # same base-namespace chromosome convention as ucscbands/ncbigene
            .withColumn("chrom_iri", F.concat(F.lit(":"), "tax_num", F.lit("chr"), "chrom"))
            .withColumn("start", F.lit(None).cast("long"))
            .withColumn("stop", F.lit(None).cast("long"))
        )
        return [
            # karyotype as karyotype_variation_complement individual (546-550)
            individual_triples(
                kar, "karyotype_id", F.lit(KARYOTYPE_VC), label_col="kary", graph_id=g
            ),
            feature_triples(
                feats, "feature_id", type_col="ftype", label_col="feature_label",
                chrom_col="chrom_iri", start_col="start", stop_col="stop",
                graph_id=g, unpositioned_region=True,
            ),
            # feature is a variant part of the karyotype (570-574)
            make_triples(feats, "karyotype_id", F.lit(HAS_VARIANT_PART), "feature_id", graph_id=g),
        ]

    def _vslc_triples(self, rows: DataFrame, g: str) -> tuple[list[DataFrame], DataFrame]:
        """Per-OMIM-locus VSLC decomposition of the variant list
        (Coriell.py:617-675).  Returns the triples and the per-row locus
        frame (the reference's omim_map keys) used to gate the disease
        associations."""
        vars_ = (
            rows.filter(F.col("variant_norm") != "")
            .select(
                "catalog_id", "gvc_id", "varl",
                F.posexplode(F.split("variant_norm", ";")).alias("pos", "var"),
            )
            .withColumn("var", F.trim("var"))
            .withColumn("locus", F.regexp_extract("var", r"^(\d+)\.+(.*)", 1))
            .withColumn("var_num", F.regexp_extract("var", r"^(\d+)\.+(.*)", 2))
            .filter(F.col("locus") != "")
        )
        loci = vars_.select("catalog_id", "locus")
        vslcs = (
            vars_.groupBy("catalog_id", "gvc_id", "varl", "locus")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "var_num"))),
                    lambda s: s["var_num"],
                ).alias("var_nums")
            )
            # vslc bnode = digest of '-'.join(<locus>.<var> ...) (650-652)
            .withColumn(
                "vslc_id",
                make_id(
                    F.array_join(
                        F.transform(
                            "var_nums",
                            lambda v: F.concat(F.col("locus"), F.lit("."), v),
                        ),
                        "-",
                    ),
                    prefix="_",
                ),
            )
        )
        alleles = vslcs.select(
            "vslc_id",
            "locus",
            F.explode("var_nums").alias("var_num"),
        ).withColumn(
            "allele_id", F.concat(F.lit("OMIM:"), "locus", F.lit("."), "var_num")
        )
        parts = [
            # VSLC individual, label varl when a gene was named (655-660)
            individual_triples(vslcs, "vslc_id", F.lit(VSLC), label_col="varl", graph_id=g),
            # sequence alteration + variant part of the VSLC (661-673)
            individual_triples(alleles, "allele_id", F.lit(SEQ_ALT), graph_id=g),
            make_triples(alleles, "vslc_id", F.lit(HAS_VARIANT_PART), "allele_id", graph_id=g),
            # zygosity unknown → indeterminate (Genotype.addPartsToVSLC)
            make_triples(vslcs, "vslc_id", F.lit(HAS_ZYGOSITY), F.lit(INDETERMINATE), graph_id=g),
            # VSLC into its GVC parent (674-675)
            make_triples(
                vslcs.filter(F.col("vslc_id") != F.col("gvc_id")),
                "gvc_id", F.lit(HAS_VARIANT_PART), "vslc_id", graph_id=g,
            ),
        ]
        return parts, loci

    def _genotype_triples(self, rows: DataFrame, g: str) -> list[DataFrame]:
        """GVC → genotype → patient assembly (Coriell.py:677-733)."""
        gvc = rows.filter(F.col("gvc_id").isNotNull())
        genotyped = gvc.filter(F.col("genotype_id").isNotNull())
        return [
            # unaffected patients are just wildtype (677-679)
            make_triples(
                rows.filter(F.col("affected_n") == "unaffected"),
                "patient_id", F.lit(T.TYPE), F.lit(WILDTYPE), graph_id=g,
            ),
            # GVC individual (684-689)
            individual_triples(gvc, "gvc_id", F.lit(GVC), label_col="gvc_label", graph_id=g),
            # abnormal karyotype is a variant part of the GVC (612-615):
            # only when the karyotype is abnormal, a GVC exists, and the
            # karyotype id did not itself become the GVC id
            make_triples(
                gvc.filter(
                    F.col("abnormal_kary")
                    & F.col("karyotype_id").isNotNull()
                    & (F.col("karyotype_id") != F.col("gvc_id"))
                ),
                "gvc_id", F.lit(HAS_VARIANT_PART), "karyotype_id", graph_id=g,
            ),
            # gvc into genotype, reference part for unaffected (691-697);
            # uses the PRE-fallback genotype id — the normal-karyotype
            # reassignment happens after this edge in the reference
            make_triples(
                gvc.filter(F.col("genotype_id0").isNotNull())
                .withColumn(
                    "rel",
                    F.when(
                        F.col("affected_n") == "unaffected", F.lit(HAS_REFERENCE_PART)
                    ).otherwise(F.lit(HAS_VARIANT_PART)),
                ),
                "genotype_id0", "rel", "gvc_id", graph_id=g,
            ),
            # normal karyotype rides along as reference part (698-711)
            make_triples(
                gvc.filter(F.col("normal_kary_case") & F.col("genotype_id0").isNotNull()),
                "genotype_id0", F.lit(HAS_REFERENCE_PART), "karyotype_id", graph_id=g,
            ),
            # intrinsic genotype + taxon + patient link (717-729)
            individual_triples(
                genotyped, "genotype_id", F.lit(INTRINSIC_GENOTYPE),
                label_col="genotype_label", graph_id=g,
            ),
            make_triples(genotyped, "genotype_id", F.lit(IN_TAXON), "taxon", graph_id=g),
            make_triples(genotyped, "patient_id", F.lit(HAS_GENOTYPE), "genotype_id", graph_id=g),
            # no genotype parts → the patient gets the taxon (730-731)
            make_triples(
                rows.filter(F.col("gvc_id").isNull() | F.col("genotype_id").isNull()),
                "patient_id", F.lit(IN_TAXON), "taxon", graph_id=g,
            ),
        ]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        schema = " ".join(f"`{c}` string," for c in COLUMNS).rstrip(",")
        raw = (
            spark.read.option("sep", ",").option("quote", '"').option("header", True)
            .option("encoding", "ISO-8859-1").schema(schema)
            .csv(self.path(raw_dir, "NIGMS"))
        )
        raw = self.test_filter(raw, "catalog_id", test_mode)
        if limit:
            raw = raw.limit(limit)

        rows = (
            raw.select(*[F.trim(F.coalesce(F.col(c), F.lit(""))).alias(c) for c in COLUMNS])
            .withColumn("cell_line_id", F.concat(F.lit("Coriell:"), F.col("catalog_id")))
            .withColumn(
                "line_label",
                F.concat(F.get(F.split("collection", " "), 0), F.lit("-"), F.col("catalog_id")),
            )
            .withColumn("patient_id", make_id(F.concat(F.lit("anonymous_patient_"), F.col("catalog_id")), prefix="_"))
            .withColumn("cell_type", _map_lit(CELL_TYPE, F.col("sample_type")))
            .withColumn("repository", _map_lit(REPOSITORY, F.col("collection")))
            # localtt: Yes→affected, No→unaffected, ''→unspecified (Coriell.py:396-403)
            .withColumn(
                "affected_n",
                F.when(F.col("affected") == "", F.lit("unspecified"))
                .when(F.col("affected") == "Yes", F.lit("affected"))
                .when(F.col("affected") == "No", F.lit("unaffected"))
                .otherwise(F.col("affected")),
            )
            # str.capitalize(): first char upper, REST lower (not initcap)
            .withColumn("_d0", F.get(F.split("description", ";"), 0))
            .withColumn(
                "short_desc",
                F.concat(F.upper(F.substring("_d0", 1, 1)), F.lower(F.expr("substring(_d0, 2)"))),
            )
            .withColumn(
                "patient_label",
                F.when(
                    F.col("relprob") == "proband",
                    F.concat_ws(" ", "affected_n", F.lower("gender"), "relprob", F.lit("with"), "short_desc"),
                ).otherwise(
                    F.concat_ws(" ", "affected_n", F.lower("gender"), "relprob", F.lit("of proband with"), "short_desc"),
                ),
            )
            .withColumn("family_id", F.when(F.col("fam") != "", F.concat(F.lit("CoriellFamily:"), F.col("fam"))))
            .withColumn(
                "family_label",
                F.when(F.col("family_id").isNotNull(), F.concat(F.lit("Family of proband with "), F.col("short_desc"))),
            )
            .withColumn(
                "equiv_line",
                F.when(
                    (F.col("dna_ref") != "") & (F.col("dna_ref") != F.col("catalog_id")),
                    F.concat(F.lit("Coriell:"), F.col("dna_ref")),
                ),
            )
        )
        rows = self._with_genotype_columns(rows)

        # repository collection stanza (_process_collection, Coriell.py:787-813):
        # one per staged collection file — individual typed ERO collection
        # with label + foaf:page (page is an IRI, Reference.addPage)
        collections = spark.createDataFrame(
            [(
                "CoriellCollection:NIGMS",
                "NIGMS Human Genetic Cell Repository",
                "https://catalog.coriell.org/1/NIGMS",
            )],
            ["repo_id", "repo_label", "repo_page"],
        )
        collection_graph = union_graphs(
            individual_triples(
                collections, "repo_id", F.lit(ERO_COLLECTION), label_col="repo_label", graph_id=g
            ),
            make_triples(collections, "repo_id", F.lit(FOAF_PAGE), "repo_page", graph_id=g),
        )

        equiv = rows.filter(F.col("equiv_line").isNotNull())
        fams = rows.filter(F.col("family_id").isNotNull())
        repo = rows.filter(F.col("repository").isNotNull())

        vslc_parts, loci = self._vslc_triples(rows, g)

        diseases = (
            rows.filter((F.col("affected_n") == "affected") & (F.col("omim_num") != ""))
            .select("catalog_id", "patient_id", F.explode(F.split("omim_num", ";")).alias("omim"))
            .filter(F.trim("omim") != "")
            .withColumn("omim", F.trim("omim"))
            # omim numbers that decomposed as variant LOCI are genes, not
            # diseases — the reference's `disease not in omim_map` gate
            # (Coriell.py:744-752)
            .join(
                loci.withColumnRenamed("locus", "omim"),
                ["catalog_id", "omim"],
                "left_anti",
            )
            .withColumn("disease_id", F.concat(F.lit("OMIM:"), F.col("omim")))
            .withColumn("predicate", F.lit(HAS_PHENOTYPE))
        )

        return union_graphs(
            collection_graph,
            # cell line + equivalents (Coriell.py:415-432)
            individual_triples(rows, "cell_line_id", F.lit(CELL_LINE), label_col="line_label", graph_id=g),
            individual_triples(equiv, "equiv_line", F.lit(CELL_LINE), graph_id=g),
            make_triples(equiv, "cell_line_id", F.lit(T.SAME_AS), "equiv_line", graph_id=g),
            # derives-from patient and cell type (Coriell.py:434-436)
            make_triples(rows, "cell_line_id", F.lit(DERIVES_FROM), "patient_id", graph_id=g),
            make_triples(
                rows.filter(F.col("cell_type").isNotNull()),
                "cell_line_id", F.lit(DERIVES_FROM), "cell_type", graph_id=g,
            ),
            # repository membership via Family.addMember (Coriell.py:438-439)
            family_triples(repo, "repository", "cell_line_id", graph_id=g),
            make_triples(
                rows.filter(F.col("cat_remark") != ""),
                "cell_line_id", F.lit(T.DESCRIPTION), "cat_remark", is_literal=True, graph_id=g,
            ),
            # patient person (Coriell.py:461-462)
            individual_triples(rows, "patient_id", F.lit(PERSON), label_col="patient_label", graph_id=g),
            # family membership (Coriell.py:487-502)
            individual_triples(fams, "family_id", F.lit(FAMILY), label_col="family_label", graph_id=g),
            make_triples(fams, "patient_id", F.lit(MEMBER_OF), "family_id", graph_id=g),
            # genotype decomposition (Coriell.py:503-733)
            *self._karyotype_triples(rows, g),
            *vslc_parts,
            *self._genotype_triples(rows, g),
            # affected-patient disease associations (Coriell.py:735-766)
            class_triples(diseases, "disease_id", graph_id=g),
            g2p_association_triples(
                diseases, "patient_id", "disease_id", "predicate", definedby=self.name, graph_id=g
            ),
        ).dropDuplicates(["subject", "predicate", "object"])
