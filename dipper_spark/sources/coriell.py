"""Coriell cell-line repository pipeline (latin-1 CSV).

Reference behavior: dipper/sources/Coriell.py:249-786 (``_process_data``):
strict header assert, cell-line individuals labeled
``<collection-prefix>-<catalog_id>``, dna_ref → sameAs equivalent lines,
derives-from patient + cell type, repository membership, anonymous patient
bnodes with affected/gender/relprob labels, CoriellFamily membership,
dbSNP-individual genotypes, and affected-patient → OMIM disease
associations.

Spark-first slice of the genotype block: dbsnp → genotype id; the full
karyotype/GVC decomposition stays a staging concern (it needs the OMIM
variant dimension).  Everything here is one latin-1 scan + column
expressions; the family/repository edges use the models.context emitters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.ids import make_id
from dipper_spark.models import (
    class_triples,
    family_triples,
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
                "genotype_id",
                F.when(F.col("dbsnp_id") != "", F.concat(F.lit("dbSNPIndividual:"), F.col("dbsnp_id"))),
            )
            .withColumn(
                "equiv_line",
                F.when(
                    (F.col("dna_ref") != "") & (F.col("dna_ref") != F.col("catalog_id")),
                    F.concat(F.lit("Coriell:"), F.col("dna_ref")),
                ),
            )
        )

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

        diseases = (
            rows.filter((F.col("affected_n") == "affected") & (F.col("omim_num") != ""))
            .select("patient_id", F.explode(F.split("omim_num", ";")).alias("omim"))
            .filter(F.trim("omim") != "")
            .withColumn("disease_id", F.concat(F.lit("OMIM:"), F.trim("omim")))
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
            # dbsnp genotype (Coriell.py:525-531, 717-729)
            make_triples(
                rows.filter(F.col("genotype_id").isNotNull()),
                "patient_id", F.lit(HAS_GENOTYPE), "genotype_id", graph_id=g,
            ),
            # affected-patient disease associations (Coriell.py:735-766)
            class_triples(diseases, "disease_id", graph_id=g),
            g2p_association_triples(
                diseases, "patient_id", "disease_id", "predicate", definedby=self.name, graph_id=g
            ),
        ).dropDuplicates(["subject", "predicate", "object"])
