"""MyChem drug→target / drug→indication pipeline (staged JSON API).

Reference behavior: dipper/sources/MyChem.py:40-175 — the paged API records
are cached to disk (the S5 staged-landing-zone pattern); each drugbank record
yields UNII→UniProt action edges (action string normalized ' '/'/' → '_',
minted under MONARCH:), drug equivalences, and polypeptide typings; each
drugcentral record yields bioactivity interactions (pipe-split uniprot
lists) and non-contraindication SNOMED indications.

Spark-first: ``spark.read.json`` with an explicit nested schema (no
inference pass — at 100 TB the schema IS the contract), then explode over
the nested arrays; the single-vs-list polymorphism of the API
(``return_target_list``) is normalized by reading everything as arrays via
``multiLine`` records staged one-per-line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

MOLECULARLY_INTERACTS = "RO:0002436"
TREATS = "RO:0002606"
MOLECULAR_ENTITY = "CHEBI:23367"
POLYPEPTIDE = "SO:0000104"
DISEASE = "MONDO:0000001"
SUB_PROPERTY_OF = "rdfs:subPropertyOf"

DRUGBANK_SCHEMA = """
    unii struct<unii string>,
    drugbank struct<
        drugbank_id string,
        targets array<struct<
            uniprot string,
            name string,
            actions array<string>
        >>
    >
"""
DRUGCENTRAL_SCHEMA = """
    unii struct<unii string>,
    drugcentral struct<
        bioactivity array<struct<
            uniprot_id string,
            target_class string,
            target string
        >>,
        drug_use array<struct<
            relation string,
            snomed_id string,
            snomed_name string
        >>
    >
"""


@register
class MyChemPipeline(SourcePipeline):
    name = "mychem"
    files = {
        "drugbank": FileContract(
            file="drugbank_targets.jsonl",
            url="http://mychem.info/v1/query?q=_exists_:drugbank.targets",
            columns=["unii", "drugbank"],
        ),
        "drugcentral": FileContract(
            file="drugcentral_interactors.jsonl",
            url="http://mychem.info/v1/query?q=_exists_:drugcentral",
            columns=["unii", "drugcentral"],
        ),
    }
    test_ids = ["UNII:9100L32L2N"]

    def _drugbank_triples(self, spark: SparkSession, raw_dir: str, g: str) -> list[DataFrame]:
        raw = spark.read.schema(DRUGBANK_SCHEMA).json(self.path(raw_dir, "drugbank"))
        rows = (
            raw.filter(F.col("unii.unii").isNotNull())  # MyChem.py:50-53 continue
            .select(
                F.concat(F.lit("UNII:"), F.col("unii.unii")).alias("unii"),
                F.concat(F.lit("DrugBank:"), F.col("drugbank.drugbank_id")).alias("drugbank_id"),
                F.explode("drugbank.targets").alias("t"),
            )
            .filter(F.col("t.uniprot").isNotNull())
            .select(
                "unii", "drugbank_id",
                F.concat(F.lit("UniProtKB:"), F.col("t.uniprot")).alias("uniprot"),
                F.col("t.name").alias("target_name"),
                F.explode("t.actions").alias("action"),
            )
            # ' ' and '/' → '_' then mint under MONARCH: (format_actions)
            .withColumn(
                "action_id",
                F.concat(F.lit("MONARCH:"), F.regexp_replace("action", r"[ /]", "_")),
            )
        )
        return [
            make_triples(rows, "unii", F.col("action_id"), "uniprot", is_literal=False, graph_id=g),
            make_triples(rows, "uniprot", F.lit(T.LABEL), "target_name", is_literal=True, graph_id=g),
            make_triples(rows, "uniprot", F.lit(T.SUBCLASS_OF), F.lit(POLYPEPTIDE), graph_id=g),
            make_triples(rows, "drugbank_id", F.lit(T.EQUIVALENT_CLASS), "unii", graph_id=g),
            make_triples(rows, "action_id", F.lit(SUB_PROPERTY_OF), F.lit(MOLECULARLY_INTERACTS), graph_id=g),
            make_triples(rows, "unii", F.lit(T.SUBCLASS_OF), F.lit(MOLECULAR_ENTITY), graph_id=g),
        ]

    def _drugcentral_triples(self, spark: SparkSession, raw_dir: str, g: str) -> list[DataFrame]:
        raw = spark.read.schema(DRUGCENTRAL_SCHEMA).json(self.path(raw_dir, "drugcentral"))
        base = raw.filter(F.col("unii.unii").isNotNull()).select(
            F.concat(F.lit("UNII:"), F.col("unii.unii")).alias("unii"),
            F.col("drugcentral.bioactivity").alias("bioactivity"),
            F.col("drugcentral.drug_use").alias("drug_use"),
        )
        # bioactivity takes precedence; drug_use only when bioactivity absent
        # (the reference's elif, MyChem.py:81-101)
        inter = (
            base.filter(F.col("bioactivity").isNotNull())
            .select("unii", F.explode("bioactivity").alias("b"))
            .filter(F.col("b.uniprot_id").isNotNull())
            .select("unii", F.explode(F.split("b.uniprot_id", r"\|")).alias("up"))
            .withColumn("uniprot", F.concat(F.lit("UniProtKB:"), F.col("up")))
        )
        indic = (
            base.filter(F.col("bioactivity").isNull() & F.col("drug_use").isNotNull())
            .select("unii", F.explode("drug_use").alias("d"))
            .filter((F.col("d.relation") != "contraindication") & F.col("d.snomed_id").isNotNull())
            .select(
                "unii",
                F.concat(F.lit("SNOMED:"), F.col("d.snomed_id")).alias("snomed_id"),
                F.col("d.snomed_name").alias("snomed_name"),
            )
        )
        return [
            make_triples(inter, "unii", F.lit(MOLECULARLY_INTERACTS), "uniprot", graph_id=g),
            make_triples(inter, "unii", F.lit(T.SUBCLASS_OF), F.lit(MOLECULAR_ENTITY), graph_id=g),
            make_triples(indic, "unii", F.lit(TREATS), "snomed_id", graph_id=g),
            make_triples(indic, "unii", F.lit(T.SUBCLASS_OF), F.lit(MOLECULAR_ENTITY), graph_id=g),
            make_triples(indic, "snomed_id", F.lit(T.SUBCLASS_OF), F.lit(DISEASE), graph_id=g),
            make_triples(indic, "snomed_id", F.lit(T.LABEL), "snomed_name", is_literal=True, graph_id=g),
        ]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        parts = self._drugbank_triples(spark, raw_dir, g) + self._drugcentral_triples(
            spark, raw_dir, g
        )
        out = union_graphs(*parts)
        if test_mode:
            out = out.filter(
                F.col("subject").isin(list(self.test_ids)) | F.col("object").isin(list(self.test_ids))
            )
        if limit:
            out = out.limit(limit)
        return out.dropDuplicates(["subject", "predicate", "object"])
