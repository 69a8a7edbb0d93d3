"""SGD yeast gene→phenotype pipeline.

Reference behavior: dipper/sources/SGD.py:80-256 — per-row association
build: 'entity: quality' phenotypes resolved through an APO label→id map
(ontobio-built dict in the reference, SGD.py:232-242; a broadcast dim here),
composite MONARCH phenotype ids for entity+quality pairs, '('-stripped
comma-split experiment types as evidence, pipe-split references with
first-as-source + rest-sameAs, and a 'k: v | k: v' description literal.

Spark-first: the APO map is a broadcast literal map; entity/quality split,
experiment-type explode, and reference handling are all column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import association_triples, pairwise_triples
from dipper_spark.models import terms as T
from dipper_spark.models.assoc import with_assoc_id
from dipper_spark.sources.base import FileContract, SourcePipeline, register

HAS_PHENOTYPE = "RO:0002200"
PHENOTYPE = "UPHENO:0001001"
PUBLICATION = "IAO:0000311"

#: APO label→id (reference builds this from the ontology at runtime,
#: SGD.py:232-242; frozen subset of observable/qualifier/experiment terms)
APO_TERM_ID = {
    "viability": "APO:0000111",
    "inviable": "APO:0000112",
    "viable": "APO:0000113",
    "resistance to chemicals": "APO:0000087",
    "increased": "APO:0000004",
    "decreased": "APO:0000003",
    "classical genetics": "APO:0000020",  # certified by tests/test_sgd.py golden
    "respiratory growth": "APO:0000309",
    "decreased rate": "APO:0000245",
    "large-scale survey": "APO:0000010",
    "systematic mutation set": "APO:0000011",
    "competitive fitness": "APO:0000082",
}

COLUMNS = [
    "Feature Name", "Feature Type", "Gene Name", "SGDID", "Reference",
    "Experiment Type", "Mutant Type", "Allele", "Strain Background",
    "Phenotype", "Chemical", "Condition", "Details", "Reporter",
]


def _map_lit(mapping: dict[str, str], key: Column) -> Column:
    return F.element_at(F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]), key)


@register
class SgdPipeline(SourcePipeline):
    name = "sgd"
    files = {
        "sgd_phenotype": FileContract(
            file="phenotype_data.tab",
            url="https://downloads.yeastgenome.org/curation/literature/phenotype_data.tab",
            columns=COLUMNS,
        ),
    }
    test_ids = ["SGD:S000003826"]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        schema = " ".join(f"`{c}` string," for c in COLUMNS).rstrip(",")
        raw = (
            spark.read.option("sep", "\t").schema(schema)
            .csv(self.path(raw_dir, "sgd_phenotype"))
        )
        rows = (
            raw.filter(F.col("Gene Name").isNotNull())  # SGD.py:99 isinstance str
            .withColumn("gene", F.concat(F.lit("SGD:"), F.col("SGDID")))
            # entity[: quality] phenotype split (SGD.py:136-148)
            .withColumn("has_quality", F.col("Phenotype").contains(": "))
            .withColumn("entity", F.get(F.split("Phenotype", ": "), 0))
            .withColumn("quality", F.get(F.split("Phenotype", ": "), 1))
            .withColumn("entity_apo", _map_lit(APO_TERM_ID, F.col("entity")))
            .withColumn("quality_apo", _map_lit(APO_TERM_ID, F.col("quality")))
            .filter(F.col("entity_apo").isNotNull())
            .withColumn(
                "pheno_id",
                F.when(
                    F.col("has_quality") & F.col("quality_apo").isNotNull(),
                    F.concat(
                        F.lit("MONARCH:"),
                        F.regexp_replace("entity_apo", ":", "_"),
                        F.regexp_replace("quality_apo", ":", "_"),
                    ),
                ).otherwise(F.col("entity_apo")),
            )
            .withColumn(
                "pheno_label",
                F.when(F.col("has_quality"), F.concat_ws(":", "entity", "quality"))
                .otherwise(F.col("entity")),
            )
            .withColumn("predicate", F.lit(HAS_PHENOTYPE))
            # experiment types: strip '(...)', split ',' (SGD.py:113-123)
            .withColumn(
                "exp_types",
                F.split(F.get(F.split("Experiment Type", r"\("), 0), ","),
            )
            .withColumn(
                "evidence",
                F.filter(
                    F.transform("exp_types", lambda x: _map_lit(APO_TERM_ID, F.trim(x))),
                    lambda x: x.isNotNull(),
                ),
            )
            # references: strip spaces, split '|', first = source (SGD.py:200-218)
            .withColumn("refs", F.split(F.regexp_replace("Reference", " ", ""), r"\|"))
            .withColumn("first_ref", F.get(F.col("refs"), 0))
            .withColumn("source", F.array("first_ref"))
            .withColumn(
                "description",
                # the reference .strip()s the assembled text (SGD.py:246-256)
                F.trim(F.concat_ws(
                    " | ",
                    F.concat(F.lit("genomic_background: "), F.coalesce("Strain Background", F.lit("nan"))),
                    F.concat(F.lit("allele: "), F.coalesce("Allele", F.lit("nan"))),
                    F.concat(F.lit("chemical: "), F.coalesce("Chemical", F.lit("nan"))),
                    F.concat(F.lit("condition: "), F.coalesce("Condition", F.lit("nan"))),
                    F.concat(F.lit("details: "), F.coalesce("Details", F.lit("nan"))),
                    F.concat(F.lit("feature_name: "), F.coalesce("Feature Name", F.lit("nan"))),
                    F.concat(F.lit("gene_name: "), F.coalesce("Gene Name", F.lit("nan"))),
                    F.concat(F.lit("mutant_type: "), F.coalesce("Mutant Type", F.lit("nan"))),
                    F.concat(F.lit("reporter: "), F.coalesce("Reporter", F.lit("nan"))),
                )),
            )
        )
        rows = self.test_filter(rows, "gene", test_mode)
        if limit:
            rows = rows.limit(limit)

        keyed = with_assoc_id(rows, "gene", "predicate", "pheno_id", definedby=self.name)
        extra_refs = rows.filter(F.size("refs") > 1).select(
            "first_ref", F.explode(F.expr("slice(refs, 2, 1000)")).alias("other_ref")
        )
        exp_labels = rows.select(F.explode("exp_types").alias("t")).withColumn(
            "t", F.trim("t")
        ).withColumn("tid", _map_lit(APO_TERM_ID, F.col("t"))).filter(F.col("tid").isNotNull())

        return union_graphs(
            association_triples(
                rows, "gene", "predicate", "pheno_id",
                evidence_col="evidence", source_col="source",
                definedby=self.name, graph_id=g,
            ),
            make_triples(keyed, "assoc_id", F.lit(T.DESCRIPTION), "description", is_literal=True, graph_id=g),
            make_triples(rows, "gene", F.lit(T.LABEL), "Gene Name", is_literal=True, graph_id=g),
            make_triples(rows, "pheno_id", F.lit(T.SUBCLASS_OF), F.lit(PHENOTYPE), graph_id=g),
            make_triples(rows, "pheno_id", F.lit(T.LABEL), "pheno_label", is_literal=True, graph_id=g),
            make_triples(
                rows.dropDuplicates(["first_ref"]),
                "first_ref", F.lit(T.TYPE), F.lit(PUBLICATION), graph_id=g,
            ),
            pairwise_triples(extra_refs, "first_ref", "other_ref", T.SAME_AS, graph_id=g),
            make_triples(exp_labels.dropDuplicates(["tid"]), "tid", F.lit(T.LABEL), "t", is_literal=True, graph_id=g),
        ).dropDuplicates(["subject", "predicate", "object"])
