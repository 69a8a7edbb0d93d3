"""Elements of Morphology pipeline: morphology-term classes + HP mappings.

Reference behavior: dipper/sources/EOM.py —
``_process_nlx_157874_1_view`` (178-283: the staged DISCO postgres view;
class + label, objective/subjective definitions concatenated with trailing
periods enforced, small/large figure depictions, comments, ';'-split exact
synonyms, 'replaces' as related synonyms unless identical to synonyms,
web-page typing + foaf:page), ``_map_eom_terms`` (285-325: underscore→colon
HP ids as equivalentClass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import class_triples, pairwise_triples, synonym_triples
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

WEB_PAGE = "SIO:000302"

VIEW_COLUMNS = [
    "morphology_term_id", "morphology_term_num", "morphology_term_label",
    "morphology_term_url", "terminology_category_label",
    "terminology_category_url", "subcategory", "objective_definition",
    "subjective_definition", "comments", "synonyms", "replaces",
    "small_figure_url", "large_figure_url", "e_uid", "v_uid", "v_uuid",
    "v_lastmodified", "v_status", "v_lastmodified_epoch",
]
MAP_COLUMNS = ["morphology_term_id", "morphology_term_label", "HP ID", "HP Label", "Notes"]


def _dotted(col: str) -> Column:
    """Append a trailing period when missing (EOM.py:221-229)."""
    c = F.trim(F.col(col))
    return F.when(c == "", c).when(c.rlike(r"\.$"), c).otherwise(F.concat(c, F.lit(".")))


@register
class EomPipeline(SourcePipeline):
    name = "eom"
    files = {
        "tables": FileContract(
            file="dvp.pr_nlx_157874_1",
            url="nif-db.crbs.ucsd.edu:5432",
            columns=VIEW_COLUMNS,
        ),
        "map": FileContract(
            file="hp-to-eom-mapping.tsv",
            url="https://raw.githubusercontent.com/obophenotype/human-phenotype-ontology/master/src/mappings/hp-to-eom-mapping.tsv",
            columns=MAP_COLUMNS,
        ),
    }
    test_ids = []

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        import os

        from dipper_spark.io.readers import read_delim

        g = self.name
        rows = read_delim(
            spark, self.path(raw_dir, "tables"), VIEW_COLUMNS,
            header=True, src_key="tables", limit=limit,
        ).select(
            F.trim(F.col("morphology_term_id")).alias("term_id"),
            F.trim(F.col("morphology_term_label")).alias("label"),
            F.trim(F.col("morphology_term_url")).alias("url"),
            F.trim(F.concat_ws("  ", _dotted("objective_definition"),
                               _dotted("subjective_definition"))).alias("definition"),
            F.trim(F.col("comments")).alias("comments"),
            F.transform(F.split(F.trim(F.col("synonyms")), ";"), lambda x: F.trim(x)).alias("synonyms"),
            F.trim(F.col("synonyms")).alias("synonyms_raw"),
            F.trim(F.col("replaces")).alias("replaces_raw"),
            F.transform(F.split(F.trim(F.col("replaces")), ";"), lambda x: F.trim(x)).alias("replaces"),
            F.trim(F.col("small_figure_url")).alias("small_fig"),
            F.trim(F.col("large_figure_url")).alias("large_fig"),
        )
        parts = [
            class_triples(rows, "term_id", label_col="label", graph_id=g),
            make_triples(
                rows.filter(F.col("definition") != ""),
                "term_id", F.lit(T.DEFINITION), "definition", is_literal=True, graph_id=g,
            ),
            make_triples(
                rows.filter(F.col("comments") != ""),
                "term_id", F.lit(T.COMMENT), "comments", is_literal=True, graph_id=g,
            ),
            synonym_triples(rows, "term_id", "synonyms", graph_id=g),
            synonym_triples(
                rows.filter(
                    (F.col("replaces_raw") != "")
                    & (F.col("replaces_raw") != F.col("synonyms_raw"))
                ),
                "term_id", "replaces", synonym_type=T.HAS_RELATED_SYNONYM, graph_id=g,
            ),
            make_triples(rows, "term_id", F.lit(T.TYPE), F.lit(WEB_PAGE), is_literal=False, graph_id=g),
            make_triples(
                rows.filter(F.col("url") != ""),
                "term_id", F.lit(T.PAGE), "url", is_literal=True, graph_id=g,
            ),
        ]
        for fig in ("small_fig", "large_fig"):
            parts.append(
                make_triples(
                    rows.filter(F.col(fig) != ""),
                    "term_id", F.lit(T.DEPICTION), fig, is_literal=True, graph_id=g,
                )
            )
        map_path = self.path(raw_dir, "map")
        if os.path.exists(map_path):
            hp = read_delim(
                spark, map_path, MAP_COLUMNS, header=True, src_key="map", limit=limit,
            ).select(
                F.trim(F.col("morphology_term_id")).alias("term_id"),
                F.regexp_replace(F.trim(F.col("HP ID")), "_", ":").alias("hp_id"),
            ).filter(F.col("hp_id").contains("HP:"))
            parts += [
                class_triples(hp, "hp_id", graph_id=g),
                pairwise_triples(hp, "term_id", "hp_id", T.EQUIVALENT_CLASS, graph_id=g),
            ]
        return union_graphs(*parts).dropDuplicates(["subject", "predicate", "object"])
