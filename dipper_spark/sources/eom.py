"""Elements of Morphology pipeline: morphology-term classes + HP mappings.

Reference behavior: dipper/sources/EOM.py —
``_process_nlx_157874_1_view`` (150-283: the staged DISCO postgres view;
class + label + subClassOf biolink:PhenotypicFeature, objective/subjective
definitions '  '-joined with trailing periods enforced — emitted even when
empty, with the biolink:category side triple from addDefinition's
class_category; small/large figure depictions and the term url as IRIS,
not literals (addTriple auto-detects http); comments; ';'-split stripped
exact synonyms; 'replaces' as related synonyms unless identical to the
synonyms column, each piece UNSTRIPPED — the reference's `syn.strip()`
at :265 discards its result; foaf:page; NO web-page typing — the
Reference object at :272-273 is constructed but never written),
``_map_eom_terms`` (285-325: underscore→colon HP ids as equivalentClass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import class_triples, pairwise_triples, synonym_triples
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

PHENOTYPIC_FEATURE = "biolink:PhenotypicFeature"

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
    """Append a trailing period when missing (EOM.py:221-229); absent
    (null-read) columns behave like the reference's empty strings."""
    c = F.coalesce(F.trim(F.col(col)), F.lit(""))
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
            # '  '.join((obj, subj)) — NOT trimmed, kept even when empty
            # (addDefinition has no empty-gate, Model.py:355-362)
            F.concat(_dotted("objective_definition"), F.lit("  "),
                     _dotted("subjective_definition")).alias("definition"),
            F.trim(F.col("comments")).alias("comments"),
            F.transform(F.split(F.trim(F.col("synonyms")), ";"), lambda x: F.trim(x)).alias("synonyms"),
            F.trim(F.col("synonyms")).alias("synonyms_raw"),
            F.trim(F.col("replaces")).alias("replaces_raw"),
            # pieces deliberately NOT trimmed (EOM.py:265 no-op strip)
            F.split(F.trim(F.col("replaces")), ";").alias("replaces"),
            F.trim(F.col("small_figure_url")).alias("small_fig"),
            F.trim(F.col("large_figure_url")).alias("large_fig"),
        )
        parts = [
            class_triples(rows, "term_id", label_col="label", graph_id=g),
            make_triples(rows, "term_id", F.lit(T.SUBCLASS_OF),
                         F.lit(PHENOTYPIC_FEATURE), is_literal=False, graph_id=g),
            make_triples(
                rows, "term_id", F.lit(T.DEFINITION), "definition",
                is_literal=True, graph_id=g,
            ),
            # addDefinition's class_category side triple (EOM.py:233-234)
            make_triples(rows, "term_id", F.lit("biolink:category"),
                         F.lit(PHENOTYPIC_FEATURE), is_literal=False, graph_id=g),
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
            # the term url is an IRI, not a literal (Reference.addPage
            # passes object_is_literal=False, Reference.py:77-87)
            make_triples(
                rows.filter(F.col("url") != ""),
                "term_id", F.lit(T.PAGE), "url", is_literal=False, graph_id=g,
            ),
        ]
        for fig in ("small_fig", "large_fig"):
            parts.append(
                # depiction urls auto-detect as IRIs (RDFGraph._is_literal)
                make_triples(
                    rows.filter(F.col(fig) != ""),
                    "term_id", F.lit(T.DEPICTION), fig, is_literal=False, graph_id=g,
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
