"""Reactome gene/chemical → pathway pipeline.

Reference behavior: dipper/sources/Reactome.py:104-161
(``_parse_reactome_association_file`` + ``_add_component_pathway_association``)
and dipper/models/Pathway.py:30-86 (pathway class + involved-in pattern).

Two same-shape inputs (ensembl2pathway, chebi2pathway) differing only in the
subject curie prefix — a single parameterized column pipeline unioned, the
multi-file-union shape (SURVEY §2.8 U2).  The GAF evidence-code → ECO hop is
a broadcast literal map (the reference loads a yaml into a dict at parse
time, Reactome.py:87-91).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import association_triples, class_triples
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

CELLULAR_PROCESS = "GO:0009987"
PATHWAY = "PW:0000001"
INVOLVED_IN = "RO:0002331"

#: GAF evidence code → ECO (resources/eco/gaf-eco-mapping.yaml subset)
GAF_ECO = {
    "IEA": "ECO:0000501",
    "TAS": "ECO:0000304",
    "IDA": "ECO:0000314",
    "IMP": "ECO:0000315",
    "ISS": "ECO:0000250",
    "NAS": "ECO:0000303",
    "IC": "ECO:0000305",
    "EXP": "ECO:0000269",
}


@register
class ReactomePipeline(SourcePipeline):
    name = "reactome"
    files = {
        "ensembl2pathway": FileContract(
            file="Ensembl2Reactome.txt",
            url="http://www.reactome.org/download/current/Ensembl2Reactome.txt",
            # Reactome.py:17-31
            columns=["component", "pathway_id", "pathway_iri", "pathway_label", "go_ecode", "species_name"],
        ),
        "chebi2pathway": FileContract(
            file="ChEBI2Reactome.txt",
            url="http://www.reactome.org/download/current/ChEBI2Reactome.txt",
            columns=["component", "pathway_id", "pathway_iri", "pathway_label", "go_ecode", "species_name"],
        ),
    }
    test_ids = ["ENSEMBL:ENSBTAG00000000010", "CHEBI:16027"]

    def _component_pathway(
        self, spark: SparkSession, raw_dir: str, key: str, subject_prefix: str, g: str,
        test_mode: bool,
    ) -> DataFrame:
        cols = self.files[key].columns
        schema = " ".join(f"`{c}` string," for c in cols).rstrip(",")
        rows = (
            spark.read.option("sep", "\t").schema(schema).csv(self.path(raw_dir, key))
            .select(
                F.concat_ws(":", F.lit(subject_prefix), F.trim("component")).alias("component_id"),
                F.concat_ws(":", F.lit("REACT"), F.trim("pathway_id")).alias("pathway_curie"),
                F.trim("pathway_label").alias("pathway_label"),
                F.element_at(
                    F.create_map(*[F.lit(x) for kv in GAF_ECO.items() for x in kv]),
                    F.trim("go_ecode"),
                ).alias("eco_curie"),
            )
            .withColumn("predicate", F.lit(INVOLVED_IN))
            .withColumn("evidence", F.when(F.col("eco_curie").isNotNull(), F.array("eco_curie")))
        )
        rows = self.test_filter(rows, "component_id", test_mode)
        return union_graphs(
            # pathway class: subclass of GO cellular_process AND PW pathway
            # (Pathway.addPathway, Pathway.py:30-47 — addClassToGraph's
            # class_type is a subClassOf edge, not rdf:type)
            class_triples(rows, "pathway_curie", "pathway_label", graph_id=g),
            make_triples(rows, "pathway_curie", F.lit(T.SUBCLASS_OF), F.lit(CELLULAR_PROCESS), graph_id=g),
            make_triples(rows, "pathway_curie", F.lit(T.SUBCLASS_OF), F.lit(PATHWAY), graph_id=g),
            # direct component involvement + the reified association w/ evidence
            association_triples(
                rows, "component_id", "predicate", "pathway_curie",
                evidence_col="evidence", definedby=self.name, graph_id=g,
            ),
        )

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        parts = [
            self._component_pathway(spark, raw_dir, "ensembl2pathway", "ENSEMBL", g, test_mode),
            self._component_pathway(spark, raw_dir, "chebi2pathway", "CHEBI", g, test_mode),
        ]
        out = union_graphs(*parts)
        if limit:
            out = out.limit(limit)
        return out.dropDuplicates(["subject", "predicate", "object"])
