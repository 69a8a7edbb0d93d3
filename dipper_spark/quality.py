"""Quality / enrichment utilities (SURVEY.md §7.1 layer 6).

Property-axiom injection and the metric-style checks the reference scatters
through its sources (miss counters, predicate histograms live in
core.triples; header/rowcount checks in io.readers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dipper_spark.core import TRIPLE_SCHEMA, union_graphs

OBJECT_PROPERTY = "owl:ObjectProperty"
ANNOTATION_PROPERTY = "owl:AnnotationProperty"
DATATYPE_PROPERTY = "owl:DatatypeProperty"


def add_property_axioms(graph: DataFrame, ontology_props: DataFrame) -> DataFrame:
    """Type every predicate USED by the graph with its owl property class
    (reference: GraphUtils.add_property_axioms,
    dipper/utils/GraphUtils.py:62-127 — dipper fetches 7 ontologies at run
    time and probes them; here the ontology property table is a staged
    DataFrame ``(property, prop_type)`` joined against the graph's distinct
    predicate set).

    Special cases kept: dc:source forced to ObjectProperty
    (GraphUtils.py:112-116), MONARCH:cliqueLeader / MONARCH:anonymous
    hardcoded as AnnotationProperties (118-125).
    """
    spark = graph.sparkSession
    used = graph.select(F.col("predicate").alias("property")).distinct()
    # distinct-predicate set is tiny → broadcast it INTO the ontology table
    typed = ontology_props.join(broadcast(used), "property", "left_semi")
    axioms = typed.select(
        F.col("property").alias("subject"),
        F.lit("rdf:type").alias("predicate"),
        F.col("prop_type").alias("object"),
        F.lit(False).alias("is_literal"),
        F.lit(None).cast("string").alias("datatype"),
        F.lit(None).cast("string").alias("graph_id"),
    )
    # dc:source is always an ObjectProperty, never Annotation (112-116)
    axioms = axioms.filter(
        ~((F.col("subject") == "dc:source") & (F.col("object") == ANNOTATION_PROPERTY))
    )
    hardcoded = spark.createDataFrame(
        [
            ("dc:source", "rdf:type", OBJECT_PROPERTY, False, None, None),
            ("MONARCH:cliqueLeader", "rdf:type", ANNOTATION_PROPERTY, False, None, None),
            ("MONARCH:anonymous", "rdf:type", ANNOTATION_PROPERTY, False, None, None),
        ],
        TRIPLE_SCHEMA,
    )
    return union_graphs(graph, axioms, hardcoded).dropDuplicates(
        ["subject", "predicate", "object"]
    )


def default_property_table(spark: SparkSession) -> DataFrame:
    """A minimal staged ontology-property table covering the vocabularies the
    emitters use (the runtime analog of dipper's 7 fetched ontologies)."""
    objects = [
        "RO:0002200", "RO:0000091", "RO:0002558", "RO:0002434", "RO:0002606",
        "RO:0002607", "RO:0002206", "RO:0002162", "RO:0003301", "RO:0002525",
        "RO:0002327", "RO:0002331", "RO:0002326", "RO:0002205", "BFO:0000050",
        "BFO:0000051", "GENO:0000382", "GENO:0000385", "GENO:0000408",
        "GENO:0000418", "GENO:0000608", "GENO:0000207", "OBAN:association_has_subject",
        "OBAN:association_has_predicate", "OBAN:association_has_object",
        "faldo:location", "faldo:begin", "faldo:end", "faldo:reference",
        "dc:source",
    ]
    annotations = [
        "rdfs:label", "rdfs:comment", "dc:description", "dc:date",
        "OIO:hasExactSynonym", "OIO:hasRelatedSynonym", "OIO:hasDbXref",
        "IAO:0000115", "SEPIO:0000187",
    ]
    data_props = ["faldo:position", "SIO:000300", ":has_quantifier"]
    rows = (
        [(p, OBJECT_PROPERTY) for p in objects]
        + [(p, ANNOTATION_PROPERTY) for p in annotations]
        + [(p, DATATYPE_PROPERTY) for p in data_props]
    )
    return spark.createDataFrame(rows, "property string, prop_type string")
