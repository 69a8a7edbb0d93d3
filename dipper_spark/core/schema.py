"""Canonical triples DataFrame schema.

The reference models everything as RDF triples held in an rdflib store
(reference: dipper/graph/Graph.py:23-41 `addTriple(subject_id, predicate_id,
obj, object_is_literal, literal_type, ...)`).  Here the graph IS a DataFrame
with this closed schema; per-source staging DataFrames are typed and only
collapse to lexical string form when they become triples.

Scale note: a long-format triples table sharded by (subject) hash supports
the 100 TB case — all downstream ops (dedup, predicate histogram, serialization
grouping) partition cleanly on subject or (s,p,o).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import BooleanType, StringType, StructField, StructType

TRIPLE_COLUMNS = ["subject", "predicate", "object", "is_literal", "datatype", "graph_id"]

TRIPLE_SCHEMA = StructType(
    [
        StructField("subject", StringType(), nullable=False),
        StructField("predicate", StringType(), nullable=False),
        StructField("object", StringType(), nullable=False),
        # literal vs IRI/CURIE object (reference: RDFGraph._is_literal,
        # dipper/graph/RDFGraph.py:67-79)
        StructField("is_literal", BooleanType(), nullable=False),
        # XSD datatype curie for typed literals, null for plain/IRI
        # (reference: StreamedGraph._getLiteralXSDType, StreamedGraph.py:155-166)
        StructField("datatype", StringType(), nullable=True),
        # provenance partition: which source pipeline emitted the triple
        # (reference: one output graph per source, Source.py:178-240)
        StructField("graph_id", StringType(), nullable=True),
    ]
)


def empty_triples(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], TRIPLE_SCHEMA)
