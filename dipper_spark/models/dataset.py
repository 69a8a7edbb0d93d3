"""HCLS dataset-metadata emitter (3-level: summary/version/distribution).

Reference: dipper/models/Dataset.py:19-164 (model) and 245-339 (triple
emission); the VoID statistics block (void:triples, void:distinctSubjects,
void:distinctObjects, void:properties) is spec'd at Dataset.py:123-127.

Spark-first: the statistics come from ONE aggregate pass over the graph
(core.triples.void_stats — partial aggregation, a single 1-row shuffle); the
metadata stanza itself is a tiny driver-built DataFrame unioned into the
output, exactly like Source.write unions the dataset graph (Source.py:228-229).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dipper_spark.core.schema import TRIPLE_SCHEMA
from dipper_spark.core.triples import void_stats
from dipper_spark.models import terms as T


def dataset_metadata_triples(
    spark: SparkSession,
    graph: DataFrame,
    dataset_id: str,
    *,
    title: str | None = None,
    publisher: str | None = None,
    version: str | None = None,
    download_url: str | None = None,
    exact_counts: bool = True,
    graph_id: str | None = None,
) -> DataFrame:
    """Emit the HCLS stanza for ``graph``:

    summary level   (Dataset.py:245-264): type/title/publisher
    version level   (Dataset.py:265-288): pav:version
    distribution    (Dataset.py:289-340): void:dataDump + VoID counts

    ``exact_counts=False`` switches the statistics to approx_count_distinct
    for the 100 TB path (Dataset metadata does not need exact HLLs).
    """
    stats = void_stats(graph, exact=exact_counts).collect()[0]

    def t(s: str, p: str, o: str, lit: bool, dt: str | None = None):
        return (s, p, o, lit, dt, graph_id)

    rows = [
        t(dataset_id, T.TYPE, T.DCTYPES_DATASET, False),
        t(dataset_id, T.VOID_TRIPLES, str(stats["n_triples"]), True, "xsd:integer"),
        t(dataset_id, T.VOID_DISTINCT_SUBJECTS, str(stats["n_subjects"]), True, "xsd:integer"),
        t(dataset_id, T.VOID_DISTINCT_OBJECTS, str(stats["n_objects"]), True, "xsd:integer"),
        t(dataset_id, T.VOID_PROPERTIES, str(stats["n_properties"]), True, "xsd:integer"),
    ]
    if title is not None:
        rows.append(t(dataset_id, T.DC_TITLE, title, True))
    if publisher is not None:
        rows.append(t(dataset_id, T.DC_PUBLISHER, publisher, True))
    if version is not None:
        rows.append(t(dataset_id, T.DC_VERSION, version, True))
    if download_url is not None:
        rows.append(t(dataset_id, T.VOID_DATA_DUMP, download_url, False))
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)
