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


MONARCH_ORG = "https://monarchinitiative.org/"
LOGO_BASE = (
    "https://github.com/monarch-initiative/monarch-ui/blob/master/public/img/sources/"
)
UNKNOWN_LICENSE = "https://project-open-data.cio.gov/unknown-license/"
CREATED_WITH = "https://github.com/monarch-initiative/dipper"

#: dc:format IRIs per distribution type (Dataset.py format handling)
FORMAT_IRI = {
    "ttl": "https://www.w3.org/TR/turtle/",
    "nt": "https://www.w3.org/TR/n-triples/",
    "nquads": "https://www.w3.org/TR/n-quads/",
    "rdfxml": "https://www.w3.org/TR/rdf-syntax-grammar/",
    "n3": "https://www.w3.org/TeamSubmission/n3/",
    "parquet": "https://parquet.apache.org/docs/file-format/",
}


def hcls_dataset_triples(
    spark: SparkSession,
    graph: DataFrame,
    identifier: str,
    *,
    data_release_version: str | None = None,
    today: str | None = None,
    ingest_title: str | None = None,
    ingest_url: str | None = None,
    ingest_logo: str | None = None,
    ingest_description: str | None = None,
    license_url: str | None = None,
    data_rights: str | None = None,
    distribution_type: str = "ttl",
    source_files: dict[str, dict] | None = None,
    citations: list[str] | None = None,
    exact_counts: bool = True,
    graph_id: str | None = None,
) -> DataFrame:
    """The reference's full three-level HCLS stanza (Dataset.py:19-340):

    - summary level ``MonarchArchive:#<ident>`` — dataset typing, title,
      publisher, logo, source page, identifier, owl:Ontology declaration +
      owl:versionIRI → version level (``_declare_as_ontology`` 476-505);
    - version level ``MonarchArchive:<ver>/#<ident>`` — dated/versioned
      dataset with isVersionOf and dcat:distribution edges, per-source-file
      pav:retrievedOn/pav:version provenance, cito:citesAsAuthority;
    - distribution level ``MonarchArchive:<ver>/rdf/<ident>.<fmt>`` —
      dcat:Distribution with creator/publisher/license/rights/format/
      downloadURL, plus the VoID statistics block (spec'd at Dataset.py:
      123-127; computed here from ONE aggregate pass over the graph).

    ``today``/``data_release_version`` are injectable for deterministic
    tests (the reference stamps ``datetime.today()``); both default to the
    current UTC date in the reference's ``%Y%m%d`` shape.
    """
    from datetime import datetime, timezone

    stamp = today or datetime.now(timezone.utc).strftime("%Y%m%d")
    ver = data_release_version or stamp
    summary = f"MonarchArchive:#{identifier}"
    version_lv = f"MonarchArchive:{ver}/#{identifier}"
    dist = f"MonarchArchive:{ver}/rdf/{identifier}.{distribution_type}"
    stats = void_stats(graph, exact=exact_counts).collect()[0]

    def t(s, p, o, lit=False, dt=None):
        return (s, p, o, lit, dt, graph_id)

    title = ingest_title or identifier
    rows = [
        # ---- summary level (Dataset.py:245-263) -----------------------------
        t(summary, T.TYPE, T.DCTYPES_DATASET),
        t(summary, T.DC_TITLE, title, True),
        t(summary, T.DC_PUBLISHER_CLS, MONARCH_ORG),
        t(summary, T.DC_IDENTIFIER, summary),
        t(summary, T.TYPE, T.OWL_ONTOLOGY),
        t(summary, T.OWL_VERSION_IRI, version_lv),
        # ---- version level (Dataset.py:264-288) -----------------------------
        t(version_lv, T.TYPE, T.DCTYPES_DATASET),
        t(version_lv, T.DC_TITLE, f"{title} Monarch version {ver}", True),
        t(version_lv, T.DC_CREATED, stamp, True, "xsd:date"),
        t(version_lv, T.PAV_VERSION, ver, True, "xsd:date"),
        t(version_lv, T.DC_CREATOR, MONARCH_ORG),
        t(version_lv, T.DC_PUBLISHER_CLS, MONARCH_ORG),
        t(version_lv, T.DC_IS_VERSION_OF, summary),
        t(version_lv, T.DCAT_DISTRIBUTION, dist),
        # ---- distribution level (Dataset.py:289-340) ------------------------
        t(dist, T.TYPE, T.DCTYPES_DATASET),
        t(dist, T.TYPE, T.DCAT_DISTRIBUTION_CLS),
        t(dist, T.DC_TITLE, f"{title} distribution {distribution_type}", True),
        t(dist, T.PAV_VERSION, ver, True, "xsd:date"),
        t(dist, T.DC_CREATED, stamp, True, "xsd:date"),
        t(dist, T.DC_CREATOR, MONARCH_ORG),
        t(dist, T.DC_PUBLISHER_CLS, MONARCH_ORG),
        t(dist, T.PAV_CREATED_WITH, CREATED_WITH),
        t(dist, T.DC_FORMAT, FORMAT_IRI.get(distribution_type, FORMAT_IRI["ttl"])),
        t(dist, T.DCAT_DOWNLOAD_URL, dist),
        t(dist, T.DC_LICENSE, license_url or UNKNOWN_LICENSE),
        # VoID statistics block on the distribution (Dataset.py:123-127)
        t(dist, T.VOID_TRIPLES, str(stats["n_triples"]), True, "xsd:integer"),
        t(dist, T.VOID_DISTINCT_SUBJECTS, str(stats["n_subjects"]), True, "xsd:integer"),
        t(dist, T.VOID_DISTINCT_OBJECTS, str(stats["n_objects"]), True, "xsd:integer"),
        t(dist, T.VOID_PROPERTIES, str(stats["n_properties"]), True, "xsd:integer"),
    ]
    if ingest_url:
        rows.append(t(summary, T.DC_SOURCE, ingest_url))
    if ingest_logo:
        rows.append(t(summary, T.SCHEMA_LOGO, LOGO_BASE + ingest_logo))
    if ingest_description:
        rows.append(t(summary, T.DESCRIPTION, ingest_description, True))
        rows.append(t(version_lv, T.DESCRIPTION, ingest_description, True))
        rows.append(t(dist, T.DESCRIPTION, ingest_description, True))
    if data_rights:
        rows.append(t(dist, T.DC_RIGHTS, data_rights))
    # per-source-file provenance (Dataset.py:77-84 version-level dc:source
    # edges; set_ingest_source_file_version_* 341-400)
    for file_iri, meta in (source_files or {}).items():
        rows.append(t(version_lv, T.DC_SOURCE, file_iri))
        if meta.get("retrieved_on"):
            rows.append(t(file_iri, T.PAV_RETRIEVED_ON, meta["retrieved_on"], True, "xsd:date"))
        if meta.get("version"):
            dt = "xsd:date" if meta.get("version_is_date") else None
            rows.append(t(file_iri, T.PAV_VERSION, meta["version"], True, dt))
    for cite in citations or []:
        rows.append(t(version_lv, T.CITES_AS_AUTHORITY, cite))
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)
