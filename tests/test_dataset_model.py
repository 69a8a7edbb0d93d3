"""HCLS dataset-metadata goldens, ported from
/root/reference/tests/test_dataset.py (DatasetTestCase): the three-level
summary/version/distribution stanza with the reference's exact IRI shapes,
checked at expanded-IRI level through the engine's curie map.

The reference stamps datetime.today(); here the date is injected
(today='20200101') so every triple is deterministic — same contract, no
wall-clock coupling.
"""

import pytest
from pyspark.sql import functions as F

from dipper_spark.core import TRIPLE_SCHEMA
from dipper_spark.core.curie import CurieMap
from dipper_spark.models import hcls_dataset_triples

# the reference test's parameters (test_dataset.py:29-46)
IDENT = "fakeingest"
VERSION = "19700101"
TODAY = "20200101"
TITLE = "this ingest title"
DESC = "some ingest description"
URL = "http://fakeingest.com"
LOGO = "logo.png"
LICENSE = "https://choosealicense.com/licenses/mit/"
RIGHTS = "https://www.gnu.org/licenses/gpl-3.0.html"

ARCHIVE = "https://archive.monarchinitiative.org/"
# expected IRIs (test_dataset.py:63-90)
SUMMARY = ARCHIVE + "#" + IDENT
VERSION_IRI = ARCHIVE + VERSION + "/#" + IDENT
DIST = ARCHIVE + VERSION + "/rdf/" + IDENT + ".ttl"
MI = "https://monarchinitiative.org/"
LOGO_IRI = (
    "https://github.com/monarch-initiative/monarch-ui/blob/master/public/img/sources/"
    + LOGO
)

_CM = CurieMap()


def _x(term):
    if "://" in term or ":" not in term:
        return term
    return _CM.expand_str(term)


@pytest.fixture(scope="module")
def stanza(spark):
    tiny = spark.createDataFrame(
        [("HP:1", "rdfs:label", "x", True, None, None),
         ("HP:1", "rdf:type", "owl:Class", False, None, None)],
        TRIPLE_SCHEMA,
    )
    df = hcls_dataset_triples(
        spark, tiny, IDENT,
        data_release_version=VERSION, today=TODAY,
        ingest_title=TITLE, ingest_url=URL, ingest_logo=LOGO,
        ingest_description=DESC, license_url=LICENSE, data_rights=RIGHTS,
        source_files={
            "http://somefilesource.org/file.txt": {
                "retrieved_on": "1970-01-01", "version": "version1234",
            }
        },
        citations=[
            "http://purl.obolibrary.org/obo/uberon/releases/2016-01-26/uberon.owl"
        ],
    )
    return {
        (_x(r.subject), _x(r.predicate), r.object if r.is_literal else _x(r.object))
        for r in df.collect()
    }


# ---- summary level (test_dataset.py:197-250) --------------------------------

def test_summary_level(stanza):
    dctypes_dataset = "http://purl.org/dc/dcmitype/Dataset"
    assert (SUMMARY, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", dctypes_dataset) in stanza
    assert (SUMMARY, "http://purl.org/dc/terms/title", TITLE) in stanza
    assert (SUMMARY, "http://purl.org/dc/terms/Publisher", MI) in stanza
    assert (SUMMARY, "http://purl.org/dc/terms/source", URL) in stanza
    assert (SUMMARY, "http://schema.org/logo", LOGO_IRI) in stanza
    assert (SUMMARY, "http://purl.org/dc/terms/description", DESC) in stanza
    # ontology declaration + owl:versionIRI → version level (239-250)
    assert (SUMMARY, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://www.w3.org/2002/07/owl#Ontology") in stanza
    assert (SUMMARY, "http://www.w3.org/2002/07/owl#versionIRI", VERSION_IRI) in stanza


# ---- version level (test_dataset.py:251-336) --------------------------------

def test_version_level(stanza):
    assert (VERSION_IRI, "http://purl.org/dc/terms/title",
            TITLE + " Monarch version " + VERSION) in stanza
    assert (VERSION_IRI, "http://purl.org/dc/terms/created", TODAY) in stanza
    assert (VERSION_IRI, "http://purl.org/pav/version", VERSION) in stanza
    assert (VERSION_IRI, "http://purl.org/dc/terms/creator", MI) in stanza
    assert (VERSION_IRI, "http://purl.org/dc/terms/Publisher", MI) in stanza
    assert (VERSION_IRI, "http://purl.org/dc/terms/isVersionOf", SUMMARY) in stanza
    assert (VERSION_IRI, "http://www.w3.org/ns/dcat#distribution", DIST) in stanza


def test_citation_and_source_file_provenance(stanza):
    """test_set_citation (163-173) + set_ingest_source_file_version_*
    (174-196)."""
    cite = "http://purl.obolibrary.org/obo/uberon/releases/2016-01-26/uberon.owl"
    assert (VERSION_IRI, "http://purl.org/spar/cito/citesAsAuthority", cite) in stanza
    f = "http://somefilesource.org/file.txt"
    # version level links each ingest source file (Dataset.py:77-84)
    assert (VERSION_IRI, "http://purl.org/dc/terms/source", f) in stanza
    assert (f, "http://purl.org/pav/retrievedOn", "1970-01-01") in stanza
    assert (f, "http://purl.org/pav/version", "version1234") in stanza


# ---- distribution level (test_dataset.py:337-460) ---------------------------

def test_distribution_level(stanza):
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert (DIST, rdf_type, "http://purl.org/dc/dcmitype/Dataset") in stanza
    assert (DIST, rdf_type, "http://www.w3.org/ns/dcat#Distribution") in stanza
    assert (DIST, "http://purl.org/dc/terms/title", TITLE + " distribution ttl") in stanza
    assert (DIST, "http://purl.org/dc/terms/created", TODAY) in stanza
    assert (DIST, "http://purl.org/pav/version", VERSION) in stanza
    assert (DIST, "http://purl.org/dc/terms/creator", MI) in stanza
    assert (DIST, "http://purl.org/dc/terms/Publisher", MI) in stanza
    assert (DIST, "http://purl.org/pav/createdWith",
            "https://github.com/monarch-initiative/dipper") in stanza
    assert (DIST, "http://purl.org/dc/terms/format", "https://www.w3.org/TR/turtle/") in stanza
    assert (DIST, "http://www.w3.org/ns/dcat#downloadURL", DIST) in stanza
    assert (DIST, "http://purl.org/dc/terms/license", LICENSE) in stanza
    assert (DIST, "http://purl.org/dc/terms/rights", RIGHTS) in stanza
    # VoID statistics on the distribution node (Dataset.py:123-127)
    assert (DIST, "http://rdfs.org/ns/void#triples", "2") in stanza


def test_default_license_when_unset(spark):
    """test_distribution_level_no_license_url_default_value (439-447)."""
    tiny = spark.createDataFrame([("a", "b", "c", True, None, None)], TRIPLE_SCHEMA)
    df = hcls_dataset_triples(
        spark, tiny, IDENT, data_release_version=VERSION, today=TODAY,
    )
    lic = [
        r.object for r in df.collect()
        if r.subject.endswith(".ttl") and r.predicate == "dc:license"
    ]
    assert lic == ["https://project-open-data.cio.gov/unknown-license/"]


def test_version_and_distribution_descriptions(stanza):
    """test_version_level_description (266-271) +
    test_distribution_level_description (362-368): the ingest description
    appears verbatim at all three levels."""
    pred = "http://purl.org/dc/terms/description"
    assert (VERSION_IRI, pred, DESC) in stanza
    assert (DIST, pred, DESC) in stanza


def test_default_version_is_today(spark):
    """test_version_level_version_default (282-291): when no
    data_release_version is given, the version level stamps today and the
    version/distribution IRIs are built from it."""
    tiny = spark.createDataFrame([("a", "b", "c", True, None, None)], TRIPLE_SCHEMA)
    df = hcls_dataset_triples(spark, tiny, IDENT, today=TODAY)
    rows = {
        (_x(r.subject), _x(r.predicate), r.object if r.is_literal else _x(r.object))
        for r in df.collect()
    }
    v_iri = ARCHIVE + TODAY + "/#" + IDENT
    d_iri = ARCHIVE + TODAY + "/rdf/" + IDENT + ".ttl"
    assert (v_iri, "http://purl.org/pav/version", TODAY) in rows
    assert (v_iri, "http://www.w3.org/ns/dcat#distribution", d_iri) in rows


def test_exactly_one_version_triple(stanza):
    """The reference asserts len == 1 on the version-level pav:version
    (282-291); set-membership alone can't catch duplicates, so count."""
    n = sum(
        1 for s, p, o in stanza
        if s == VERSION_IRI and p == "http://purl.org/pav/version"
    )
    assert n == 1
