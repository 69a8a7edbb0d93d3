"""Coriell: latin-1 CSV, cell-line/patient/family build, repository
membership, disease associations (reference Coriell.py:249-786)."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline
from dipper_spark.sources.coriell import COLUMNS


def _row(**kw):
    row = {c: "" for c in COLUMNS}
    row.update(kw)
    return ",".join(f'"{row[c]}"' for c in COLUMNS)


CSV = "\n".join(
    [
        ",".join(COLUMNS),
        _row(
            catalog_id="GM00003", description="HURLER SYNDROME; MPS-I",
            omim_num="607014", sample_type="Fibroblast", dna_ref="GM00004",
            gender="Female", affected="No", relprob="parent", fam="39",
            collection="NIGMS Human Genetic Cell Repository",
            cat_remark="46;XX; clinically normal mother", species="Homo sapiens",
        ),
        _row(
            catalog_id="GM00325", description="GAUCHER DISEASE",
            omim_num="230800;611254", sample_type="Fibroblast", gender="Male",
            affected="Yes", relprob="proband", fam="39",
            collection="NIGMS Human Genetic Cell Repository",
            dbsnp_id="na001", species="Homo sapiens",
        ),
        "",
    ]
)


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("coriell_raw")
    src = get_pipeline("coriell")
    (raw / src.files["NIGMS"].file).write_bytes(CSV.encode("iso-8859-1"))
    return src.transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_cell_line_and_equivalent(graph):
    t = _spo(graph.filter(F.col("subject") == "Coriell:GM00003"))
    assert ("Coriell:GM00003", "rdf:type", "CLO:0000031") in t
    assert ("Coriell:GM00003", "rdfs:label", "NIGMS-GM00003") in t
    assert ("Coriell:GM00003", "owl:sameAs", "Coriell:GM00004") in t
    assert ("Coriell:GM00003", "dc:description", "46;XX; clinically normal mother") in t
    # derives from fibroblast cell type
    assert ("Coriell:GM00003", "RO:0001000", "CL:0000057") in t


def test_patient_and_label(graph):
    # the non-proband parent gets an 'of proband with' label
    lab = graph.filter(
        (F.col("predicate") == "rdfs:label")
        & (F.col("object") == "unaffected female parent of proband with Hurler syndrome")
    ).collect()
    assert len(lab) == 1 and lab[0].subject.startswith("_:b")
    # proband phrasing
    assert graph.filter(
        F.col("object") == "affected male proband with Gaucher disease"
    ).count() == 1


def test_repository_membership(graph):
    t = _spo(graph.filter(F.col("subject") == "CoriellCollection:NIGMS"))
    assert ("CoriellCollection:NIGMS", "RO:0002351", "Coriell:GM00003") in t
    assert ("CoriellCollection:NIGMS", "RO:0002351", "Coriell:GM00325") in t


def test_family_membership(graph):
    fam = _spo(graph.filter(F.col("object") == "CoriellFamily:39"))
    members = [s for s, p, _ in fam if p == "RO:0002350"]
    assert len(members) == 2  # both patients in family 39
    t = _spo(graph.filter(F.col("subject") == "CoriellFamily:39"))
    assert ("CoriellFamily:39", "rdf:type", "PCO:0000020") in t


def test_dbsnp_genotype(graph):
    t = _spo(graph.filter(F.col("predicate") == "GENO:0000222"))
    assert len(t) == 1
    assert next(iter(t))[2] == "dbSNPIndividual:na001"


def test_disease_assoc_only_for_affected(graph):
    dz = {o for _, p, o in _spo(graph) if p == "RO:0002200"}
    assert dz == {"OMIM:230800", "OMIM:611254"}  # affected proband only
    assert graph.filter(F.col("object") == "OMIM:607014").count() == 0


def test_collection_stanza(graph):
    """_process_collection (Coriell.py:787-813): repository individual typed
    ERO collection with label + foaf:page IRI."""
    spo = {(r.subject, r.predicate, r.object) for r in graph.collect()}
    assert ("CoriellCollection:NIGMS", "rdf:type", "ERO:0002190") in spo
    assert ("CoriellCollection:NIGMS", "rdfs:label",
            "NIGMS Human Genetic Cell Repository") in spo
    assert ("CoriellCollection:NIGMS", "foaf:page",
            "https://catalog.coriell.org/1/NIGMS") in spo
