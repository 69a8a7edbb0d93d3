"""MyChem: staged-JSON scan with explicit nested schema, action minting,
bioactivity-over-druguse precedence (reference MyChem.py:40-175)."""

import json

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline

DRUGBANK = "\n".join(
    [
        json.dumps({
            "unii": {"unii": "9100L32L2N"},
            "drugbank": {
                "drugbank_id": "DB00945",
                "targets": [
                    {"uniprot": "P23219", "name": "Prostaglandin G/H synthase 1",
                     "actions": ["inhibitor", "positive allosteric modulator"]},
                ],
            },
        }),
        # no unii → skipped
        json.dumps({"drugbank": {"drugbank_id": "DB99999", "targets": []}}),
        "",
    ]
)

DRUGCENTRAL = "\n".join(
    [
        json.dumps({
            "unii": {"unii": "R16CO5Y76E"},
            "drugcentral": {
                "bioactivity": [{"uniprot_id": "P35354|P23219", "target_class": "Enzyme", "target": "COX"}],
            },
        }),
        json.dumps({
            "unii": {"unii": "362O9ITL9D"},
            "drugcentral": {
                "drug_use": [
                    {"relation": "indication", "snomed_id": "38341003", "snomed_name": "Hypertensive disorder"},
                    {"relation": "contraindication", "snomed_id": "1000", "snomed_name": "X"},
                ],
            },
        }),
        "",
    ]
)


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("mychem_raw")
    src = get_pipeline("mychem")
    (raw / src.files["drugbank"].file).write_text(DRUGBANK)
    (raw / src.files["drugcentral"].file).write_text(DRUGCENTRAL)
    return src.transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_action_edges_minted(graph):
    t = _spo(graph.filter(F.col("subject") == "UNII:9100L32L2N"))
    assert ("UNII:9100L32L2N", "MONARCH:inhibitor", "UniProtKB:P23219") in t
    assert ("UNII:9100L32L2N", "MONARCH:positive_allosteric_modulator", "UniProtKB:P23219") in t
    assert ("UNII:9100L32L2N", "rdfs:subClassOf", "CHEBI:23367") in t


def test_action_subproperty_and_target_typing(graph):
    t = _spo(graph)
    assert ("MONARCH:inhibitor", "rdfs:subPropertyOf", "RO:0002436") in t
    assert ("UniProtKB:P23219", "rdfs:subClassOf", "SO:0000104") in t
    assert ("UniProtKB:P23219", "rdfs:label", "Prostaglandin G/H synthase 1") in t
    assert ("DrugBank:DB00945", "owl:equivalentClass", "UNII:9100L32L2N") in t


def test_uniprot_pipe_split(graph):
    t = _spo(graph.filter(F.col("predicate") == "RO:0002436"))
    assert ("UNII:R16CO5Y76E", "RO:0002436", "UniProtKB:P35354") in t
    assert ("UNII:R16CO5Y76E", "RO:0002436", "UniProtKB:P23219") in t


def test_indications_skip_contraindication(graph):
    t = _spo(graph.filter(F.col("predicate") == "RO:0002606"))
    assert t == {("UNII:362O9ITL9D", "RO:0002606", "SNOMED:38341003")}
    assert graph.filter(F.col("object") == "SNOMED:1000").count() == 0
    assert ("SNOMED:38341003", "rdfs:label", "Hypertensive disorder") in _spo(graph)


def test_recordless_unii_skipped(graph):
    assert graph.filter(F.col("subject") == "DrugBank:DB99999").count() == 0


def test_golden_reference_record(spark, tmp_path):
    """reference test_parse (/root/reference/tests/test_mychem.py) over the
    verbatim resources/mychem/mychem.json record fed through the
    drugcentral path: the indication edge + chemical/disease typings, the
    contraindication skipped; biolink categories scoped out."""
    import json
    import os

    src_json = "/root/reference/tests/resources/mychem/mychem.json"
    if not os.path.exists(src_json):
        pytest.skip("reference fixtures absent")
    record = json.load(open(src_json))[0]
    (tmp_path / "drugcentral_interactors.jsonl").write_text(json.dumps(record) + "\n")
    (tmp_path / "drugbank_targets.jsonl").write_text(json.dumps(record) + "\n")
    got = get_pipeline("mychem").transform(spark, str(tmp_path))
    spo = _spo(got)
    expected = {
        ("UNII:46U771ERWK", "RO:0002606", "SNOMED:386761002"),
        ("UNII:46U771ERWK", "rdfs:subClassOf", "CHEBI:23367"),
        ("SNOMED:386761002", "rdfs:label", "Local anesthesia"),
        ("SNOMED:386761002", "rdfs:subClassOf", "MONDO:0000001"),
    }
    assert expected <= spo, expected - spo
    # the contraindication must not appear
    assert not any(o == "SNOMED:30911005" for _, _, o in spo)


# ---- reference golden: the reference's own mychem.json fixture --------------

import os

REF_FIXTURE = "/root/reference/tests/resources/mychem/mychem.json"


@pytest.mark.skipif(not os.path.exists(REF_FIXTURE), reason="reference fixture absent")
def test_reference_fixture_golden(spark, tmp_path):
    """Port of /root/reference/tests/test_mychem.py::test_parse — the one
    reference source test that ships BOTH a fixture and an expected graph.
    The record is fed to both roles (drugbank_targets + drugcentral
    interactors) exactly as the reference setUp does; the drugbank branch
    has no targets and contributes nothing.  Expected triples quoted from
    the reference test (test_mychem.py:38-48) minus its biolink:category
    decorations (documented engine-wide divergence)."""
    from dipper_spark.core.triples import graph_diff
    from dipper_spark.io.turtle_parse import triples_from_turtle

    records = json.load(open(REF_FIXTURE))
    src = get_pipeline("mychem")
    raw = tmp_path / "raw"
    raw.mkdir()
    body = "\n".join(json.dumps(r) for r in records) + "\n"
    (raw / src.files["drugbank"].file).write_text(body)
    (raw / src.files["drugcentral"].file).write_text(body)
    got = src.transform(spark, str(raw))
    golden = """
    UNII:46U771ERWK RO:0002606 SNOMED:386761002 ;
        rdfs:subClassOf CHEBI:23367 .
    SNOMED:386761002 rdfs:label "Local anesthesia" ;
        rdfs:subClassOf MONDO:0000001 .
    """
    expected = triples_from_turtle(spark, golden)
    only_engine, only_golden = graph_diff(got, expected)
    assert only_golden.isEmpty(), [tuple(r) for r in only_golden.collect()]
    assert only_engine.isEmpty(), [tuple(r) for r in only_engine.collect()]
