"""SGD: entity:quality APO composition, experiment-type evidence, reference
first-as-source + sameAs chain (reference SGD.py:80-256)."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline
from dipper_spark.sources.sgd import COLUMNS


def _row(**kw):
    row = {c: "" for c in COLUMNS}
    row.update(kw)
    return "\t".join(row[c] for c in COLUMNS)


TSV = "\n".join(
    [
        _row(**{
            "Feature Name": "YAL001C", "Gene Name": "TFC3", "SGDID": "S000000001",
            "Reference": "SGD_REF:S000049602|PMID:2957602",
            "Experiment Type": "classical genetics (direct assay)",
            "Mutant Type": "conditional", "Allele": "tfc3-1",
            "Strain Background": "S288C", "Phenotype": "viability: inviable",
        }),
        # no quality → bare APO id; two experiment types
        _row(**{
            "Feature Name": "YAL002W", "Gene Name": "VPS8", "SGDID": "S000000002",
            "Reference": "PMID:1",
            "Experiment Type": "classical genetics, large-scale survey (x)",
            "Phenotype": "viability",
        }),
        # no gene name → dropped
        _row(**{"Feature Name": "YAL003W", "SGDID": "S000000003",
                "Reference": "PMID:2", "Experiment Type": "classical genetics (y)",
                "Phenotype": "viability"}),
        "",
    ]
)


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("sgd_raw")
    src = get_pipeline("sgd")
    (raw / src.files["sgd_phenotype"].file).write_text(TSV)
    return src.transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_composite_phenotype(graph):
    t = _spo(graph)
    assert ("SGD:S000000001", "RO:0002200", "MONARCH:APO_0000111APO_0000112") in t
    assert ("MONARCH:APO_0000111APO_0000112", "rdfs:label", "viability:inviable") in t
    assert ("MONARCH:APO_0000111APO_0000112", "rdfs:subClassOf", "UPHENO:0001001") in t


def test_bare_phenotype(graph):
    t = _spo(graph)
    assert ("SGD:S000000002", "RO:0002200", "APO:0000111") in t


def test_experiment_evidence(graph):
    ev = {(r.subject, r.object) for r in graph.filter(F.col("predicate") == "RO:0002558").collect()}
    eco = {o for _, o in ev}
    assert "APO:0000020" in eco and "APO:0000010" in eco
    assert ("APO:0000020", "rdfs:label", "classical genetics") in _spo(graph)


def test_references(graph):
    t = _spo(graph)
    src = {o for s, p, o in t if p == "dc:source"}
    assert "SGD_REF:S000049602" in src
    assert ("SGD_REF:S000049602", "owl:sameAs", "PMID:2957602") in t
    assert ("SGD_REF:S000049602", "rdf:type", "IAO:0000311") in t


def test_description_on_assoc(graph):
    d = graph.filter(
        (F.col("predicate") == "dc:description") & F.col("object").contains("allele: tfc3-1")
    ).collect()
    assert len(d) == 1
    assert "genomic_background: S288C" in d[0].object


def test_geneless_dropped(graph):
    assert graph.filter(F.col("subject") == "SGD:S000000003").count() == 0
