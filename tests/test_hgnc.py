"""HGNC: approved filter, locus-type SO dispatch, clique leader, xref
equivalences, band placement (reference HGNC.py:139-300)."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline
from dipper_spark.sources.hgnc import COLUMNS


def _row(**kw):
    row = {c: "" for c in COLUMNS}
    row.update(kw)
    return "\t".join(row[c] for c in COLUMNS)


TSV = "\n".join(
    [
        "\t".join(COLUMNS),
        _row(hgnc_id="HGNC:5", symbol="A1BG", name="alpha-1-B glycoprotein",
             locus_type="gene with protein product", status="Approved",
             location="19q13.43", entrez_id="1", ensembl_gene_id="ENSG00000121410",
             pubmed_id="2591067|9100026", omim_id="138670"),
        _row(hgnc_id="HGNC:8", symbol="A2MP1", locus_type="pseudogene",
             status="Approved", location="12p13.31"),
        _row(hgnc_id="HGNC:99", symbol="GONE", locus_type="withdrawn", status="Approved"),
        _row(hgnc_id="HGNC:100", symbol="BAD", locus_type="gene with protein product",
             status="Entry Withdrawn"),
        _row(hgnc_id="HGNC:101", symbol="HOX@", locus_type="gene with protein product",
             status="Approved"),
        "",
    ]
)


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("hgnc_raw")
    src = get_pipeline("hgnc")
    (raw / src.files["genes"].file).write_text(TSV)
    return src.transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_typed_class_with_leader(graph):
    t = _spo(graph.filter(F.col("subject") == "HGNC:5"))
    assert ("HGNC:5", "rdf:type", "owl:Class") in t
    assert ("HGNC:5", "rdf:type", "SO:0001217") in t
    assert ("HGNC:5", "rdfs:label", "A1BG") in t
    assert ("HGNC:5", "dc:description", "alpha-1-B glycoprotein") in t
    assert ("HGNC:5", "MONARCH:cliqueLeader", "true") in t
    assert ("HGNC:5", "RO:0002162", "NCBITaxon:9606") in t


def test_equivalences(graph):
    t = _spo(graph.filter(F.col("predicate") == "owl:equivalentClass"))
    assert ("HGNC:5", "owl:equivalentClass", "NCBIGene:1") in t
    assert ("HGNC:5", "owl:equivalentClass", "ENSEMBL:ENSG00000121410") in t
    assert ("HGNC:5", "owl:equivalentClass", "OMIM:138670") in t


def test_pubs_exploded(graph):
    t = _spo(graph.filter(F.col("predicate") == "IAO:0000136"))
    assert ("PMID:2591067", "IAO:0000136", "HGNC:5") in t
    assert ("PMID:9100026", "IAO:0000136", "HGNC:5") in t


def test_band_placement(graph):
    t = _spo(graph.filter(F.col("predicate") == "RO:0002525"))
    assert ("HGNC:5", "RO:0002525", ":9606chr19q13.43") in t
    assert ("HGNC:8", "RO:0002525", ":9606chr12p13.31") in t


def test_withdrawn_and_skipped(graph):
    t = _spo(graph.filter(F.col("subject") == "HGNC:99"))
    assert ("HGNC:99", "owl:deprecated", "true") in t
    assert graph.filter(F.col("subject") == "HGNC:100").count() == 0  # not Approved
    assert graph.filter(F.col("subject") == "HGNC:101").count() == 0  # @ cluster
