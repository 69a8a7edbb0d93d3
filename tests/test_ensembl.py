"""Ensembl: biotype SO dispatch, human xref-vs-equivalence split, gene
products (reference Ensembl.py:293-390)."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline
from dipper_spark.sources.ensembl import COLUMNS

HEADER = "\t".join(COLUMNS)

HUMAN = "\n".join(
    [
        HEADER,
        "\t".join(["ENSG00000136828", "KIF7", "kinesin family member 7", "protein_coding",
                   "374654", "ENSP00000374875", "Q2M1P5", "HGNC:30497"]),
        "\t".join(["ENSG00000284662", "OR4F16", "", "misc_biotype", "81399", "", "", ""]),
        "",
    ]
)

MOUSE = "\n".join(
    [
        HEADER,
        "\t".join(["ENSMUSG00000030846", "Kif7", "", "protein_coding", "16576", "", "", ""]),
        "",
    ]
)


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("ensembl_raw")
    src = get_pipeline("ensembl")
    (raw / src.files["9606"].file).write_text(HUMAN)
    (raw / src.files["10090"].file).write_text(MOUSE)
    return src.transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_typed_gene(graph):
    t = _spo(graph.filter(F.col("subject") == "ENSEMBL:ENSG00000136828"))
    assert ("ENSEMBL:ENSG00000136828", "rdf:type", "SO:0001217") in t
    assert ("ENSEMBL:ENSG00000136828", "rdfs:label", "KIF7") in t
    assert ("ENSEMBL:ENSG00000136828", "dc:description", "kinesin family member 7") in t
    assert ("ENSEMBL:ENSG00000136828", "RO:0002162", "NCBITaxon:9606") in t


def test_unknown_biotype_defaults(graph):
    t = _spo(graph.filter(F.col("subject") == "ENSEMBL:ENSG00000284662"))
    assert ("ENSEMBL:ENSG00000284662", "rdf:type", "SO:0000104") in t


def test_human_entrez_is_xref_mouse_is_equivalence(graph):
    t = _spo(graph)
    assert ("ENSEMBL:ENSG00000136828", "OIO:hasDbXref", "NCBIGene:374654") in t
    assert ("ENSEMBL:ENSG00000136828", "owl:equivalentClass", "NCBIGene:374654") not in t
    assert ("ENSEMBL:ENSMUSG00000030846", "owl:equivalentClass", "NCBIGene:16576") in t
    assert ("ENSEMBL:ENSG00000136828", "owl:equivalentClass", "HGNC:30497") in t


def test_gene_products(graph):
    t = _spo(graph.filter(F.col("predicate") == "RO:0002205"))
    assert ("ENSEMBL:ENSG00000136828", "RO:0002205", "ENSEMBL:ENSP00000374875") in t
    assert ("ENSEMBL:ENSG00000136828", "RO:0002205", "UniProtKB:Q2M1P5") in t
    x = _spo(graph.filter(F.col("predicate") == "OIO:hasDbXref"))
    assert ("ENSEMBL:ENSP00000374875", "OIO:hasDbXref", "UniProtKB:Q2M1P5") in x
