"""BioGrid: interactor curie priority, taxon pair filter, MI resolution
fallbacks, pubmed scrub (reference BioGrid.py:123-234)."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline


def _row(a, b, det, pub, tax_a, tax_b, itype):
    return "\t".join([a, b, "-", "-", "-", "-", det, "auth", pub, tax_a, tax_b, itype, "biogrid", "123", "-"])


MITAB = "\n".join(
    [
        "#ID Interactor A\tID Interactor B\t...",
        _row(
            "entrez gene/locuslink:351|BIOGRID:106848", "entrez gene/locuslink:805|BIOGRID:107282",
            'psi-mi:"MI:0018"(two hybrid)', "pubmed:10606662", "taxid:9606", "taxid:9606",
            'psi-mi:"MI:0407"(direct interaction)',
        ),
        # biogrid-only id + unknown MI codes → fallbacks
        _row(
            "biogrid:200", "swiss-prot:P12345", 'psi-mi:"MI:9999"(exotic)', "pubmed:1", "taxid:10090", "taxid:10090",
            'psi-mi:"MI:0403"(colocalization)',
        ),
        # taxon mismatch → dropped
        _row(
            "entrez gene/locuslink:1", "entrez gene/locuslink:2", 'psi-mi:"MI:0018"(x)', "pubmed:2",
            "taxid:4932", "taxid:9606", 'psi-mi:"MI:0407"(y)',
        ),
        # unparseable interactor → dropped
        _row("mystery:42", "entrez gene/locuslink:3", 'psi-mi:"MI:0018"(x)', "pubmed:3",
             "taxid:9606", "taxid:9606", 'psi-mi:"MI:0407"(y)'),
        "",
    ]
)


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("biogrid_raw")
    src = get_pipeline("biogrid")
    (raw / src.files["interactions"].file).write_text(MITAB)
    return src.transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_direct_interaction(graph):
    t = _spo(graph)
    assert ("NCBIGene:351", "RO:0002434", "NCBIGene:805") in t


def test_curie_priority_and_colocalization(graph):
    t = _spo(graph)
    assert ("BIOGRID:200", "RO:0002325", "UniProtKB:P12345") in t


def test_evidence_resolution_and_fallback(graph):
    eco = {r.object for r in graph.filter(F.col("predicate") == "RO:0002558").collect()}
    assert eco == {"ECO:0000068", "ECO:0000006"}  # two-hybrid + fallback


def test_pub_scrub(graph):
    src = {r.object for r in graph.filter(F.col("predicate") == "dc:source").collect()}
    assert src == {"PMID:10606662", "PMID:1"}


def test_filters(graph):
    assert graph.filter(F.col("subject") == "NCBIGene:1").count() == 0
    assert graph.filter(F.col("object") == "NCBIGene:3").count() == 0
    assert graph.filter(
        (F.col("predicate") == "rdf:type") & (F.col("object") == "OBAN:association")
    ).count() == 2


def test_golden_interactor_to_gene_curie(spark):
    """reference test_interactor_to_gene_curie
    (/root/reference/tests/test_biogrid.py:23-32), verbatim cases."""
    from dipper_spark.sources.biogrid import interactor_curie

    df = spark.createDataFrame(
        [("entrez gene/locuslink:3645446",), ("biogrid:4383875",),
         ("uniprot/swiss-prot:P0DTD2",), ("NOTAGENEID",)],
        ["raw"],
    )
    got = [r.c for r in df.select(interactor_curie(F.col("raw")).alias("c")).collect()]
    assert got == ["NCBIGene:3645446", "BIOGRID:4383875", "UniProtKB:P0DTD2", None]
