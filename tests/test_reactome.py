"""Reactome: pathway classes, involved-in associations, ECO hop, dual-prefix
union (FIXTURES.md §13; reference Reactome.py:104-161)."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline

ENS = "\n".join(
    [
        "\t".join(["ENSBTAG00000000010", "R-BTA-70895", "https://reactome.org/PathwayBrowser/#/R-BTA-70895",
                   "Branched-chain amino acid catabolism", "IEA", "Bos taurus"]),
        "\t".join(["ENSG00000000419", "R-HSA-162699", "https://reactome.org/x",
                   "Synthesis of GPI", "TAS", "Homo sapiens"]),
        # unknown evidence code → assoc without evidence triple
        "\t".join(["ENSG00000000457", "R-HSA-199977", "https://reactome.org/y",
                   "ER to Golgi", "ZZZ", "Homo sapiens"]),
        "",
    ]
)

CHEBI = "\n".join(
    [
        "\t".join(["16027", "R-HSA-196849", "https://reactome.org/z",
                   "Metabolism of nucleotides", "TAS", "Homo sapiens"]),
        "",
    ]
)


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("reactome_raw")
    src = get_pipeline("reactome")
    (raw / src.files["ensembl2pathway"].file).write_text(ENS)
    (raw / src.files["chebi2pathway"].file).write_text(CHEBI)
    return src.transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_pathway_class(graph):
    t = _spo(graph.filter(F.col("subject") == "REACT:R-BTA-70895"))
    assert ("REACT:R-BTA-70895", "rdf:type", "owl:Class") in t
    assert ("REACT:R-BTA-70895", "rdfs:subClassOf", "GO:0009987") in t
    assert ("REACT:R-BTA-70895", "rdfs:subClassOf", "PW:0000001") in t
    assert ("REACT:R-BTA-70895", "rdfs:label", "Branched-chain amino acid catabolism") in t


def test_involvement_edges_both_prefixes(graph):
    t = _spo(graph.filter(F.col("predicate") == "RO:0002331"))
    assert ("ENSEMBL:ENSBTAG00000000010", "RO:0002331", "REACT:R-BTA-70895") in t
    assert ("CHEBI:16027", "RO:0002331", "REACT:R-HSA-196849") in t


def test_reified_assoc_with_eco(graph):
    ev = graph.filter(F.col("predicate") == "RO:0002558").collect()
    eco = {r.object for r in ev}
    assert eco == {"ECO:0000501", "ECO:0000304"}  # IEA + TAS ×2; ZZZ dropped
    assert len(ev) == 3
    assert graph.filter(
        (F.col("predicate") == "rdf:type") & (F.col("object") == "OBAN:association")
    ).count() == 4


def test_test_mode_subset(graph, spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("reactome_raw2")
    src = get_pipeline("reactome")
    (raw / src.files["ensembl2pathway"].file).write_text(ENS)
    (raw / src.files["chebi2pathway"].file).write_text(CHEBI)
    sub = src.transform(spark, str(raw), test_mode=True)
    subs = {r.subject for r in sub.collect()}
    assert "ENSEMBL:ENSG00000000419" not in subs
    assert any(s == "ENSEMBL:ENSBTAG00000000010" for s in subs)
    assert any(s == "CHEBI:16027" for s in subs)
