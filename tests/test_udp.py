"""UDP: point-in-interval variant→gene disambiguation via range join
(reference UDP.py:330-446)."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline

VARIANTS = "\n".join(
    [
        "patient\tbuild\tchromosome\tposition\treference_allele\tvariant_allele\ttype\tgenes_of_interest",
        # single gene: affected regardless of coordinates
        "P0001\thg19\t1\t1000\tA\tG\tmissense\tGENE1",
        # two candidates, upstream type: GENE2 contains the position →
        # affected; GENE3 does not → causally influences
        "P0001\thg19\t2\t5000\tC\tT\tupstream gene variant\tGENE2, GENE3",
        # candidate without coordinates → causally influences
        "P0002\thg19\t3\t700\tG\tA\tintron variant\tGENE4, NOCOORD",
        "",
    ]
)

COORDS = "\n".join(
    [
        "gene_symbol\tchromosome\tstart\tend\tstrand",
        "GENE2\t2\t4000\t6000\tplus",
        "GENE3\t2\t9000\t9500\tminus",
        "GENE4\t3\t500\t800\tplus",
        "",
    ]
)


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("udp_raw")
    src = get_pipeline("udp")
    (raw / src.files["variants"].file).write_text(VARIANTS)
    (raw / src.files["gene_coordinates"].file).write_text(COORDS)
    return src.transform(spark, str(raw)).cache()


def _rel(graph, gene):
    return {
        r.predicate
        for r in graph.filter(F.col("object") == f"HGNC_SYMBOL:{gene}").collect()
    }


def test_single_candidate_is_affected(graph):
    assert _rel(graph, "GENE1") == {"GENO:0000418"}


def test_interval_containment_disambiguates(graph):
    assert _rel(graph, "GENE2") == {"GENO:0000418"}
    assert _rel(graph, "GENE3") == {"RO:0002566"}


def test_coordinate_less_gene_is_influenced_only(graph):
    assert _rel(graph, "GENE4") == {"GENO:0000418"}  # 500<=700<=800
    assert _rel(graph, "NOCOORD") == {"RO:0002566"}


def test_variant_bnode_and_label(graph):
    lab = graph.filter(
        (F.col("predicate") == "rdfs:label") & F.col("object").contains("GENE2")
    ).collect()
    assert len(lab) == 1
    assert lab[0].object == "hg19-2:5000C>T (GENE2)"
    assert lab[0].subject.startswith("_:b")
    # every distinct variant typed as sequence alteration
    assert graph.filter(
        (F.col("predicate") == "rdf:type") & (F.col("object") == "SO:0001059")
    ).count() == 3
