"""AnimalQTLdb: GFF attribute bag, QTL→trait assoc w/ p-value score,
PMID/ISU pub dispatch, FALDO placement (reference AnimalQTLdb.py:633-784)."""

import gzip

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline

GFF = "\n".join(
    [
        "#gff-version 2.3",
        "\t".join([
            "Chr.Z", "Animal QTLdb", "Production_QTL", "33954873", "34023581", ".", ".", ".",
            'QTL_ID=2242;Name="Spleen percentage";Abbrev="SPLP";PUBMED_ID=17012160;trait_ID=2234;'
            'trait="Spleen percentage";breed="leghorn";"FlankMarkers=ADL0022";Map_Type="Linkage";'
            'Significance="Significant";P-value="<0.05";F-Stat="5.52"',
        ]),
        # ISU pub + comma-decimal p-value + missing stop
        "\t".join([
            "Chr.1", "Animal QTLdb", "Meat_QTL", "100", "", ".", "+", ".",
            'QTL_ID=4;Name="Marbling";PUBMED_ID=ISU0001;trait_ID=9;P-value="0,01"',
        ]),
        # no QTL_ID → dropped
        "\t".join(["Chr.2", "x", "y", "1", "2", ".", ".", ".", 'Name="junk"']),
        "",
    ]
)


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("aqtl_raw")
    src = get_pipeline("animalqtldb")
    with gzip.open(raw / src.files["chicken_gff"].file, "wt", encoding="ISO-8859-1") as fh:
        fh.write(GFF)
    return src.transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_qtl_individual_and_taxon(graph):
    t = _spo(graph.filter(F.col("subject") == "chickenQTL:2242"))
    assert ("chickenQTL:2242", "rdf:type", "SO:0000771") in t
    assert ("chickenQTL:2242", "RO:0002162", "NCBITaxon:9031") in t


def test_assoc_with_score_and_evidence(graph):
    t = _spo(graph.filter(F.col("predicate") == "RO:0002607"))
    assert ("chickenQTL:2242", "RO:0002607", "AQTLTrait:2234") in t
    assert ("chickenQTL:4", "RO:0002607", "AQTLTrait:9") in t
    # '<0.05' → 0.05; '0,01' → 0.01 (both as xsd:float literals)
    scores = {r.object for r in graph.filter(F.col("predicate") == "SIO:000300").collect()}
    assert scores == {"0.05", "0.01"}
    assert graph.filter(
        (F.col("predicate") == "RO:0002558") & (F.col("object") == "ECO:0000061")
    ).count() == 2


def test_pub_dispatch(graph):
    t = _spo(graph.filter(F.col("predicate") == "dc:source"))
    objs = {o for _, _, o in t}
    assert objs == {"PMID:17012160", "AQTLPub:ISU0001"}
    # only the PMID gets journal-article typing
    assert graph.filter(
        (F.col("subject") == "PMID:17012160") & (F.col("object") == "IAO:0000013")
    ).count() == 1
    assert graph.filter(
        (F.col("subject") == "AQTLPub:ISU0001") & (F.col("predicate") == "rdf:type")
    ).count() == 0


def test_faldo_placement_on_build_chrom(graph):
    # qtl located on the assembly chromosome, positions reference it
    loc = graph.filter(
        (F.col("subject") == "chickenQTL:2242") & (F.col("predicate") == "faldo:location")
    ).collect()
    assert len(loc) == 1
    refs = {
        r.object
        for r in graph.filter(F.col("predicate") == "faldo:reference").collect()
    }
    assert ":GG_4.0chrZ" in refs


def test_rows_without_qtlid_dropped(graph):
    assert graph.filter(F.col("subject").contains("junk")).count() == 0
