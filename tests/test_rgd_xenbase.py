"""RGD (rat gene→MP GAF) and Xenbase (OBAN g2p + genepage literature)
pipelines (reference RGD.py:86-145, Xenbase.py:106-246)."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline

RGD_GAF = (
    "!gaf-version: 2.1\n"
    "RGD\t61958\tAsl\t\tMP:0003501\tRGD:1600115|PMID:12345\tIAGP\t\tN\targininosuccinate lyase\t\tgene\ttaxon:10116\t2010-07-22\tRGD\t\t\n"
    "RGD\t70891\tAbc1\tNOT\tMP:0000001\tRGD:999\tIEA\t\tN\t\t\tgene\ttaxon:10116\t2010-07-22\tRGD\t\t\n"
)

XB_G2P = (
    "SUBJECT\tSUBJECT_LABEL\tSUBJECT_TAXON\tSUBJECT_TAXON_LABEL\tOBJECT\tOBJECT_LABEL\t"
    "RELATION\tRELATION_LABEL\tEVIDENCE\tEVIDENCE_LABEL\tSOURCE\tIS_DEFINED_BY\tQUALIFIER\n"
    "Xenbase:XB-GENE-1000632\tptpn11\tNCBITaxon:8364\tXenopus tropicalis\tXPO:0102358\tabnormal eye\t"
    "RO_0002200\thas phenotype\tECO:0000305\tcurator inference\tPMID:33333\txenbase\t\n"
)

XB_PAGES = (
    "XB-GENEPAGE-1000631\tptpn11\tXB-GENE-1000632\tptpn11-tropicalis\t"
    "XB-GENE-6253888\tptpn11.L\tXB-GENE-17332089\tptpn11.S\n"
)

XB_LIT = "XB-ART-1\t55555\tXB-GENEPAGE-1000631 ptpn11\n"


@pytest.fixture(scope="module")
def rgd_graph(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("rgd_raw")
    (d / "rattus_genes_mp").write_text(RGD_GAF)
    return get_pipeline("rgd").transform(spark, str(d)).cache()


@pytest.fixture(scope="module")
def xb_graph(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("xb_raw")
    (d / "xb_xpo_spo_v_v1.tab").write_text(XB_G2P)
    (d / "XenbaseGenepageToGeneIdMapping.txt").write_text(XB_PAGES)
    (d / "LiteratureMatchedGenesByPaper.txt").write_text(XB_LIT)
    return get_pipeline("xenbase").transform(spark, str(d)).cache()


def _spo(graph):
    return {(r.subject, r.predicate, r.object) for r in graph.collect()}


class TestRgd:
    def test_assoc_with_refs(self, rgd_graph):
        spo = _spo(rgd_graph)
        assert ("RGD:61958", "RO:0002200", "MP:0003501") in spo
        # RGD ref routed through RGDRef; PMID kept; first ref is the source
        assert any(p == "dc:source" and o == "RGDRef:1600115" for s, p, o in spo)
        assert ("RGDRef:1600115", "rdf:type", "IAO:0000311") in spo
        # later refs collapse onto the first
        assert ("RGDRef:1600115", "owl:sameAs", "PMID:12345") in spo
        # IAGP -> ECO:0005613 via the rgd localtt
        assert any(p == "RO:0002558" and o == "ECO:0005613" for s, p, o in spo)
        # date lands on the association as pav:createdOn (Association.py:145-150)
        assert any(p == "pav:createdOn" and o == "2010-07-22" for s, p, o in spo)

    def test_not_rows_dropped(self, rgd_graph):
        assert not any(o == "MP:0000001" for s, p, o in _spo(rgd_graph))


class TestXenbase:
    def test_g2p(self, xb_graph):
        spo = _spo(xb_graph)
        assert ("Xenbase:XB-GENE-1000632", "rdfs:label", "ptpn11") in spo
        assert ("Xenbase:XB-GENE-1000632", "rdfs:subClassOf", "SO:0000704") in spo
        assert ("Xenbase:XB-GENE-1000632", "RO:0002162", "NCBITaxon:8364") in spo
        # RO_0002200 underscore fixed to a curie
        assert ("Xenbase:XB-GENE-1000632", "RO:0002200", "XPO:0102358") in spo
        assert ("PMID:33333", "rdf:type", "IAO:0000013") in spo
        assert any(p == "RO:0002558" and o == "ECO:0000305" for s, p, o in spo)

    def test_genepage_fanout_and_mentions(self, xb_graph):
        spo = _spo(xb_graph)
        # all three per-page genes become classes
        for gid, lbl in [
            ("Xenbase:XB-GENE-1000632", "ptpn11-tropicalis"),
            ("Xenbase:XB-GENE-6253888", "ptpn11.L"),
            ("Xenbase:XB-GENE-17332089", "ptpn11.S"),
        ]:
            assert (gid, "rdfs:label", lbl) in spo
        # paper mentions every gene of the page
        for gid in ("Xenbase:XB-GENE-1000632", "Xenbase:XB-GENE-6253888",
                    "Xenbase:XB-GENE-17332089"):
            assert ("PMID:55555", "IAO:0000142", gid) in spo


def test_graphs_serialize_strict(rgd_graph, xb_graph):
    from conftest import assert_strict_nt

    assert_strict_nt(rgd_graph)
    assert_strict_nt(xb_graph)
