"""M3 join-heavy source pipelines: GAF (uniprot 1:1 join, IMP→G2P), STRING
(threshold + symmetric + 1:N expansion), Bgee (top-k window)."""

import gzip

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline


def _gaf_row(db, obj_id, qual, go, refs, eco, withfrom, aspect, name, syn, taxon):
    return "\t".join(
        [db, obj_id, "SYM_" + obj_id, qual, go, refs, eco, withfrom, aspect,
         name, syn, "protein", taxon, "20240101", "UniProt", "", ""]
    )


GAF_FIXTURE = "\n".join(
    [
        "!gaf-version: 2.1",
        # UniProt row with 1:1 mapping → re-keyed to NCBIGene:10
        _gaf_row("UniProtKB", "Q00001", "", "GO:0003674", "PMID:111|GO_REF:22", "IDA",
                 "", "F", "protein one", "syn-a|UniProtKB:P999", "taxon:9606"),
        # UniProt row WITHOUT mapping → dropped
        _gaf_row("UniProtKB", "Q99999", "", "GO:0005575", "PMID:222", "IEA",
                 "", "C", "", "", "taxon:9606"),
        # MGI row with MGI:MGI: shape, NOT qualifier → dropped
        _gaf_row("MGI", "MGI:88059", "NOT", "GO:0042221", "MGI:MGI:123", "IMP",
                 "", "P", "", "", "taxon:10090"),
        # MGI row, P-aspect, IMP + with_from → derives G2P on ZFIN-ish reagent
        _gaf_row("MGI", "MGI:88059", "", "GO:0008150", "MGI:MGI:5285", "IMP",
                 "ZFIN:ZDB-MRPHLNO-1", "P", "", "", "taxon:10090"),
        # contributes_to F-aspect
        _gaf_row("WB", "WBGene1", "contributes_to", "GO:0016301", "PMID:333", "TAS",
                 "", "F", "", "", "taxon:6239"),
        "",
    ]
)

IDMAP_FIXTURE = "\n".join(
    [
        "Q00001\tNCBIGene:10",
        "Q77777\tNCBIGene:70",   # 1:2 mapping → excluded by the 1:1 filter
        "Q77777\tNCBIGene:71",
        "",
    ]
)

STRING_LINKS = "\n".join(
    [
        " ".join(LINKS_HDR := [
            "protein1", "protein2", "neighborhood", "fusion", "cooccurence",
            "coexpression", "experimental", "database", "textmining", "combined_score"]),
        "9606.ENSP01 9606.ENSP02 0 0 0 0 0 0 0 900",   # kept
        "9606.ENSP02 9606.ENSP01 0 0 0 0 0 0 0 900",   # symmetric dup → canonicalized
        "9606.ENSP01 9606.ENSP03 0 0 0 0 0 0 0 500",   # below threshold
        "9606.ENSP01 9606.ENSP04 0 0 0 0 0 0 0 800",   # ENSP04 unmapped → dropped
        "",
    ]
)

STRING_IDMAP = "\n".join(
    [
        "## NCBI taxid / entrez / STRING ##",
        "9606\t100\t9606.ENSP01",
        "9606\t200|201\t9606.ENSP02",  # 1:N expansion
        "9606\t300\t9606.ENSP03",
        "",
    ]
)

BGEE_FIXTURE = "\n".join(
    ["\t".join(["Ensembl gene ID", "gene name", "anatomical entity ID",
                "anatomical entity name", "rank score", "XRefs to BTO"])]
    + ["\t".join([f"ENSG1", "g1", f"UBERON:{i:07d}", f"anat{i}", str(100.0 - i), ""])
       for i in range(30)]
    + ["\t".join(["ENSG2", "g2", "UBERON:0000001", "anat", "1,234.5", ""])]
    + [""]
)


@pytest.fixture(scope="module")
def go_graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("go_raw")
    (raw / "human.gaf.gz").write_bytes(gzip.compress(GAF_FIXTURE.encode()))
    (raw / "idmapping.tsv.gz").write_bytes(gzip.compress(IDMAP_FIXTURE.encode()))
    return get_pipeline("go").transform(spark, str(raw)).cache()


@pytest.fixture(scope="module")
def string_graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("string_raw")
    (raw / "protein.links.detailed.txt.gz").write_bytes(gzip.compress(STRING_LINKS.encode()))
    (raw / "entrez_2_string.tsv.gz").write_bytes(gzip.compress(STRING_IDMAP.encode()))
    return get_pipeline("stringdb").transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


class TestGaf:
    def test_uniprot_rekey_and_miss_drop(self, go_graph):
        spo = _spo(go_graph)
        assert ("NCBIGene:10", "rdf:type", "SO:0000704") in spo
        # unmapped uniprot row dropped entirely
        assert not any("Q99999" in s or "Q99999" in o for s, _, o in spo)

    def test_not_qualifier_dropped(self, go_graph):
        assert not any(o == "GO:0042221" for _, _, o in _spo(go_graph))

    def test_aspect_and_contributes_to(self, go_graph):
        spo = _spo(go_graph)
        assert ("NCBIGene:10", "RO:0002327", "GO:0003674") in spo  # F → enables
        assert ("WormBase:WBGene1", "RO:0002326", "GO:0016301") in spo  # contributes_to

    def test_mgi_ref_fixup(self, go_graph):
        # MGI:MGI:5285 → MGI:5285 as assoc source
        assert any(p == "dc:source" and o == "MGI:5285" for _, p, o in _spo(go_graph))

    def test_imp_g2p_derivation(self, go_graph):
        spo = _spo(go_graph)
        # reagent-targeted-gene bnode asserts GO:0008150PHENOTYPE
        tg = [s for s, p, o in spo if p == "OBAN:association_has_object" and o == "GO:0008150PHENOTYPE"]
        assert tg, "no derived G2P association"
        assert any(
            p == "GENO:0000418" and o == "MGI:88059" and s.startswith("_")
            for s, p, o in spo
        )

    def test_uniprot_mapping_description(self, go_graph):
        assert any(
            p == "dc:description" and o == "Mapped from UniProtKB:Q00001"
            for _, p, o in _spo(go_graph)
        )

    def test_targeted_gene_bnode_digest_golden(self, go_graph):
        """Reference golden: the reagent-targeted-gene bnode is
        ZFIN.make_targeted_gene_id (ZFIN.py:3085-3091) —
        sha1 of 'gene-reagent' with every 'ZFIN:'/':' stripped.  Re-derived
        here with hashlib, independent of the code under test."""
        import hashlib

        expected = "_:b" + hashlib.sha1(b"MGI88059-ZDB-MRPHLNO-1").hexdigest()[1:20]
        spo = _spo(go_graph)
        assert (expected, "GENO:0000418", "MGI:88059") in spo
        # and the derived G2P association hangs off the same bnode
        assert any(
            p == "OBAN:association_has_subject" and o == expected for _, p, o in spo
        )


class TestStringDb:
    def test_threshold_symmetric_and_expansion(self, string_graph):
        edges = {
            (s, o) for s, p, o in _spo(string_graph) if p == "RO:0002434"
        }
        # ENSP02 (genes 200, 201) is lexicographically larger → gene1 side
        assert edges == {
            ("NCBIGene:200", "NCBIGene:100"),
            ("NCBIGene:201", "NCBIGene:100"),
        }

    def test_gene_typing(self, string_graph):
        spo = _spo(string_graph)
        assert ("NCBIGene:100", "rdf:type", "SO:0000704") in spo

    def test_miss_count(self, spark, tmp_path_factory):
        raw = tmp_path_factory.mktemp("string_raw2")
        (raw / "protein.links.detailed.txt.gz").write_bytes(gzip.compress(STRING_LINKS.encode()))
        (raw / "entrez_2_string.tsv.gz").write_bytes(gzip.compress(STRING_IDMAP.encode()))
        assert get_pipeline("stringdb").miss_count(spark, str(raw)) == 1


class TestBgee:
    def test_topk_and_rank_scrub(self, spark, tmp_path_factory):
        raw = tmp_path_factory.mktemp("bgee_raw")
        (raw / "human_anat_entity_all_data.tsv.gz").write_bytes(gzip.compress(BGEE_FIXTURE.encode()))
        g = get_pipeline("bgee").transform(spark, str(raw)).cache()
        # top-20 of 30 rows for ENSG1: 20 direct expressed-in edges
        direct = g.filter((F.col("predicate") == "RO:0002206") & (F.col("subject") == "ENSEMBL:ENSG1"))
        assert direct.count() == 20
        # worst-ranked 10 anatomies absent
        objs = {r.object for r in direct.collect()}
        assert "UBERON:0000029" not in objs and "UBERON:0000000" in objs
        # thousands separator scrubbed → 1234.5 rank literal on ENSG2 assoc
        spo = _spo(g)
        assert any(p == ":has_quantifier" and o == "1234.5" for _, p, o in spo)


class TestStringGolden:
    """reference StringTestFakeData (/root/reference/tests/test_string.py)
    with the live biomart fetch replaced by a staged ENSP→ENSG export (the
    same two CFTR/ARF5 mappings the real biomart returns for the fixture
    proteins)."""

    LINKS_HDR = (
        "protein1 protein2 neighborhood fusion cooccurence coexpression "
        "experimental database textmining combined_score"
    )
    P2G = "ENSP00000000233\tENSG00000004059\nENSP00000003084\tENSG00000001626\n"

    def _run(self, spark, tmp_path, row):
        import gzip as _gzip

        (tmp_path / "protein.links.detailed.txt.gz").write_bytes(
            _gzip.compress((self.LINKS_HDR + "\n" + row + "\n").encode())
        )
        (tmp_path / "ensembl_protein_gene.tsv").write_text(self.P2G)
        return get_pipeline("stringdb").transform(spark, str(tmp_path))

    def test_golden_fake_data_set_1(self, spark, tmp_path):
        got = self._run(
            spark, tmp_path,
            "9606.ENSP00000000233 9606.ENSP00000003084 0 0 0 0 300 0 150 800",
        )
        spo = {(r.subject, r.predicate, r.object) for r in got.collect()}
        # orientation: gene of the lexicographically larger protein is the
        # subject (StringDB.py:200-208)
        assert spo == {
            ("ENSEMBL:ENSG00000001626", "RO:0002434", "ENSEMBL:ENSG00000004059"),
            ("ENSEMBL:ENSG00000001626", "rdf:type", "SO:0000704"),
            ("ENSEMBL:ENSG00000004059", "rdf:type", "SO:0000704"),
        }

    def test_golden_fake_data_set_2_deprecated_protein(self, spark, tmp_path):
        """A deprecated protein id absent from the map → empty graph
        (reference testFakeDataSet2), visible in the miss metric."""
        got = self._run(
            spark, tmp_path,
            "9606.ENSP00000000233 9606.ENSP00000006101 0 0 0 0 300 0 150 800",
        )
        assert got.count() == 0
        assert get_pipeline("stringdb").miss_count(spark, str(tmp_path)) == 1
