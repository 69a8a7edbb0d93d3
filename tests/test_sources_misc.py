"""Panther (id rewrites, taxon OR-filter), GWAS (variant classification),
MPD (zscore threshold + window recompute)."""

import gzip

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline

PANTHER = "\n".join(
    [
        # MGI=MGI= shape needing collapse; LDO → 1:1 orthology
        "\t".join(["HUMAN|Ensembl=ENSG00000184730|UniProtKB=Q0VD83",
                   "MOUSE|MGI=MGI=2176230|UniProtKB=Q8VBT6", "LDO", "Euarchontoglires", "PTHR12434"]),
        # paralog pair
        "\t".join(["HUMAN|GeneID=1234|UniProtKB=P1", "HUMAN|GeneID=5678|UniProtKB=P2",
                   "P", "Hominidae", "PTHR99999"]),
        # both taxa outside filter list → dropped
        "\t".join(["YEAST|Gene=YAL001C|UniProtKB=P3", "SCHPO|Gene=SPAC1.01|UniProtKB=P4",
                   "O", "Fungi", "PTHR11111"]),
        # unknown ortholog type → dropped
        "\t".join(["HUMAN|GeneID=1|UniProtKB=P5", "MOUSE|GeneID=2|UniProtKB=P6",
                   "ZZZ", "x", "PTHR22222"]),
        "",
    ]
)

GWAS_HEADER = "\t".join(get_pipeline("gwascatalog").files["catalog"].columns)


def _gwas_row(snps, trait_uri, pval="1e-8", pmid="123"):
    row = [""] * len(get_pipeline("gwascatalog").files["catalog"].columns)
    cols = get_pipeline("gwascatalog").files["catalog"].columns
    row[cols.index("STRONGEST SNP-RISK ALLELE")] = snps
    row[cols.index("SNPS")] = snps
    row[cols.index("MAPPED_TRAIT_URI")] = trait_uri
    row[cols.index("P-VALUE")] = pval
    row[cols.index("PUBMEDID")] = pmid
    return "\t".join(row)


GWAS = "\n".join(
    [
        GWAS_HEADER,
        _gwas_row("rs2440154", "http://www.ebi.ac.uk/efo/EFO_0004340"),
        _gwas_row("rs1; rs2", "http://www.ebi.ac.uk/efo/EFO_0001"),           # haplotype
        _gwas_row("chr10:106180121-G", "http://www.ebi.ac.uk/efo/EFO_0002"),  # bnode snp
        _gwas_row("kgp123-A", "http://www.ebi.ac.uk/efo/EFO_0003"),
        _gwas_row("rs1 x rs9", "http://www.ebi.ac.uk/efo/EFO_0004"),          # unparseable
        _gwas_row("rs7777", "http://a/EFO_1, http://b/EFO_2"),                # multi-trait
        "",
    ]
)

MPD = "\n".join(
    [
        ",".join(["measnum", "varname", "strain", "strainid", "sex", "mean", "nmice",
                  "sd", "sem", "cv", "minval", "maxval", "zscore"]),
        "101,bw,C57BL/6J,7,m,25.1,10,1.0,0.3,0.04,22,28,2.5",
        "101,bw,DBA/2J,8,m,20.0,10,1.1,0.3,0.05,18,23,-0.5",   # below threshold
        "101,bw,CAST/EiJ,9,m,15.0,10,0.9,0.3,0.06,13,17,-2.2",
        "",
    ]
)


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


class TestPanther:
    @pytest.fixture(scope="class")
    def graph(self, spark, tmp_path_factory):
        raw = tmp_path_factory.mktemp("panther_raw")
        (raw / "RefGenomeOrthologs.tsv").write_text(PANTHER)
        return get_pipeline("panther").transform(spark, str(raw)).cache()

    def test_mgi_collapse_and_ldo(self, graph):
        spo = _spo(graph)
        assert any(
            p == "OBAN:association_has_object" and o == "MGI:2176230" for _, p, o in spo
        )
        assert any(p == "OBAN:association_has_predicate" and o == "RO:HOM0000020" for _, p, o in spo)
        assert ("ENSEMBL:ENSG00000184730", "RO:0002162", "NCBITaxon:9606") in spo

    def test_paralogy_and_family(self, graph):
        spo = _spo(graph)
        assert any(p == "OBAN:association_has_predicate" and o == "RO:HOM0000011" for _, p, o in spo)
        assert ("NCBIGene:1234", "RO:0002350", "PANTHER:PTHR99999") in spo

    def test_taxon_and_type_filters(self, graph):
        spo = _spo(graph)
        assert not any("YAL001C" in s or "YAL001C" in o for s, _, o in spo)
        assert not any(o == "PANTHER:PTHR22222" for _, _, o in spo)


class TestGwas:
    @pytest.fixture(scope="class")
    def graph(self, spark, tmp_path_factory):
        raw = tmp_path_factory.mktemp("gwas_raw")
        (raw / "gwas-catalog-associations_ontology-annotated.tsv").write_text(GWAS)
        return get_pipeline("gwascatalog").transform(spark, str(raw)).cache()

    def test_classification(self, graph):
        spo = _spo(graph)
        assert ("dbSNP:rs2440154", "rdf:type", "SO:0000694") in spo
        # haplotype individual typed SO haplotype (GWASCatalog.py:315-316)
        assert any(s.startswith(":haplotype_") and o == "SO:0001024" for s, _, o in spo)
        assert any(s.startswith("_:b") and o == "SO:0000694" for s, _, o in spo)
        assert ("GWAS:kgp123", "rdf:type", "SO:0000694") in spo
        # 'rs1 x rs9' unparseable → absent
        assert not any("rs9" in s or "rs9" in o for s, _, o in spo)
        # unlocated snps are typed region SO:0000001 (GenomicFeature.py:210-212)
        assert ("dbSNP:rs2440154", "rdf:type", "SO:0000001") in spo
        assert ("dbSNP:rs2440154", "MONARCH:cliqueLeader", "true") in spo
        # haplotype membership edges
        assert any(
            s.startswith(":haplotype_") and p == "GENO:0000382" and o == "dbSNP:rs1"
            for s, p, o in spo
        )

    def test_trait_explode_and_description(self, graph):
        spo = _spo(graph)
        # contributes-to-condition direct edges per exploded trait uri
        objs = {o for s, p, o in spo if s == "dbSNP:rs7777" and p == "RO:0003304"}
        assert objs == {"http://a/EFO_1", "http://b/EFO_2"}
        # the p-value lands in the study description (reference has no
        # p-value triple; _make_description 563-576)
        assert any(p == "dc:description" and "(p=1e-8)" in o for _, p, o in spo)
        # evidence + journal-article typing on the association
        assert any(p == "RO:0002558" and o == "ECO:0000213" for _, p, o in spo)
        assert ("PMID:123", "rdf:type", "IAO:0000013") in spo


class TestMpd:
    def test_threshold_and_scores(self, spark, tmp_path_factory):
        raw = tmp_path_factory.mktemp("mpd_raw")
        (raw / "strainmeans.csv.gz").write_bytes(gzip.compress(MPD.encode()))
        p = get_pipeline("mpd")
        g = p.transform(spark, str(raw)).cache()
        spo = _spo(g)
        subs = {o for _, pred, o in spo if pred == "OBAN:association_has_subject"}
        assert subs == {"MPD-strain:7", "MPD-strain:9"}  # |z| >= 2 only
        assert any(pred == "SIO:000300" and o == "2.5" for _, pred, o in spo)
        # window recompute audit matches sign of published z
        z = {r.strainid: r for r in p.recomputed_zscores(spark, str(raw)).collect()}
        assert z["7"].z_recomputed > 0 and z["9"].z_recomputed < 0
