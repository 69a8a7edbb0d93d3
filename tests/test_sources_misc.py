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
        # assay with no ontology mapping → no association
        "102,tail,C57BL/6J,7,f,8.3,10,0.4,0.1,0.05,7,9,3.1",
        "",
    ]
)

MPD_STRAININFO = "\n".join(
    [
        ",".join(["strainname", "vendor", "stocknum", "panel", "mpd_strainid",
                  "straintype", "n_proj", "n_snp_datasets", "mpd_shortname", "url"]),
        "C57BL/6J,J,000664,IN,7,inbred,225,17,B6,http://jaxmice.jax.org/strain/000664.html",
        "DBA/2J,J,000671,,8,inbred,200,15,D2,",
        "CAST/EiJ,Rbrc,RBRC00209,,9,inbred,100,5,CAST,",
        "NOD/ShiLtJ,Tac,NODTAC,IN,10,inbred,50,2,NOD,http://taconic.example/nod",
        "",
    ]
)

MPD_MEASUREMENTS = "\n".join(
    [
        ",".join(["measnum", "mpdsector", "projsym", "varname", "descrip", "units",
                  "method", "intervention", "paneldesc", "datatype", "sextested",
                  "nstrainstested", "ageweeks"]),
        "101,physiology,Jax1,bw,body weight,g,scale,,panel1,mean,m,30,8wks",
        "102,physiology,Jax1,tail,tail length,mm,ruler,,panel1,mean,f,30,8wks",
        "",
    ]
)

MPD_ONT = "\n".join(
    [
        ",".join(["measnum", "ont_term", "descrip"]),
        "101,MP:0001259,abnormal body weight",
        "101,VT:0001259,body weight trait",
        "101,XP:999,ignored non-MP/VT term",
        "",
    ]
)


def write_mpd_fixture(raw):
    raw = __import__("pathlib").Path(raw)
    (raw / "strainmeans.csv.gz").write_bytes(gzip.compress(MPD.encode()))
    (raw / "straininfo.csv").write_text(MPD_STRAININFO)
    (raw / "measurements.csv").write_text(MPD_MEASUREMENTS)
    (raw / "ontology_mappings.csv").write_text(MPD_ONT)


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
        # Family.addMember direction: family --has member--> gene
        assert ("PANTHER:PTHR99999", "RO:0002351", "NCBIGene:1234") in spo

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
    @pytest.fixture(scope="class")
    def graph(self, spark, tmp_path_factory):
        raw = tmp_path_factory.mktemp("mpd_raw")
        write_mpd_fixture(raw)
        return get_pipeline("mpd").transform(spark, str(raw)).cache()

    def test_threshold_gates_associations(self, spark, graph, tmp_path_factory):
        import hashlib

        spo = _spo(graph)

        def bnode(s):
            return "_:b" + hashlib.sha1(s.encode()).hexdigest()[1:20]

        # association subjects are the SEX-SPECIFIC genotype bnodes of the
        # |z| >= 2 strains only (7 and 9, both sex m); strain 8 is below
        # threshold and assay 102 (strain 7, f) has no MP/VT mapping
        subs = {o for _, pred, o in spo if pred == "OBAN:association_has_subject"}
        assert subs == {
            bnode("MPD-strain7-m-genotype"), bnode("MPD-strain9-m-genotype")
        }
        raw2 = tmp_path_factory.mktemp("mpd_raw2")
        write_mpd_fixture(raw2)
        p = get_pipeline("mpd")
        z = {
            r.strainid: r
            for r in p.recomputed_zscores(spark, str(raw2)).collect()
            if r.measnum == "101"
        }
        assert z["7"].z_recomputed > 0 and z["9"].z_recomputed < 0

    def test_strain_individuals(self, graph):
        spo = _spo(graph)
        assert ("MPD-strain:7", "rdf:type", "NCBITaxon:10090") in spo
        assert ("MPD-strain:7", "rdfs:label", "C57BL/6J") in spo
        assert ("MPD-strain:7", "OIO:hasExactSynonym", "B6") in spo
        # vendor J / Rbrc → sameAs stock curies; other vendors → literal xrefs
        assert ("MPD-strain:7", "owl:sameAs", "JAX:000664") in spo
        assert ("MPD-strain:9", "owl:sameAs", "RBRC:RBRC00209") in spo
        assert ("MPD-strain:10", "OIO:hasDbXref", "Tac:NODTAC") in spo
        assert ("MPD-strain:10", "OIO:hasDbXref", "http://taconic.example/nod") in spo
        assert ("MPD-strain:7", "dc:description", "IN [panel]") in spo
        assert ("NCBITaxon:10090", "rdf:type", "owl:Class") in spo

    def test_genotype_scaffold_and_assay_node(self, graph):
        import hashlib

        spo = _spo(graph)
        geno = "_:b" + hashlib.sha1(b"MPD-strain7-genotype").hexdigest()[1:20]
        sexg = "_:b" + hashlib.sha1(b"MPD-strain7-m-genotype").hexdigest()[1:20]
        assert (geno, "rdf:type", "GENO:0000611") in spo
        assert (geno, "rdfs:label", "[C57BL/6J]") in spo
        assert ("MPD-strain:7", "GENO:0000222", geno) in spo
        assert (sexg, "rdf:type", "GENO:0000646") in spo  # male intrinsic
        assert (sexg, "rdfs:label", "C57BL/6J (m)") in spo
        assert (sexg, "GENO:0000650", geno) in spo
        assert ("MPD-assay:101", "rdf:type", "OBI:0000070") in spo
        assert ("MPD-assay:101", "rdfs:label", "body weight (101)") in spo
        desc = [
            o for s, p, o in spo
            if s == "MPD-assay:101" and p == "dc:description"
        ]
        assert desc == [
            "This is an assay of [body weight] shown as a [mean] measured in"
            " [g].  The overall experiment is entitled [Jax1].  It was"
            " conducted in [male] mice at [8wks] of age in [30] different"
            " mouse strains. "
        ]

    def test_g2p_association_trace(self, graph):
        import hashlib

        spo = _spo(graph)
        sexg = "_:b" + hashlib.sha1(b"MPD-strain7-m-genotype").hexdigest()[1:20]
        # reference G2PAssoc digest: 'mpd+<sexgeno>+RO:0002200+<MP term>'
        aid = "MONARCH:b" + hashlib.sha1(
            f"mpd+{sexg}+RO:0002200+MP:0001259".encode()
        ).hexdigest()[1:20]
        assert (sexg, "RO:0002200", "MP:0001259") in spo
        assert (aid, "rdf:type", "OBAN:association") in spo
        assert (aid, "OBAN:association_has_object", "MP:0001259") in spo
        # evidence: the assay individual AND experimental phenotypic ECO
        ev = {o for s, p, o in spo if s == aid and p == "RO:0002558"}
        assert ev == {"MPD-assay:101", "ECO:0000059"}
        assert (aid, "rdfs:comment", "body weight (zscore=2.5)") in spo
        assert (aid, ":has_sex_specificity", "PATO:0000384") in spo
        # VT mapping mints its own association
        assert (sexg, "RO:0002200", "VT:0001259") in spo
        # the XP term was filtered by the MP|VT regex
        assert not any("XP:999" in o for _, _, o in spo)
