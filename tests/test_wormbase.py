"""WormBase: gene inventory, allele/RNAi phenotype GAF unswap dispatch, GFF3
feature placement, disease models (reference WormBase.py:316-901)."""

import gzip

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline

GENE_IDS = (
    "6239,WBGene00000001,aap-1,Y110A7A.10,Live,protein_coding_gene\n"
    "6239,WBGene00000002,,T01B11.3,Dead,protein_coding_gene\n"
)

# GAF2.0: ref/with columns swapped per the spec workaround: the variant sits
# in DB:Reference, the paper stays put, persons land in With
ALLELE_PHENO = (
    "!gaf-version: 2.0\n"
    "WB\tWBGene00000001\taap-1\t\tWBPhenotype:0000643\tWB_REF:WBPaper00005654\tIMP\tWB:WBVar00000001\tP\t\t\tgene\ttaxon:6239\t20140101\tWB\t\t\n"
    "WB\tWBGene00000001\taap-1\t\tWBPhenotype:0000402\tWB:WBVar00000002\tIMP\tWB:WBPerson557\tP\t\t\tgene\ttaxon:6239\t20140101\tWB\t\t\n"
    "WB\tWBGene00000001\taap-1\tNOT\tWBPhenotype:0000999\tWB_REF:WBPaper00000001\tIMP\tWB:WBVar00000003\tP\t\t\tgene\ttaxon:6239\t20140101\tWB\t\t\n"
    "WB\tWBGene00000001\taap-1\t\tWBPhenotype:0000111\tWB:WBRNAi00000777\tIMP\t\tP\t\t\tgene\ttaxon:6239\t20140101\tWB\t\t\n"
)

RNAI_PHENO = (
    "WBGene00000001\tY110A7A.10\tlocomotion variant\tWBPhenotype:0000643\t"
    "WBRNAi00025129|WBPaper00006395 WBRNAi00025631|WBPaper00006395\n"
)

GFF = (
    "##gff-version 3\n"
    "I\tWormBase\tgene\t3747\t3909\t.\t-\t.\tID=Gene:WBGene00000001;Name=WBGene00000001;biotype=snoRNA;Alias=Y74C9A.6\n"
    "I\tinterpolated_pmap_position\tgene\t1\t559768\t.\t.\t.\tID=gmap:spe-13;gmap=spe-13;status=uncloned\n"
    "I\tWormBase\tpoint_mutation\t111\t111\t.\t+\t.\tvariation=WBVar00604246;public_name=gk320600;strain=VC20384;substitution=C/T\n"
    "I\tWormBase\tpoint_mutation\t222\t222\t.\t+\t.\tvariation=WBVar00604247;public_name=gk1;polymorphism=1\n"
)

DISEASE = (
    "!gaf-version: 2.0\n"
    "WB\tWBGene00000001\taap-1\t\tDOID:2583\tPMID:19029536\tIEA\tOMIM:615214\tD\t\t\tgene\ttaxon:6239\t20150612\tWB\t\t\n"
)

CHECKSUMS = "20f7d39c73012c9cfc8444a657af2b80  acedb/md5sum.WS255\n"


@pytest.fixture(scope="module")
def raw_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("wb_raw")
    with gzip.open(d / "c_elegans.PRJNA13758.geneIDs.txt.gz", "wt") as fh:
        fh.write(GENE_IDS)
    (d / "phenotype_association.wb").write_text(ALLELE_PHENO)
    (d / "rnai_phenotypes.wb").write_text(RNAI_PHENO)
    with gzip.open(d / "c_elegans.PRJNA13758.annotations.gff3.gz", "wt") as fh:
        fh.write(GFF)
    (d / "disease_association.wb").write_text(DISEASE)
    (d / "CHECKSUMS").write_text(CHECKSUMS)
    return str(d)


@pytest.fixture(scope="module")
def graph(spark, raw_dir):
    return get_pipeline("wormbase").transform(spark, raw_dir).cache()


def _spo(graph):
    return {(r.subject, r.predicate, r.object) for r in graph.collect()}


class TestGenes:
    def test_gene_classes_and_deprecation(self, graph):
        spo = _spo(graph)
        assert ("WormBase:WBGene00000001", "rdfs:label", "aap-1") in spo
        assert ("WormBase:WBGene00000001", "rdfs:subClassOf", "SO:0000704") in spo
        assert ("WormBase:WBGene00000001", "RO:0002162", "NCBITaxon:6239") in spo
        assert ("WormBase:WBGene00000001", "OIO:hasExactSynonym", "Y110A7A.10") in spo
        # symbol falls back to synonym; Dead -> owl:deprecated
        assert ("WormBase:WBGene00000002", "rdfs:label", "T01B11.3") in spo
        assert ("WormBase:WBGene00000002", "owl:deprecated", "true") in spo


class TestAllelePheno:
    def test_unswap_and_var_dispatch(self, graph):
        spo = _spo(graph)
        # row 1: variant was in the ref column -> unswapped; paper ref LOST
        # (reference sets ref=None when no person in With)
        assert ("WormBase:WBVar00000001", "GENO:0000408", "WormBase:WBGene00000001") in spo
        assert ("WormBase:WBVar00000001", "rdf:type", "SO:0001059") in spo
        assert ("WormBase:WBVar00000001", "RO:0002200", "WBPhenotype:0000643") in spo
        # row 2: person in With -> becomes the source ref, typed foaf:Person
        assert ("WormBase:WBVar00000002", "RO:0002200", "WBPhenotype:0000402") in spo
        assert ("WormBase:WBPerson557", "rdf:type", "foaf:Person") in spo
        # NOT row dropped
        assert not any(o == "WBPhenotype:0000999" for s, p, o in spo)
        # WBRNAi id typed as reagent-targeted gene with expression-variant edge
        assert ("WormBase:WBRNAi00000777", "rdf:type", "GENO:0000504") in spo
        assert ("WormBase:WBRNAi00000777", "GENO:0000443", "WormBase:WBGene00000001") in spo

    def test_person_evidence(self, graph):
        # person-sourced assoc carries the background-knowledge ECO
        rows = graph.filter(
            (F.col("predicate") == "RO:0002558") & (F.col("object") == "ECO:0000001")
        ).count()
        assert rows >= 1


class TestRnaiPheno:
    def test_reagent_and_targeted_gene(self, graph):
        spo = _spo(graph)
        assert ("WormBase:WBRNAi00025129", "rdf:type", "SO:0000337") in spo
        assert ("WormBase:WBRNAi00025129", "GENO:0000414", "WormBase:WBGene00000001") in spo
        # targeted-gene bnode labelled symbol<rnai>, linked both ways
        bnodes = [s for s, p, o in spo if p == "rdfs:label" and o == "Y110A7A.10<WBRNAi00025129>"]
        assert len(bnodes) == 1 and bnodes[0].startswith("_:b")
        b = bnodes[0]
        assert (b, "rdf:type", "GENO:0000504") in spo
        assert (b, "GENO:0000443", "WormBase:WBGene00000001") in spo
        assert (b, "GENO:0000634", "WormBase:WBRNAi00025129") in spo
        assert (b, "RO:0002200", "WBPhenotype:0000643") in spo


class TestFeatureLoc:
    def test_gene_feature_with_build_chrom(self, graph):
        spo = _spo(graph)
        # ID=Gene:WBGene... prefix rewritten; biotype snoRNA -> SO snoRNA_gene
        assert ("WormBase:WBGene00000001", "rdf:type", "SO:0001267") in spo
        # faldo placement on the WS255 build chromosome
        region = [o for s, p, o in spo if s == "WormBase:WBGene00000001" and p == "faldo:location"]
        assert len(region) == 1
        assert ("MONARCH:WS255chrI", "rdf:type", "SO:0000340") in spo
        assert ("MONARCH:WS255chrI", "rdfs:label", "chrI (WS255)") in spo
        assert ("WormBase:WS255", "RO:0002351", "MONARCH:WS255chrI") in spo
        # gmap row skipped entirely
        assert not any("spe-13" in s or "spe-13" in str(o) for s, p, o in spo)

    def test_variation_feature(self, graph):
        spo = _spo(graph)
        assert ("WormBase:WBVar00604246", "rdfs:label", "gk320600") in spo
        assert ("WormBase:WBVar00604246", "rdf:type", "SO:1000008") in spo
        assert ("WormBase:WBVar00604246", "dc:description", "substitution=C/T") in spo
        # polymorphism row dropped
        assert not any(s == "WormBase:WBVar00604247" for s, p, o in spo)


class TestDisease:
    def test_model_of(self, graph):
        spo = _spo(graph)
        assert ("WormBase:WBGene00000001", "RO:0003301", "DOID:2583") in spo
        # source PMID + IEA evidence on the assoc node
        assert any(p == "dc:source" and o == "PMID:19029536" for s, p, o in spo)
        assert any(p == "RO:0002558" and o == "ECO:0000501" for s, p, o in spo)


def test_whole_graph_serializes_strict(graph):
    from conftest import assert_strict_nt

    assert_strict_nt(graph)
