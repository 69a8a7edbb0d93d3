"""FlyBase: @term@ phenotype parsing with qualifier-disambiguated assoc ids,
species-prefix transgenic filtering, gene xref cliques, disease models
(reference FlyBase.py:213-765)."""

import gzip

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline

ALLELE_PHENO = (
    "allele_id\tpheno_desc\tpheno_type\tpub_id\tpub_title\tpmid_id\n"
    "FBal0195705\t@FBcv0000351:lethal@ | @FBcv0000308:female limited@, with @FBal0130657:Scer-GAL4@\tderived_pheno_class\tFBrf0191910\tSome title\t12345\n"
    "FBal0195705\t@FBcv0000351:lethal@\tderived_pheno_class\tFBrf0000001\tUnpub title\t\n"
    "FBal0195705\t@FBbt0000001:wing@\tderived_pheno_manifest\tFBrf0191910\tT\t12345\n"
    "FBal0666666\t@FBcv0000351:lethal@\tderived_pheno_class\tFBrf0191910\tT\t12345\n"
)

GENE_XREF = (
    "gene_id\txref_id\txref_source\n"
    "FBgn0000490\t45551\tEntrezGene\n"
    "FBgn0000490\t4319\tHGNC\n"
    "FBgn0000490\tP10041\tUniProt/Swiss-Prot\n"
)

ALLELE_GENE = (
    "## generated whenever\n"
    "#\tAlleleID\tAlleleSymbol\tGeneID\tGeneSymbol\n"
    "FBal0195705\tdpp[1]\tFBgn0000490\tdpp\n"
    "FBal0666666\tHsap\\MAPT[x]\tFBgn0666666\tHsap\\MAPT\n"
    "FBal0777777\tScer\\GAL4[y]\tFBgn0777777\tScer\\GAL4\n"
)

SPECIES = (
    "# some preamble\n"
    "# internal_id | taxgroup | abbreviation | genus | species name | common name | comment | ncbi-taxon-id\n"
    "\n"
    "1 | drosophilid | Dmel | Drosophila | melanogaster | fruit fly |  | taxon:7227\n"
    "2 | non-drosophilid eukaryote | Hsap | Homo | sapiens | human |  | taxon:9606\n"
    "3 | drosophilid | Scer | Saccharomyces | cerevisiae | yeast |  | taxon:4932\n"
)

DISEASE = (
    "## header stuff\n"
    "## more\n"
    "#\n"
    "## FBgn ID\tGene symbol\tHGNC ID\tDO qualifier\tDO ID\tDO term\tAllele used in model (FBal ID)\tAllele used in model (symbol)\tBased on orthology with (HGNC ID)\tBased on orthology with (symbol)\tEvidence/interacting alleles\tReference (FBrf ID)\n"
    "FBgn0000490\tdpp\t\tmodel of\tDOID:1234\tsome disease\tFBal0195705\tdpp[1]\t\t\tinferred from mutant phenotype\tFBrf0191910\n"
    "FBgn0000490\tdpp\t\tameliorates\tDOID:9999\tother\tFBal0195705\tdpp[1]\t\t\t\tFBrf0191910\n"
    "FBgn0000490\tdpp\t\tmodel of\tDOID:5678\tthird\tFBal0195705\tdpp[1]\t\t\tFBal0130657\tFBrf0000001\n"
)

REF_PUBMED = (
    "## fbrf_pmid_pmcid_doi_fb.tsv\n"
    "## produced whenever\n"
    "#FBrf\tPMID\tPMCID\tDOI\tpub_type\tminiref\tpmid_added\n"
    "FBrf0191910\t16110336\tPMC1182327\t\tpaper\tmini\t2005\n"
)


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fb_raw")
    (d / "allele_phenotype.tsv").write_text(ALLELE_PHENO)
    (d / "gene_xref.tsv").write_text(GENE_XREF)
    for name, content in [
        ("fbal_to_fbgn_fb.tsv.gz", ALLELE_GENE),
        ("species.ab.gz", SPECIES),
        ("disease_model_annotations.tsv.gz", DISEASE),
        ("fbrf_pmid_pmcid_doi_fb.tsv.gz", REF_PUBMED),
    ]:
        with gzip.open(d / name, "wt") as fh:
            fh.write(content)
    return get_pipeline("flybase").transform(spark, str(d)).cache()


def _spo(graph):
    return {(r.subject, r.predicate, r.object) for r in graph.collect()}


class TestAllelePheno:
    def test_phenotype_and_qualifiers(self, graph):
        spo = _spo(graph)
        assert ("FlyBase:FBal0195705", "RO:0002200", "FBcv:0000351") in spo
        # qualifiers attach to the assoc node: FBcv split, FBal kept whole
        quals = {(s, o) for s, p, o in spo if p == "GENO:0000580"}
        assert any(o == "FBcv:0000308" for s, o in quals)
        assert any(o == "FlyBase:FBal0130657" for s, o in quals)
        # qualified and unqualified rows mint DISTINCT association ids
        assoc_subjects = {
            s for s, p, o in spo
            if p == "OBAN:association_has_subject" and o == "FlyBase:FBal0195705"
        }
        assert len(assoc_subjects) >= 3  # 2 pheno rows + 1+ disease models

    def test_refs_and_filters(self, graph):
        spo = _spo(graph)
        # pmid ref used directly; non-pmid pub becomes FlyBase ref w/ title
        assert any(p == "dc:source" and o == "PMID:12345" for s, p, o in spo)
        assert ("FlyBase:FBrf0000001", "dc:title", "Unpub title") in spo
        # derived_pheno_manifest skipped
        assert not any("FBbt" in str(o) for s, p, o in spo)
        # foreign transgenic allele (Hsap prefix) has no phenotype assoc
        assert not any(
            s == "FlyBase:FBal0666666" and p == "RO:0002200" for s, p, o in spo
        )


class TestAlleleGene:
    def test_drosophilid_filter_and_locus(self, graph):
        spo = _spo(graph)
        assert ("FlyBase:FBal0195705", "rdfs:label", "dpp[1]") in spo
        assert ("FlyBase:FBal0195705", "rdf:type", "GENO:0000512") in spo
        assert ("FlyBase:FBal0195705", "RO:0002162", "NCBITaxon:7227") in spo
        assert ("FlyBase:FBal0195705", "GENO:0000418", "FlyBase:FBgn0000490") in spo
        assert ("FlyBase:FBgn0000490", "rdfs:label", "dpp") in spo
        # Hsap transgenic allele dropped entirely
        assert not any(s == "FlyBase:FBal0666666" for s, p, o in spo)
        # drosophilid-prefixed (Scer) allele kept with its taxon
        assert ("FlyBase:FBal0777777", "RO:0002162", "NCBITaxon:4932") in spo


class TestXrefsAndDisease:
    def test_xref_cliques(self, graph):
        spo = _spo(graph)
        assert ("FlyBase:FBgn0000490", "owl:equivalentClass", "NCBIGene:45551") in spo
        assert ("FlyBase:FBgn0000490", "owl:equivalentClass", "HGNC:4319") in spo
        assert not any(o == "UniProt/Swiss-Prot:P10041" for s, p, o in spo)

    def test_disease_models(self, graph):
        spo = _spo(graph)
        assert ("FlyBase:FBal0195705", "RO:0003301", "DOID:1234") in spo
        # FBrf mapped to PMID through the pub dim
        assert any(p == "dc:source" and o == "PMID:16110336" for s, p, o in spo)
        # mutant-phenotype evidence vs free-text description dispatch
        assert any(p == "RO:0002558" and o == "ECO:0000015" for s, p, o in spo)
        assert any(p == "dc:description" and o == "FBal0130657" for s, p, o in spo)
        # ameliorates rows skipped
        assert not any(o == "DOID:9999" for s, p, o in spo)


def test_whole_graph_serializes_strict(graph):
    from conftest import assert_strict_nt

    assert_strict_nt(graph)
