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
    "!species v 3.244 September 2 2006\n"
    "!!internal_id | taxgroup | abbreviation | genus | species name | common name | comment | ncbi-taxon-id\n"
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


# --------------------------------------------------------------------------
# Reference goldens (/root/reference/tests/test_flybase.py) over the
# reference's per-allele fixture exports (resources/flybase/input/<FBal>/)
# against the union of its four expected graphs (allele_gene, gene_xref,
# allele_phenotype, disease_model) — the engine's transform emits all four
# passes over one raw dir.  Compared at expanded-IRI level.
#
# Golden adjudication: allele_phenotype.ttl is STALE against the current
# reference code — FlyBase.py:300-306 now skips derived_pheno_manifest rows
# entirely ("skip parsing for now", the dipper#770 UPheno decision), but
# the golden still carries the old manifest-derived '<term>PHENOTYPE'
# classes and their associations.  The expected set here drops those
# manifest stanzas (any triple touching a PHENOTYPE-suffixed IRI, plus the
# orphaned stanzas of the associations that pointed at them), keeping the
# class-row associations the current code produces — whose MONARCH digests
# match the golden file bit-for-bit.
# --------------------------------------------------------------------------

import os as _os

_REF_FB = "/root/reference/tests/resources/flybase"
_ref_fb = pytest.mark.skipif(
    not _os.path.isdir(_REF_FB), reason="reference fixtures absent"
)


def _fb_norm(t, is_literal):
    from dipper_spark.core.curie import CurieMap

    cm = CurieMap()
    if is_literal:
        return ("val", t)
    return ("iri", cm.expand_str(t) if ":" in t and "://" not in t else t)


def _fb_golden(spark, allele):
    from dipper_spark.io.turtle_parse import parse_turtle

    raw = _os.path.join(_REF_FB, "input", allele)
    got = {
        (_fb_norm(r.subject, False), _fb_norm(r.predicate, False),
         _fb_norm(r.object, r.is_literal))
        for r in get_pipeline("flybase").transform(spark, raw).collect()
    }
    raw_expected = []
    for part in ("allele_gene", "gene_xref", "allele_phenotype", "disease_model"):
        ttl = open(_os.path.join(_REF_FB, "expected", allele, part + ".ttl")).read()
        for t in parse_turtle(ttl):
            if "biolink" in t["predicate"] or "biolink" in str(t["object"]):
                continue
            raw_expected.append(t)
    # drop the stale manifest stanzas (see adjudication above): PHENOTYPE-
    # suffixed terms and every triple of an association pointing at one
    manifest_assocs = {
        t["subject"]
        for t in raw_expected
        if "PHENOTYPE" in str(t["object"])
        and t["predicate"] == "OBAN:association_has_object"
    }
    exp = {
        (_fb_norm(t["subject"], False), _fb_norm(t["predicate"], False),
         _fb_norm(t["object"], t["is_literal"]))
        for t in raw_expected
        if "PHENOTYPE" not in t["subject"]
        and "PHENOTYPE" not in str(t["object"])
        and t["subject"] not in manifest_assocs
    }
    assert got == exp, (
        f"{allele}: missing:\n" + "\n".join(map(str, sorted(exp - got)))
        + "\nextra:\n" + "\n".join(map(str, sorted(got - exp)))
    )


@_ref_fb
def test_golden_fbal0195705(spark):
    _fb_golden(spark, "FBal0195705")


@_ref_fb
def test_golden_fbal0263199(spark):
    _fb_golden(spark, "FBal0263199")


@_ref_fb
def test_golden_foreign_transgene_empty(spark):
    """FBal0256668 is a foreign (non-dmel) transgene: the phenotype,
    disease-model and allele-gene passes must all skip it (reference
    test_foreign_transgene runs exactly those three passes; the gene-xref
    pass is out of its scope and legitimately emits the gene equivalence)."""
    from pyspark.sql import functions as F

    raw = _os.path.join(_REF_FB, "input", "FBal0256668")
    got = get_pipeline("flybase").transform(spark, raw)
    assert got.filter(
        F.col("subject").contains("FBal0256668") | F.col("object").contains("FBal0256668")
    ).count() == 0
    assert got.filter(
        F.col("predicate").isin("RO:0002200", "RO:0003304")
        | F.col("predicate").startswith("OBAN:")
    ).count() == 0
