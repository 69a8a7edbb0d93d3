"""KEGG: gene symbol/synonym split, omim2gene link-type dispatch with
variant-locus bnodes, bidirectional 1:1 disease reconciliation
(reference KEGG.py:200-340, 466-635)."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline

DISEASE = "ds:H00021\tGastric cancer\nds:H00022\tOther cancer\nds:H00033\tThird\n"

GENES = "\n".join(
    [
        "hsa:100\tDST, BP240, BPA; dystonin; K10382 dystonin",
        "hsa:200\tSOLO",
        "",
    ]
)

OMIM2GENE = "\n".join(
    [
        "hsa:100\tomim:611254\tequivalent",
        "hsa:100\tomim:137215\treverse",
        "hsa:200\tomim:600000\toriginal",  # skipped
        "",
    ]
)

# H00021 ↔ 137215 is 1:1 both ways; H00022 maps to two omims (dropped);
# 616600+616601 both map to H00033 (dropped in the kegg→omim direction)
OMIM2DISEASE = "\n".join(
    [
        "omim:137215\tds:H00021\tequivalent",
        "omim:614320\tds:H00022\tequivalent",
        "omim:614321\tds:H00022\tequivalent",
        "omim:616600\tds:H00033\tequivalent",
        "omim:616601\tds:H00033\tequivalent",
        "",
    ]
)


PATHWAY_LIST = "path:map04130\tSNARE interactions in vesicular transport\n"

# first split part = label; with >1 parts ALL parts become synonyms, the
# last becomes the description, embedded EC numbers become xrefs
ORTHOLOGY = "\n".join(
    [
        "ko:K00001\tE1.1.1.1, adh; alcohol dehydrogenase [EC:1.1.1.1]",
        "ko:K00002\tSOLOKO",
        "",
    ]
)

NCBI = "hsa:100\tncbi-geneid:100\tequivalent\n"
PUBMED = "pmid:16143147\tpath:map04130\n"
PATHWAY_DS = "ds:H00021\tpath:map04130\n"
KO = "ko:K00001\tpath:map04130\n"


def write_kegg_fixture(raw):
    import pathlib

    raw = pathlib.Path(raw)
    src = get_pipeline("kegg")
    for key, content in {
        "disease": DISEASE, "hsa_genes": GENES, "omim2gene": OMIM2GENE,
        "omim": OMIM2DISEASE, "pathway": PATHWAY_LIST,
        "ortholog_classes": ORTHOLOGY, "ncbi": NCBI, "pubmed": PUBMED,
        "ds": PATHWAY_DS, "ko": KO,
    }.items():
        (raw / src.files[key].file).write_text(content)


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("kegg_raw")
    write_kegg_fixture(raw)
    return get_pipeline("kegg").transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_gene_label_synonyms_definition(graph):
    t = _spo(graph.filter(F.col("subject") == "KEGG-hsa:100"))
    assert ("KEGG-hsa:100", "rdfs:label", "DST") in t
    assert ("KEGG-hsa:100", "OIO:hasRelatedSynonym", "BP240") in t
    assert ("KEGG-hsa:100", "OIO:hasRelatedSynonym", "BPA") in t
    assert ("KEGG-hsa:100", "IAO:0000115", "dystonin") in t
    assert ("KEGG-hsa:100", "rdf:type", "SO:0000704") in t


def test_equivalent_link(graph):
    t = _spo(graph)
    assert ("KEGG-hsa:100", "owl:equivalentClass", "OMIM:611254") in t


def test_reverse_link_variant_locus(graph):
    vl = graph.filter(
        (F.col("predicate") == "GENO:0000418") & (F.col("object") == "KEGG-hsa:100")
    ).collect()
    # MONARCH-prefixed digest, per _make_variant_locus_id's default prefix
    assert len(vl) == 1 and vl[0].subject.startswith("MONARCH:b")
    t = _spo(graph.filter(F.col("subject") == vl[0].subject))
    assert (vl[0].subject, "rdf:type", "GENO:0000002") in t
    assert (vl[0].subject, "rdfs:label", "some variant of DST") in t
    assert (vl[0].subject, "RO:0002607", "OMIM:137215") in t


def test_original_link_skipped(graph):
    assert graph.filter(F.col("object") == "OMIM:600000").count() == 0


def test_one_to_one_reconciliation(graph):
    t = _spo(graph.filter(F.col("predicate") == "owl:equivalentClass"))
    assert ("KEGG-ds:H00021", "owl:equivalentClass", "OMIM:137215") in t
    # ambiguous mappings dropped in BOTH directions
    assert not any(s == "KEGG-ds:H00022" for s, _, _ in t)
    assert not any(o in ("OMIM:616600", "OMIM:616601") for _, _, o in t)


def test_pathway_class_and_depiction(graph):
    t = _spo(graph)
    assert ("KEGG-path:map04130", "rdfs:label",
            "SNARE interactions in vesicular transport") in t
    assert ("KEGG-path:map04130", "rdfs:subClassOf", "GO:0009987") in t
    assert ("KEGG-path:map04130", "rdfs:subClassOf", "PW:0000001") in t
    assert ("KEGG-path:map04130", "foaf:depiction",
            "http://www.genome.jp/kegg/pathway/map/map04130.png") in t


def test_ncbi_equivalence(graph):
    t = _spo(graph)
    assert ("KEGG-hsa:100", "owl:equivalentClass", "NCBIGene:100") in t
    assert ("NCBIGene:100", "rdf:type", "owl:Class") in t


def test_pathway_pubmed_and_disease_links(graph):
    t = _spo(graph)
    assert ("PMID:16143147", "rdf:type", "IAO:0000013") in t
    assert ("PMID:16143147", "IAO:0000136", "KEGG-path:map04130") in t
    # pathway causally upstream of or within the disease process
    assert ("KEGG-path:map04130", "RO:0002418", "KEGG-ds:H00021") in t


def test_pathway_ko_gene_product_bnode(graph):
    import hashlib

    t = _spo(graph)
    # Pathway.addGeneToPathway: bnode digest of colon-stripped id+'product'
    gp = "_:b" + hashlib.sha1(b"KEGG-koK00001product").hexdigest()[1:20]
    assert (gp, "rdf:type", "CHEBI:33695") in t
    assert ("KEGG-ko:K00001", "RO:0002205", gp) in t
    assert (gp, "RO:0002331", "KEGG-path:map04130") in t
    # the reference labels the gene product WITH THE PATHWAY ID as an IRI
    # object (Pathway.py:67-68) — mirrored exactly
    assert (gp, "rdfs:label", "KEGG-path:map04130") in t


def test_ortholog_classes(graph):
    t = _spo(graph)
    assert ("KEGG-ko:K00001", "rdfs:label", "E1.1.1.1") in t
    assert ("KEGG-ko:K00001", "rdfs:subClassOf", "EDAM-DATA:3148") in t
    syns = {o for s, p, o in t if s == "KEGG-ko:K00001" and p == "OIO:hasExactSynonym"}
    assert syns == {"E1.1.1.1", "adh", "alcohol dehydrogenase [EC:1.1.1.1]"}
    assert ("KEGG-ko:K00001", "dc:description",
            "alcohol dehydrogenase [EC:1.1.1.1]") in t
    assert ("KEGG-ko:K00001", "OIO:hasDbXref", "EC:1.1.1.1") in t
    # single-part class: label + family typing only, no synonyms/description
    assert ("KEGG-ko:K00002", "rdfs:label", "SOLOKO") in t
    assert not any(s == "KEGG-ko:K00002" and p == "OIO:hasExactSynonym" for s, p, _ in t)


def test_variant_locus_is_monarch_digest_with_anonymous_flag(graph):
    import hashlib

    t = _spo(graph)
    # _make_variant_locus_id uses the DEFAULT 'MONARCH' prefix (not a bnode)
    vl = "MONARCH:b" + hashlib.sha1(b"KEGG-hsa100-OMIM137215-VL").hexdigest()[1:20]
    assert (vl, "rdf:type", "GENO:0000002") in t
    assert (vl, "rdfs:label", "some variant of DST") in t
    assert (vl, "GENO:0000418", "KEGG-hsa:100") in t
    assert (vl, "MONARCH:anonymous", "true") in t
