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


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("kegg_raw")
    src = get_pipeline("kegg")
    for key, content in {
        "disease": DISEASE, "hsa_genes": GENES, "omim2gene": OMIM2GENE, "omim": OMIM2DISEASE,
    }.items():
        (raw / src.files[key].file).write_text(content)
    return src.transform(spark, str(raw)).cache()


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
    assert len(vl) == 1 and vl[0].subject.startswith("_:b")
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
