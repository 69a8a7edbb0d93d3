"""Model-emitter layer: golden triple-set equality per pattern, mirroring the
reference's test strategy (TestUtils.test_graph_equality, tests/test_ctd.py
style: one hand-built input row → expected triple set)."""

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from dipper_spark.core.schema import TRIPLE_SCHEMA
from dipper_spark.core.triples import graph_equal
from dipper_spark.models import (
    association_triples,
    class_triples,
    d2p_association_triples,
    dataset_metadata_triples,
    deprecation_triples,
    feature_triples,
    interaction_triples,
    orthology_triples,
    synonym_triples,
    vslc_triples,
)
from dipper_spark.models.sepio import evidence_triples, provenance_triples


def _expected(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, True, None, None) for s, p, o in rows], TRIPLE_SCHEMA
    )


def _assoc_id(sub, pred, obj, *attrs, definedby="MONARCH"):
    # reference: Association.make_association_id (Association.py:260-290)
    s = "+".join([definedby, sub, pred, obj, *attrs])
    return "MONARCH:b" + hashlib.sha1(s.encode()).hexdigest()[1:20]


def test_class_triples_golden(spark):
    df = spark.createDataFrame(
        [Row(id="HP:0000118", label="Phenotypic abnormality", parent="HP:0000001")]
    )
    out = class_triples(df, "id", label_col="label", subclass_of_col="parent")
    exp = _expected(
        spark,
        [
            ("HP:0000118", "rdf:type", "owl:Class"),
            ("HP:0000118", "rdfs:label", "Phenotypic abnormality"),
            ("HP:0000118", "rdfs:subClassOf", "HP:0000001"),
        ],
    )
    assert graph_equal(out, exp)


def test_synonym_explode(spark):
    df = spark.createDataFrame([Row(id="GO:0008150", syns=["biological process", "BP", ""])])
    out = synonym_triples(df, "id", "syns")
    exp = _expected(
        spark,
        [
            ("GO:0008150", "OIO:hasExactSynonym", "biological process"),
            ("GO:0008150", "OIO:hasExactSynonym", "BP"),
        ],
    )
    assert graph_equal(out, exp)


def test_deprecation_with_replacement(spark):
    df = spark.createDataFrame([Row(id="OMIM:100000", rep="OMIM:200000")])
    out = deprecation_triples(df, "id", "rep")
    exp = _expected(
        spark,
        [
            ("OMIM:100000", "owl:deprecated", "true"),
            ("OMIM:100000", "IAO:0100001", "OMIM:200000"),
        ],
    )
    assert graph_equal(out, exp)


def test_association_star_and_id_bitcompat(spark):
    df = spark.createDataFrame(
        [
            Row(
                subject="MGI:12345",
                predicate="RO:0002200",
                object="HP:0000001",
                evidence=["ECO:0000006"],
                sources=["PMID:11111", "PMID:22222"],
            )
        ]
    )
    out = association_triples(df, evidence_col="evidence", source_col="sources")
    aid = _assoc_id("MGI:12345", "RO:0002200", "HP:0000001")
    exp = _expected(
        spark,
        [
            ("MGI:12345", "RO:0002200", "HP:0000001"),
            (aid, "rdf:type", "OBAN:association"),
            (aid, "OBAN:association_has_subject", "MGI:12345"),
            (aid, "OBAN:association_has_predicate", "RO:0002200"),
            (aid, "OBAN:association_has_object", "HP:0000001"),
            (aid, "RO:0002558", "ECO:0000006"),
            (aid, "dc:source", "PMID:11111"),
            (aid, "dc:source", "PMID:22222"),
        ],
    )
    assert graph_equal(out, exp)


def test_d2p_qualifiers_in_id_hash(spark):
    # two rows differing only in frequency must mint two distinct assoc nodes
    # (D2PAssoc includes onset+frequency in the id, D2PAssoc.py:58-105)
    df = spark.createDataFrame(
        [
            Row(disease_id="OMIM:1", phenotype_id="HP:1", predicate="RO:0002200",
                onset="", frequency="HP:0040283"),
            Row(disease_id="OMIM:1", phenotype_id="HP:1", predicate="RO:0002200",
                onset="", frequency="HP:0040284"),
        ]
    )
    out = d2p_association_triples(df, onset_col="onset", frequency_col="frequency")
    n_assoc = out.filter("predicate = 'rdf:type' and object = 'OBAN:association'").count()
    assert n_assoc == 2
    freqs = out.filter("predicate = 'RO:0003306'").count()
    assert freqs == 2


def test_interaction_symmetric_canonicalization(spark):
    # StringDB.py:200-208: both directions collapse to one canonical edge
    df = spark.createDataFrame(
        [Row(gene1="STRING:b", gene2="STRING:a"), Row(gene1="STRING:a", gene2="STRING:b")]
    )
    out = interaction_triples(df)
    assert out.count() == 1
    row = out.collect()[0]
    assert (row.subject, row.object) == ("STRING:a", "STRING:b")


def test_orthology_family_membership(spark):
    df = spark.createDataFrame(
        [Row(gene1="NCBIGene:1", gene2="NCBIGene:2", family="PANTHER:PTHR1")]
    )
    out = orthology_triples(df, family_col="family")
    assert out.filter("predicate = 'RO:HOM0000017'").count() == 1
    assert out.filter("predicate = 'RO:0002350'").count() == 2


def test_feature_faldo_star(spark):
    df = spark.createDataFrame(
        [Row(feature_id="MGI:99", chrom="chr13", start=100, stop=200, strand="+")]
    )
    out = feature_triples(df, strand_col="strand").cache()
    # region + 2 positions, each typed twice, positioned, referenced
    assert out.filter("predicate = 'faldo:location'").count() == 1
    assert out.filter("predicate = 'faldo:begin'").count() == 1
    assert out.filter("predicate = 'faldo:position'").count() == 2
    assert out.filter("object = 'faldo:ForwardStrandPosition'").count() == 2
    assert out.filter("predicate = 'faldo:reference' and object = 'chr13'").count() == 2
    # deterministic: re-running yields the identical triple set
    assert graph_equal(out, feature_triples(df, strand_col="strand"))


def test_vslc_stanza(spark):
    df = spark.createDataFrame(
        [Row(vslc_id="_:vslc1", allele1="MGI:a1", allele2="MGI:a2",
             zygosity="GENO:0000135", genotype_id="MGI:g1")]
    )
    out = vslc_triples(df)
    assert out.filter("predicate = 'GENO:0000382'").count() == 2
    assert out.filter("predicate = 'GENO:0000608' and object = 'GENO:0000135'").count() == 1
    assert out.filter("subject = 'MGI:g1' and predicate = 'BFO:0000051'").count() == 1


def test_evidence_and_provenance(spark):
    df = spark.createDataFrame(
        [Row(assoc_id="MONARCH:b123", evidence_type="ECO:0000006", ref="PMID:1")]
    )
    ev = evidence_triples(df, reference_col="ref")
    assert ev.filter("predicate = 'SEPIO:0000007'").count() == 1
    assert ev.filter("predicate = 'dc:source' and object = 'PMID:1'").count() == 1
    pv = provenance_triples(df, agent_col=None, date_col=None, publication_col="ref")
    assert pv.filter("predicate = 'SEPIO:0000015'").count() == 1


def test_dataset_metadata_void_counts(spark):
    g = spark.createDataFrame(
        [("a", "p", "x", False, None, None), ("b", "p", "y", False, None, None)],
        TRIPLE_SCHEMA,
    )
    out = dataset_metadata_triples(
        spark, g, "MONARCH:ds", title="t", version="2026-08", download_url="http://x/d.nt"
    )
    rows = {(r.predicate): r.object for r in out.collect()}
    assert rows["void:triples"] == "2"
    assert rows["void:distinctSubjects"] == "2"
    assert rows["void:properties"] == "1"
    assert rows["pav:version"] == "2026-08"


class TestModelGolden:
    """reference test_model.py (4 meaningful tests of Model
    addIndividualToGraph / addComment) ported against
    models/model.py emitters; biolink category decorations are pinned
    ABSENT (scoped out of the model layer, same adjudication as the other
    golden suites)."""

    def test_add_individual_assigns_label_and_named_individual(self, spark):
        from dipper_spark.models.model import individual_triples

        df = spark.createDataFrame([("MGI:1234", "some label")], ["id", "lbl"])
        spo = {
            (r.subject, r.predicate, r.object)
            for r in individual_triples(df, "id", label_col="lbl").collect()
        }
        assert ("MGI:1234", "rdfs:label", "some label") in spo
        assert ("MGI:1234", "rdf:type", "owl:NamedIndividual") in spo

    def test_add_comment(self, spark):
        from dipper_spark.core import make_triples
        from dipper_spark.models import terms as T

        df = spark.createDataFrame([("MGI:1234", "bonus eruptus")], ["id", "c"])
        got = make_triples(df, "id", F.lit(T.COMMENT), "c", is_literal=True).collect()
        assert [(r.subject, r.predicate, r.object) for r in got] == [
            ("MGI:1234", "rdfs:comment", "bonus eruptus")
        ]

    def test_no_category_decorations(self, spark):
        from dipper_spark.models.model import individual_triples

        df = spark.createDataFrame([("MGI:1234", "some label")], ["id", "lbl"])
        got = individual_triples(df, "id", label_col="lbl")
        assert got.filter(F.col("predicate").contains("biolink")).count() == 0
