"""Port of the reference's Model-emitter unit suite
(/root/reference/tests/test_model.py) plus the CTD interactions golden
(/root/reference/tests/test_interactions.py).

test_model.py exercises Model.addIndividualToGraph (label assignment,
owl:NamedIndividual fallback typing) and Model.addComment — mirrored here
against models/model.py's individual_triples / comment_triples.  The
reference's category-decoration cases (biolink:category triples) are
asserted ABSENT: this engine's documented posture is no biolink
decorations (see tests/test_genotype_model.py::test_no_biolink_category_
decorations).

test_interactions.py in the reference is a broken shell (it references
attributes its setUp never creates and would error before asserting), but
its INTENT is unambiguous: CTD._process_interactions over two fixture rows
must reify chem→disease associations with the therapeutic / marker
predicates, traceable-author-statement evidence, and PMID sources.  The
expected graph below re-derives that trace with reference-computed
association ids (G2PAssoc.make_g2p_id: digest of
'ctd+<chem>+<rel>+<disease>' — environment/stage attributes None →
filtered, G2PAssoc.py:123-142)."""

import gzip
import hashlib

import pytest
from pyspark.sql import functions as F

from dipper_spark.core.triples import graph_diff
from dipper_spark.io.turtle_parse import triples_from_turtle
from dipper_spark.models import comment_triples, individual_triples
from dipper_spark.sources import get_pipeline


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


class TestModelEmitters:
    """tests/test_model.py:38-93 against models/model.py."""

    def test_add_individual_assigns_label(self, spark):
        df = spark.createDataFrame([("MGI:1234", "some label")], ["id", "label"])
        out = individual_triples(df, "id", label_col="label")
        labels = [(r.subject, r.object) for r in out.collect() if r.predicate == "rdfs:label"]
        assert labels == [("MGI:1234", "some label")]
        lit = [r.is_literal for r in out.collect() if r.predicate == "rdfs:label"]
        assert lit == [True]

    def test_add_individual_types_named_individual(self, spark):
        df = spark.createDataFrame([("MGI:1234", "some label")], ["id", "label"])
        out = individual_triples(df, "id", label_col="label")
        types = [o for s, p, o in _spo(out) if p == "rdf:type"]
        assert types == ["owl:NamedIndividual"]

    def test_add_individual_no_category_decoration(self, spark):
        # reference test_addIndividualToGraph_assign_category: passing a
        # biolink category mints a biolink:category triple.  This engine
        # deliberately emits none (documented divergence) — assert absence.
        df = spark.createDataFrame([("MGI:1234", "some label")], ["id", "label"])
        out = individual_triples(df, "id", label_col="label")
        assert not [p for _, p, _ in _spo(out) if "category" in p]

    def test_add_comment(self, spark):
        df = spark.createDataFrame([("MGI:1234", "bonus eruptus")], ["id", "c"])
        out = comment_triples(df, "id", "c")
        rows = out.collect()
        assert [(r.subject, r.predicate, r.object, r.is_literal) for r in rows] == [
            ("MGI:1234", "rdfs:comment", "bonus eruptus", True)
        ]

    def test_add_comment_strips_whitespace(self, spark):
        # Model.addComment calls comment.strip() (Model.py:388)
        df = spark.createDataFrame([("MGI:1234", "  padded  ")], ["id", "c"])
        out = comment_triples(df, "id", "c")
        assert [r.object for r in out.collect()] == ["padded"]


def ref_assoc_id(*parts):
    """Association.make_association_id / GraphUtils.digest_id re-derived
    (Association.py:261-290): None attributes filtered, then
    'MONARCH:b' + sha1('+'.join(parts))[1:20]."""
    wordage = "+".join([p for p in parts if p is not None])
    return "MONARCH:b" + hashlib.sha1(wordage.encode("utf-8")).hexdigest()[1:20]


# the reference test's exact two rows (test_interactions.py:21-28)
ROW1 = ["06-Paris-LA-66 protocol", "C046983", "foo",
        "Precursor Cell Lymphoblastic Leukemia-Lymphoma", "MESH:D054198",
        "therapeutic", "", "", "", "4519131"]
ROW2 = ["10,10-bis(4-pyridinylmethyl)-9(10H)-anthracenone", "C112297",
        "foo", "Hyperkinesis", "MESH:D006948", "marker/mechanism",
        "", "", "", "19098162"]

A1 = ref_assoc_id("ctd", "MESH:C046983", "RO:0002606", "MESH:D054198")
A2 = ref_assoc_id("ctd", "MESH:C112297", "RO:0002607", "MESH:D006948")

GOLDEN = f"""
# ---- row1: therapeutic → substance-that-treats (RO:0002606) ----------
MESH:C046983 RO:0002606 MESH:D054198 .
{A1} a OBAN:association ;
    OBAN:association_has_subject MESH:C046983 ;
    OBAN:association_has_predicate RO:0002606 ;
    OBAN:association_has_object MESH:D054198 ;
    RO:0002558 ECO:0000033 ;
    dc:source PMID:4519131 .
PMID:4519131 a IAO:0000013 .
MESH:C046983 a owl:Class ;
    rdfs:label "06-Paris-LA-66 protocol" .
MESH:D054198 a owl:Class .

# ---- row2: marker/mechanism → marker-for (RO:0002607) ----------------
MESH:C112297 RO:0002607 MESH:D006948 .
{A2} a OBAN:association ;
    OBAN:association_has_subject MESH:C112297 ;
    OBAN:association_has_predicate RO:0002607 ;
    OBAN:association_has_object MESH:D006948 ;
    RO:0002558 ECO:0000033 ;
    dc:source PMID:19098162 .
PMID:19098162 a IAO:0000013 .
MESH:C112297 a owl:Class ;
    rdfs:label "10,10-bis(4-pyridinylmethyl)-9(10H)-anthracenone" .
MESH:D006948 a owl:Class .
"""


@pytest.fixture(scope="module")
def ctd_graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("ctd_interactions_raw")
    body = "# CTD_chemicals_diseases\n" + "\n".join(
        "\t".join(r) for r in (ROW1, ROW2)
    ) + "\n"
    (raw / "CTD_chemicals_diseases.tsv.gz").write_bytes(gzip.compress(body.encode()))
    return get_pipeline("ctd").transform(spark, str(raw)).cache()


class TestCtdInteractionsGolden:
    def test_full_graph_matches_reference_trace(self, spark, ctd_graph):
        expected = triples_from_turtle(spark, GOLDEN)
        only_engine, only_golden = graph_diff(ctd_graph, expected)
        assert only_golden.isEmpty(), [tuple(r) for r in only_golden.collect()]
        assert only_engine.isEmpty(), [tuple(r) for r in only_engine.collect()]

    def test_assoc_id_is_reference_digest(self, ctd_graph):
        # the id the broken reference test TRIED to assert: digest over
        # definedby+chem+rel+disease (no eco/pmid — those were a bug in the
        # never-run test; G2PAssoc.make_g2p_id hashes only the core triple)
        subjects = {r.subject for r in ctd_graph.collect()}
        assert A1 in subjects and A2 in subjects
        with_extras = ref_assoc_id(
            "ctd", "MESH:C046983", "RO:0002606", "MESH:D054198",
            "ECO:0000033", "PMID:4519131",
        )
        assert with_extras not in subjects
