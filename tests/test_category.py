"""Ported reference goldens: biolink category assignment
(/root/reference/tests/test_rdfgraph.py:35-77,111-158 — the addTriple
subject/object category side triples and _make_category_triple defaults)."""

import pyspark.sql.functions as F

from dipper_spark.core.triples import (
    BIOLINK_CATEGORY,
    BIOLINK_NAMED_THING,
    category_triples,
    make_triples,
)

SUBJ = "http://www.google.com"


def _spo(g):
    return {(r.subject, r.predicate, r.object) for r in g.collect()}


class TestMakeCategoryTriple:
    def test_default_pred_and_category(self, spark):
        # test_make_category_triple_default / ..._category_none_should_emit_named_thing
        df = spark.createDataFrame([(SUBJ,)], ["e"])
        got = _spo(category_triples(df, "e"))
        assert got == {(SUBJ, BIOLINK_CATEGORY, BIOLINK_NAMED_THING)}

    def test_non_default_category(self, spark):
        df = spark.createDataFrame([(SUBJ,)], ["e"])
        got = _spo(category_triples(df, "e", "biolink:Gene"))
        assert got == {(SUBJ, BIOLINK_CATEGORY, "biolink:Gene")}

    def test_non_default_predicate(self, spark):
        df = spark.createDataFrame([(SUBJ,)], ["e"])
        got = _spo(category_triples(df, "e", BIOLINK_NAMED_THING, predicate="rdf:type"))
        assert got == {(SUBJ, "rdf:type", BIOLINK_NAMED_THING)}


class TestAddTripleCategories:
    def test_subject_category_assignment(self, spark):
        # test_add_triple_subject_category_assignment: exactly one category
        # side triple with the passed (non-default) category
        df = spark.createDataFrame([(SUBJ, "website")], ["s", "o"])
        g = make_triples(
            df, "s", F.lit("rdf:comment"), "o",
            is_literal=True, subject_category="biolink:Gene",
        )
        cats = [t for t in _spo(g) if t[1] == BIOLINK_CATEGORY]
        assert cats == [(SUBJ, BIOLINK_CATEGORY, "biolink:Gene")]
        assert (SUBJ, "rdf:comment", "website") in _spo(g)

    def test_object_category_assignment(self, spark):
        # test_add_triple_object_category_assignment: the category triple's
        # subject is the OBJECT entity
        df = spark.createDataFrame([(SUBJ, "rdf:class")], ["s", "o"])
        g = make_triples(
            df, "s", F.lit("rdf:type"), "o", object_category="biolink:Gene"
        )
        cats = [t for t in _spo(g) if t[1] == BIOLINK_CATEGORY]
        assert cats == [("rdf:class", BIOLINK_CATEGORY, "biolink:Gene")]

    def test_object_category_dropped_for_literal_objects(self, spark):
        # RDFGraph.py:103-107: a category given for a literal object is not
        # emitted (the reference only warns)
        df = spark.createDataFrame([(SUBJ, "just text")], ["s", "o"])
        g = make_triples(df, "s", F.lit("rdf:comment"), "o",
                         object_category="biolink:Gene")
        assert not [t for t in _spo(g) if t[1] == BIOLINK_CATEGORY]
        # per-row inference: a mixed frame emits the category only for the
        # non-literal row
        df2 = spark.createDataFrame(
            [(SUBJ, "OMIM:1"), (SUBJ, "plain words here")], ["s", "o"]
        )
        g2 = make_triples(df2, "s", F.lit("rdf:seeAlso"), "o",
                          object_category="biolink:Disease")
        cats = [t for t in _spo(g2) if t[1] == BIOLINK_CATEGORY]
        assert cats == [("OMIM:1", BIOLINK_CATEGORY, "biolink:Disease")]
