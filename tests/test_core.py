"""Core triples/id/literal/curie semantics — each asserts bit-compatibility
with the reference behavior it reproduces (cited in the module docstrings)."""

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from dipper_spark.core import (
    CurieMap,
    TranslationTable,
    dedup_triples,
    digest_id,
    graph_equal,
    is_literal_col,
    make_id,
    make_triples,
    nt_escape,
    predicate_histogram,
    union_graphs,
    void_stats,
)
from dipper_spark.core.ids import assoc_id
from dipper_spark.core.literals import normalize_whitespace, skolemize_bnode


def test_digest_id_matches_reference_sha1(spark):
    # reference: Source.hash_id == 'b' + sha1(s)[1:20] (Source.py:259-278)
    words = ["hello world", "MGI:12345+has phenotype+HP:0000001", ""]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = [r[0] for r in df.select(digest_id("w")).collect()]
    want = ["b" + hashlib.sha1(w.encode("utf-8")).hexdigest()[1:20] for w in words]
    assert got == want


def test_make_id_and_assoc_id(spark):
    df = spark.createDataFrame([Row(s="GENE:1", p="RO:0003301", o="HP:2")])
    row = df.select(
        make_id(F.col("s")).alias("mid"),
        assoc_id("s", "p", "o").alias("aid"),
    ).first()
    assert row.mid == "MONARCH:b" + hashlib.sha1(b"GENE:1").hexdigest()[1:20]
    joined = "+".join(["MONARCH", "GENE:1", "RO:0003301", "HP:2"])
    assert row.aid == "MONARCH:b" + hashlib.sha1(joined.encode()).hexdigest()[1:20]


def test_is_literal_inference(spark):
    # reference: RDFGraph._is_literal (RDFGraph.py:67-79)
    cases = {
        "HP:0000001": False,
        "http://example.org/x": False,
        "ftp://host/file": False,
        "plain text value": True,
        "12345": True,
        "with:colon but spaces": True,
    }
    df = spark.createDataFrame([(k,) for k in cases], ["v"])
    got = {r["v"]: r["lit"] for r in df.select("v", is_literal_col("v").alias("lit")).collect()}
    assert got == cases


def test_nt_escape_matches_quote_encode(spark):
    # reference: StreamedGraph._quote_encode (StreamedGraph.py:168-180)
    raw = 'back\\slash "quoted"\nnew\rline'

    def quote_encode(literal):
        return literal.replace("\\", "\\\\").replace("\n", "\\n").replace('"', '\\"').replace("\r", "\\r")

    df = spark.createDataFrame([(raw,)], ["v"])
    assert df.select(nt_escape("v")).first()[0] == quote_encode(raw)


def test_whitespace_normalization_and_bnode(spark):
    df = spark.createDataFrame([("a\tb\nc  d", "_:b42")], ["v", "b"])
    row = df.select(
        normalize_whitespace("v").alias("v"), skolemize_bnode("b").alias("b")
    ).first()
    assert row.v == "a b c  d"  # only [\t\n\r\f\v]+ collapse, not spaces
    assert row.b.endswith("/genid/b42")


def test_curie_expand_contract_roundtrip(spark):
    cm = CurieMap()
    df = spark.createDataFrame(
        [("HP:0000118",), ("MGI:MGI:12345",), ("http://example.org/raw",), ("NOPE:1",)], ["c"]
    )
    rows = df.select("c", cm.expand("c").alias("iri")).collect()
    got = {r["c"]: r["iri"] for r in rows}
    assert got["HP:0000118"] == "http://purl.obolibrary.org/obo/HP_0000118"
    # locals containing ':' keep everything after the FIRST colon
    assert got["MGI:MGI:12345"] == "http://www.informatics.jax.org/accession/MGI:MGI:12345"
    assert got["http://example.org/raw"] == "http://example.org/raw"
    assert got["NOPE:1"] is None
    back = (
        spark.createDataFrame([(got["HP:0000118"],)], ["iri"])
        .select(cm.contract("iri"))
        .first()[0]
    )
    assert back == "HP:0000118"


def test_translation_table_resolve_chain(spark):
    # reference: Source.resolve fallback g(f(x)) | g(x) | f(x) | default | x
    tt = TranslationTable(
        globaltt={"abnormal": "PATO:0000460", "IEA": "ECO:0000501"},
        localtt={"abn": "abnormal", "weird": "no-such-label"},
    )
    df = spark.createDataFrame(
        [("abn",), ("IEA",), ("weird",), ("unknown",)], ["w"]
    )
    got = {r["w"]: r["r"] for r in df.select("w", tt.resolve("w").alias("r")).collect()}
    assert got["abn"] == "PATO:0000460"  # g(f(x))
    assert got["IEA"] == "ECO:0000501"  # g(x)
    assert got["weird"] == "no-such-label"  # f(x) hit, no global -> label
    assert got["unknown"] == "unknown"  # fall-through x
    missed = tt.unresolved(df, "w")
    assert [r["w"] for r in missed.collect()] == ["unknown"]


def test_make_triples_dedup_union_stats(spark):
    src = spark.createDataFrame(
        [("G:1", "is_a", "G:2"), ("G:1", "is_a", "G:2"), ("G:3", "label", "gene three")],
        ["s", "p", "o"],
    )
    t = make_triples(src, "s", "p", "o", graph_id="test")
    assert t.columns == ["subject", "predicate", "object", "is_literal", "datatype", "graph_id"]
    d = dedup_triples(t)
    assert d.count() == 2
    lits = {r["object"]: r["is_literal"] for r in d.collect()}
    assert lits["G:2"] is False and lits["gene three"] is True

    u = union_graphs(t, t)
    assert u.count() == 2
    hist = {r["predicate"]: r["n_triples"] for r in predicate_histogram(d).collect()}
    assert hist == {"is_a": 1, "label": 1}
    stats = void_stats(d).first()
    assert stats.n_triples == 2 and stats.n_properties == 2

    assert graph_equal(t, d)  # set semantics: dup collapse equal
    assert not graph_equal(t, t.limit(1))


def test_graphutils_reference_golden(spark):
    """Ported from /root/reference/tests/test_graph_utils.py + the
    resources/graphutils fixtures (embedded verbatim): predicate histogram
    counts (name=1, enemyOf=2) and the two-graph compare (name appears once
    in each graph)."""
    from dipper_spark.core.triples import compare_predicate_histograms
    from dipper_spark.io.turtle_parse import triples_from_turtle

    # resources/graphutils/gu_test_graph.ttl (verbatim)
    gu1 = (
        "<http://example.org/#spiderman> "
        "<http://www.perceive.net/schemas/relationship/enemyOf> "
        "<http://example.org/#green-goblin> .\n"
        "<http://example.org/#superman> "
        "<http://www.perceive.net/schemas/relationship/enemyOf> "
        "<http://example.org/#lexluther> .\n"
        '<http://example.org/#spiderman> <http://xmlns.com/foaf/0.1/name> "Spiderman" .\n'
    )
    # resources/graphutils/gu_test_graph2.ttl (verbatim, prefixes inlined)
    gu2 = (
        '<http://example.org/#spiderman> <http://xmlns.com/foaf/0.1/name> "Spiderman" .\n'
        "<http://example.org/vocab/show/218> "
        "<http://www.w3.org/2000/01/rdf-schema#label> "
        '"That Seventies Show"^^<http://www.w3.org/2001/XMLSchema#string> .\n'
    )
    g1 = triples_from_turtle(spark, gu1, graph_id="g1")
    g2 = triples_from_turtle(spark, gu2, graph_id="g2")
    # the parse harness contracts IRIs through the curie map: foaf is a
    # registered prefix, perceive.net is not
    enemy = "http://www.perceive.net/schemas/relationship/enemyOf"
    name = "foaf:name"
    hist = {r.predicate: r.n_triples for r in predicate_histogram(g1).collect()}
    assert hist[enemy] == 2 and hist[name] == 1
    cmp = {
        r.predicate: (r.n_left, r.n_right)
        for r in compare_predicate_histograms(g1, g2).collect()
    }
    assert cmp[enemy] == (2, 0)
    assert cmp[name] == (1, 1)


def test_group_zscore_singleton_group_yields_null_on_both_paths(spark):
    """ADVICE r11: the fixed-point (grid) path's n/(n-1) variance factor
    divides by zero at n=1, yielding Inf/NaN z where the float path's
    stddev_samp yields NULL — and Spark drops NaN from abs(z)>=t while
    DuckDB ranks NaN above everything, so a singleton group would flip
    the oracle gate.  Both paths must return NULL z for n=1 groups."""
    from dipper_spark.operators.aggregates import group_zscore

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("solo", 7.25)],
        "grp string, v double",
    )
    for grid in (None, 100):
        out = group_zscore(df, "grp", "v", z_col="z", grid=grid)
        rows = {(r.grp, r.v): r.z for r in out.collect()}
        assert rows[("solo", 7.25)] is None, f"grid={grid}"
        # non-singleton groups keep real finite z-scores
        z = rows[("a", 3.0)]
        assert z is not None and abs(z - 1.0) < 1e-9, f"grid={grid}"
