"""EOM full-graph golden — reference-traced.

The reference's own test (/root/reference/tests/test_eom.py) is an
assertion-free SourceTestCase shell, so the expected graph below is
hand-traced from EOM.py:

- ``_process_nlx_157874_1_view`` (:150-283): every term gets class +
  label + subClassOf biolink:PhenotypicFeature (the blv term is passed as
  addClassToGraph's class_TYPE, :213-217) and — because addDefinition has
  no empty-gate (Model.py:355-362) — an IAO:0000115 definition literal
  even when both definition columns are empty ('  ', the bare join
  separator), plus the ``biolink:category biolink:PhenotypicFeature``
  side triple from addDefinition's class_category (:233-234);
- trailing periods are enforced per part before the '  ' join (:221-229);
- depiction/page urls auto-classify as IRIS, not literals
  (RDFGraph._is_literal; Reference.addPage passes
  object_is_literal=False);
- exact synonyms are the ';'-split STRIPPED pieces (:253-256); the
  'replaces' related synonyms are UNSTRIPPED — the ``syn.strip()`` at
  :265 discards its result — gated only on non-empty and on the whole
  column differing from synonyms (:259-267);
- NO web-page typing: the Reference object at :272-273 is constructed
  but never written to the graph;
- ``_map_eom_terms`` (:285-325): underscore→colon HP ids declared as
  classes and linked owl:equivalentClass; non-HP rows skipped.
"""

import pytest
from pyspark.sql import functions as F

from dipper_spark.io.turtle_parse import triples_from_turtle
from dipper_spark.sources import get_pipeline

VIEW_COLS = [
    "morphology_term_id", "morphology_term_num", "morphology_term_label",
    "morphology_term_url", "terminology_category_label",
    "terminology_category_url", "subcategory", "objective_definition",
    "subjective_definition", "comments", "synonyms", "replaces",
    "small_figure_url", "large_figure_url", "e_uid", "v_uid", "v_uuid",
    "v_lastmodified", "v_status", "v_lastmodified_epoch",
]


def _view_row(**kw):
    row = {c: "" for c in VIEW_COLS}
    row.update(kw)
    return "\t".join(row[c] for c in VIEW_COLS)


VIEW = "\n".join(
    [
        "\t".join(VIEW_COLS),
        # full decorations; objective def lacks its period, subjective has it
        _view_row(
            morphology_term_id="OBO:EOM_0000017",
            morphology_term_label="Micrognathia",
            morphology_term_url="https://elementsofmorphology.nih.gov/index.cgi?tid=17",
            objective_definition="Apparent reduction in mandible size",
            subjective_definition="The jaw looks small.",
            comments="A note on usage",
            synonyms="small jaw; little mandible",
            replaces="former term; old jaw",
            small_figure_url="https://elementsofmorphology.nih.gov/images/s17.png",
            large_figure_url="https://elementsofmorphology.nih.gov/images/l17.png",
        ),
        # bare term: only the unconditional decorations
        _view_row(
            morphology_term_id="OBO:EOM_0000020",
            morphology_term_label="Smooth philtrum",
        ),
        "",
    ]
)

MAP = "\n".join(
    [
        "morphology_term_id\tmorphology_term_label\tHP ID\tHP Label\tNotes",
        "OBO:EOM_0000017\tMicrognathia\tHP_0000347\tMicrognathia\t",
        "OBO:EOM_0000020\tSmooth philtrum\tMP_0000001\tnot hp\t",  # skipped
        "",
    ]
)

GOLDEN = """
OBO:EOM_0000017 a owl:Class ;
    rdfs:label "Micrognathia" ;
    rdfs:subClassOf biolink:PhenotypicFeature ;
    biolink:category biolink:PhenotypicFeature ;
    IAO:0000115 "Apparent reduction in mandible size.  The jaw looks small." ;
    rdfs:comment "A note on usage" ;
    OIO:hasExactSynonym "small jaw", "little mandible" ;
    OIO:hasRelatedSynonym "former term", " old jaw" ;
    foaf:depiction <https://elementsofmorphology.nih.gov/images/s17.png>,
                   <https://elementsofmorphology.nih.gov/images/l17.png> ;
    foaf:page <https://elementsofmorphology.nih.gov/index.cgi?tid=17> ;
    owl:equivalentClass HP:0000347 .
HP:0000347 a owl:Class .

OBO:EOM_0000020 a owl:Class ;
    rdfs:label "Smooth philtrum" ;
    rdfs:subClassOf biolink:PhenotypicFeature ;
    biolink:category biolink:PhenotypicFeature ;
    IAO:0000115 "  " .
"""


@pytest.fixture(scope="module")
def eom_graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("eom_golden_raw")
    src = get_pipeline("eom")
    (raw / src.files["tables"].file).write_text(VIEW)
    (raw / src.files["map"].file).write_text(MAP)
    return src.transform(spark, str(raw)).cache()


def test_full_graph_matches_reference_trace(spark, eom_graph):
    # compare at EXPANDED-IRI level: the turtle parser curie-compresses the
    # EOM page url (EOM:17) while the engine carries the raw IRI — both
    # serialize identically, so expansion is the canonical space
    from dipper_spark.core.curie import CurieMap

    reg = CurieMap()

    def spo(df):
        return {
            (
                reg.expand_str(r.subject),
                reg.expand_str(r.predicate),
                r.object if r.is_literal else reg.expand_str(r.object),
            )
            for r in df.collect()
        }

    expected = triples_from_turtle(spark, GOLDEN)
    got, want = spo(eom_graph), spo(expected)
    assert want - got == set(), sorted(want - got)
    assert got - want == set(), sorted(got - want)


def test_urls_are_iris_not_literals(eom_graph):
    urls = eom_graph.filter(
        F.col("predicate").isin("foaf:depiction", "foaf:page")
    )
    assert urls.count() == 3
    assert urls.filter(F.col("is_literal")).count() == 0


def test_non_hp_mapping_skipped(eom_graph):
    assert eom_graph.filter(F.col("object").contains("MP_")).count() == 0
    assert eom_graph.filter(
        (F.col("subject") == "OBO:EOM_0000020")
        & (F.col("predicate") == "owl:equivalentClass")
    ).count() == 0
