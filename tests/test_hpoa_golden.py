"""HPOA full-graph goldens — the M2 flagship slice, pinned end-to-end.

The reference's own test (/root/reference/tests/test_hpoa.py) is an
assertion-free SourceTestCase shell, so there is no shipped golden to port.
The expected graph below is instead hand-traced row-by-row from
HPOAnnotations._process_phenotype_hpoa (HPOAnnotations.py:162-332) with the
association-id digests recomputed by the reference's own algorithm
(Association.make_association_id / GraphUtils.digest_id:
``'MONARCH:b' + sha1('+'.join([definedby, sub, rel, obj, *attrs]))[1:20]``
with None attributes filtered but EMPTY STRINGS KEPT, Association.py:282-288)
— so every node id in the golden turtle is reference-derived, not
engine-derived.

Deliberate divergences from the reference (documented, not ported):
- unknown-aspect rows: the reference's else-branch (py:261-263) leaves the
  PREVIOUS iteration's ``assoc`` in scope and then decorates it — a
  row-order-dependent bug.  Here the row contributes exactly its
  pre-dispatch class declarations (disease/evidence/onset) and nothing
  else.
"""

import hashlib

import pytest

from dipper_spark.core.triples import graph_diff
from dipper_spark.io.turtle_parse import triples_from_turtle
from dipper_spark.sources import get_pipeline


def ref_assoc_id(*parts):
    """Bit-compatible reimplementation of the reference's id digest chain
    (D2PAssoc.make_d2p_id → Association.make_association_id →
    GraphUtils.digest_id) used to PIN expected node ids independently of
    the engine under test.  None parts are filtered; '' parts are kept."""
    wordage = "+".join([p for p in parts if p is not None])
    return "MONARCH:b" + hashlib.sha1(wordage.encode("utf-8")).hexdigest()[1:20]


FIXTURE = "\n".join(
    [
        "#description: HPO annotations",
        "#date: 2024-01-01",
        "#tracker: https://example.org/tracker",
        "#HPO-version: http://purl.obolibrary.org/obo/hp/releases/2024-01-01",
        "\t".join(
            ["#DatabaseID", "DiseaseName", "Qualifier", "HPO_ID", "Reference",
             "Evidence", "Onset", "Frequency", "Sex", "Modifier", "Aspect",
             "Biocuration"]
        ),
        # A: P aspect, onset+frequency curies, two pubs (PMID + OMIM→url), female
        "\t".join(
            ["OMIM:119600", "Some disease", "", "HP:0001763",
             "PMID:12345;OMIM:119600", "PCS", "HP:0003577", "HP:0040283",
             "FEMALE", "", "P", "HPO:probinson"]
        ),
        # B: NOT-qualified → dropped entirely (HPOAnnotations.py:225-226)
        "\t".join(
            ["OMIM:119600", "Some disease", "NOT", "HP:0009999", "PMID:999",
             "IEA", "", "", "", "", "P", ""]
        ),
        # C: I aspect (inheritance) → has-disposition, NO onset/freq in the
        #    id digest (D2PAssoc built with onset=None/frequency=None)
        "\t".join(
            ["ORPHA:93400", "Other disease", "", "HP:0000006", "PMID:777",
             "TAS", "", "", "", "", "I", ""]
        ),
        # D: M aspect whose ONLY Reference is malformed → the association
        #    star is never emitted (add_association_to_graph lives inside
        #    the valid-pub loop, py:280-327); classes + the sex triple (on
        #    the dangling assoc id) still appear
        "\t".join(
            ["OMIM:120160", "Third disease", "", "HP:0000252", "not a curie",
             "IEA", "", "", "MALE", "", "M", ""]
        ),
        # E: C aspect with a nonempty Onset: the onset CLASS is declared
        #    (pre-dispatch, py:244-245) but the assoc carries no onset and
        #    its id digest excludes it; two web-page pubs incl. DECIPHER
        "\t".join(
            ["DECIPHER:1", "Decipher syndrome", "", "HP:0003593",
             "DECIPHER:1;https://decipher.sanger.ac.uk", "ICE", "HP:0011463",
             "", "", "", "C", ""]
        ),
        # F: unknown aspect 'X' → no association (see module docstring);
        #    contributes ONLY disease + evidence + onset classes
        "\t".join(
            ["OMIM:120160", "Third disease", "", "HP:0032322", "PMID:3333",
             "ITM", "HP:0025709", "", "", "", "X", ""]
        ),
        # G: P aspect with a free-text frequency → LITERAL object on the
        #    assoc node, and the '' onset is KEPT in the id digest
        "\t".join(
            ["OMIM:119600", "Some disease", "", "HP:0003828", "PMID:22222",
             "TAS", "", "1/2", "", "", "P", ""]
        ),
        "",
    ]
)

# reference-derived association ids (definedby = source name 'hpoa',
# HPOAnnotations.py:248)
A_ID = ref_assoc_id("hpoa", "OMIM:119600", "RO:0002200", "HP:0001763",
                    "HP:0003577", "HP:0040283")
C_ID = ref_assoc_id("hpoa", "ORPHA:93400", "RO:0000091", "HP:0000006")
D_ID = ref_assoc_id("hpoa", "OMIM:120160", "RO:0002200", "HP:0000252", "", "")
E_ID = ref_assoc_id("hpoa", "DECIPHER:1", "RO:0000091", "HP:0003593")
G_ID = ref_assoc_id("hpoa", "OMIM:119600", "RO:0002200", "HP:0003828", "", "1/2")

GOLDEN = f"""
# ---- row A: full P-aspect association --------------------------------
OMIM:119600 RO:0002200 HP:0001763 .
{A_ID} a OBAN:association ;
    OBAN:association_has_subject OMIM:119600 ;
    OBAN:association_has_predicate RO:0002200 ;
    OBAN:association_has_object HP:0001763 ;
    RO:0002558 ECO:0000269 ;
    RO:0002488 HP:0003577 ;
    RO:0003306 HP:0040283 ;
    :has_sex_specificity PATO:0000383 ;
    dc:source PMID:12345, <http://omim.org/entry/119600> .
PMID:12345 a IAO:0000013 .
<http://omim.org/entry/119600> a SIO:000302 .
OMIM:119600 a owl:Class .
HP:0001763 a owl:Class .
ECO:0000269 a owl:Class .
HP:0003577 a owl:Class .

# ---- row C: I-aspect → has-disposition -------------------------------
ORPHA:93400 RO:0000091 HP:0000006 .
{C_ID} a OBAN:association ;
    OBAN:association_has_subject ORPHA:93400 ;
    OBAN:association_has_predicate RO:0000091 ;
    OBAN:association_has_object HP:0000006 ;
    RO:0002558 ECO:0000304 ;
    dc:source PMID:777 .
PMID:777 a IAO:0000013 .
ORPHA:93400 a owl:Class .
HP:0000006 a owl:Class .
ECO:0000304 a owl:Class .

# ---- row D: no valid pub → classes + dangling sex triple only --------
{D_ID} :has_sex_specificity PATO:0000384 .
OMIM:120160 a owl:Class .
HP:0000252 a owl:Class .
ECO:0000501 a owl:Class .

# ---- row E: C-aspect, onset class declared but not on the assoc ------
DECIPHER:1 RO:0000091 HP:0003593 .
{E_ID} a OBAN:association ;
    OBAN:association_has_subject DECIPHER:1 ;
    OBAN:association_has_predicate RO:0000091 ;
    OBAN:association_has_object HP:0003593 ;
    RO:0002558 ECO:0000305 ;
    dc:source DECIPHER:1, <https://decipher.sanger.ac.uk> .
DECIPHER:1 a SIO:000302 .
<https://decipher.sanger.ac.uk> a SIO:000302 .
DECIPHER:1 a owl:Class .
HP:0003593 a owl:Class .
ECO:0000305 a owl:Class .
HP:0011463 a owl:Class .

# ---- row F: unknown aspect → pre-dispatch classes only ---------------
ECO:0000246 a owl:Class .
HP:0025709 a owl:Class .

# ---- row G: free-text frequency is a literal -------------------------
OMIM:119600 RO:0002200 HP:0003828 .
{G_ID} a OBAN:association ;
    OBAN:association_has_subject OMIM:119600 ;
    OBAN:association_has_predicate RO:0002200 ;
    OBAN:association_has_object HP:0003828 ;
    RO:0002558 ECO:0000304 ;
    RO:0003306 "1/2" ;
    dc:source PMID:22222 .
PMID:22222 a IAO:0000013 .
HP:0003828 a owl:Class .
"""


@pytest.fixture(scope="module")
def hpoa_graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("hpoa_golden_raw")
    (raw / "phenotype.hpoa").write_text(FIXTURE)
    return get_pipeline("hpoa").transform(spark, str(raw)).cache()


def test_full_graph_matches_reference_trace(spark, hpoa_graph):
    expected = triples_from_turtle(spark, GOLDEN)
    only_engine, only_golden = graph_diff(hpoa_graph, expected)
    assert only_golden.isEmpty(), [tuple(r) for r in only_golden.collect()]
    assert only_engine.isEmpty(), [tuple(r) for r in only_engine.collect()]


def test_assoc_id_digest_definedby_is_source_name(hpoa_graph):
    # the id hash input starts with the SOURCE name ('hpoa'), not the
    # 'MONARCH' curie prefix of the minted id — a D2PAssoc is constructed
    # with definedby=self.name (HPOAnnotations.py:248)
    subjects = {r.subject for r in hpoa_graph.collect()}
    assert A_ID in subjects
    wrong = ref_assoc_id("MONARCH", "OMIM:119600", "RO:0002200", "HP:0001763",
                         "HP:0003577", "HP:0040283")
    assert wrong not in subjects


def test_ic_aspect_digest_excludes_empty_attrs(hpoa_graph):
    # I/C rows hash WITHOUT onset/frequency (None → filtered); P/M rows
    # hash WITH them even when empty ('' → kept) — D_ID vs C_ID shapes
    subjects = {r.subject for r in hpoa_graph.collect()}
    assert C_ID in subjects
    with_empty = ref_assoc_id("hpoa", "ORPHA:93400", "RO:0000091", "HP:0000006", "", "")
    assert with_empty not in subjects
