"""ClinVar end-to-end RCV goldens, driven over the reference's own fixture
XMLs (/root/reference/tests/resources/clinvar/input/RCV*.xml.gz) and
compared against its expected turtle (expected/RCV*.ttl) — the flow of
/root/reference/tests/test_clinvar.py:22-57.

Real release XML, reference-produced expected triples: this exercises the
nested-record normalization, SCV×condition association stanzas, sha1 bnode
digests, the gene-relation hack against the g2p dim, genotype sets, typed
integer literals, and the pairwise SCV significance linker all at once.

Comparison runs at the expanded-IRI level (both sides normalized through
the engine's CurieMap) with skolem genid IRIs folded back to bnodes, the
same harness as test_gwascatalog_golden.py.
"""

from __future__ import annotations

import os
import shutil

import pytest

from dipper_spark.core.curie import CurieMap
from dipper_spark.io.turtle_parse import parse_turtle
from dipper_spark.sources import get_pipeline

FIXTURES = "/root/reference/tests/resources/clinvar"
GENID = "https://monarchinitiative.org/.well-known/genid/"

RCVS = [
    "RCV000112698",
    "RCV000162061",
    "RCV000175394",
    "RCV000416376",
    "RCV000498447",
    "RCV000763295",
    "RCV000087646",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not present"
)

_CM = CurieMap()


def _term(t, is_literal):
    if is_literal:
        return ("val", t)
    if t.startswith("_:"):
        return ("bnode", t[2:])
    if "://" in t:
        iri = t
    elif ":" in t:
        iri = _CM.expand_str(t)
    else:
        return ("val", t)
    if iri.startswith(GENID):
        return ("bnode", iri[len(GENID):])
    return ("iri", iri)


def _norm_expected(ttl):
    out = set()
    for t in parse_turtle(ttl):
        out.add((
            _term(t["subject"], False),
            _term(t["predicate"], False),
            _term(t["object"], t["is_literal"]),
        ))
    return out


def _norm_graph(df):
    return {
        (_term(r.subject, False), _term(r.predicate, False), _term(r.object, r.is_literal))
        for r in df.collect()
    }


@pytest.fixture(scope="module", params=RCVS)
def rcv_case(request, spark, tmp_path_factory):
    rcv = request.param
    raw = tmp_path_factory.mktemp(f"clinvar_{rcv}")
    shutil.copy(
        os.path.join(FIXTURES, "input", f"{rcv}.xml.gz"),
        raw / f"ClinVarFullRelease_{rcv}.xml.gz",
    )
    shutil.copy(
        os.path.join(FIXTURES, "input", "gene_condition_test_set.tsv"),
        raw / "gene_condition_source_id",
    )
    got = get_pipeline("clinvar").transform(spark, str(raw))
    expected = open(os.path.join(FIXTURES, "expected", f"{rcv}.ttl")).read()
    return rcv, got, expected


def test_rcv_golden(rcv_case):
    rcv, got, expected_ttl = rcv_case
    exp = _norm_expected(expected_ttl)
    act = _norm_graph(got)
    missing = exp - act
    extra = act - exp
    assert not missing and not extra, (
        f"{rcv}: missing from engine output:\n"
        + "\n".join(map(str, sorted(missing)))
        + "\nextra in engine output:\n"
        + "\n".join(map(str, sorted(extra)))
    )
