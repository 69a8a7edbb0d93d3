"""OMIM: mimTitles prefix typing + MOVED-TO repair, morbidmap disorder regex
+ bracket dispatch + phene-key ECO (reference OMIMSource.py:160-236,
OMIM.py:513-708)."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline

TITLES = "\n".join(
    [
        "# Copyright (c) 1966-2020",
        "# Generated: 2020-01-01",
        "# Prefix\tMIM Number\tPreferred Title; symbol\tAlternative Title(s); symbol(s)\tIncluded Title(s); symbols",
        "Asterisk\t609577\tCULLIN 7; CUL7\t\t",
        "Number Sign\t273750\t3-M SYNDROME 1; 3M1\t\t",
        "Percent\t104000\tALOPECIA AREATA 1; AA1\t\t",
        "Plus\t100640\tALDEHYDE DEHYDROGENASE 1 FAMILY, MEMBER A1; ALDH1A1\t\t",
        "Caret\t100500\tMOVED TO 200150\t\t",
        "Caret\t100650\tMOVED TO {100640} AND 609577\t\t",
        "NULL\t100070\tAORTIC ANEURYSM, FAMILIAL ABDOMINAL\t\t",
        "# comment at end",
        "",
    ]
)

MORBID = "\n".join(
    [
        "# Copyright (c) 1966-2020",
        "# Generated: 2016-04-11",
        "# See end of file.",
        "# Phenotype\tGene Symbols\tMIM Number\tCyto Location",
        "3-M syndrome 1, 273750 (3)\tCUL7, 3M1\t609577\t6p21.1",
        "Alopecia areata 1 (2)\tAA1\t104000\t18p11.3-p11.2",
        "{Diabetes mellitus, susceptibility to}, 125853 (3)\tX\t609577\t1p1",
        "[Euthyroidal hyperthyroxinemia], 145680 (1)\tY\t609577\t2p2",
        "# comments at the end",
        "",
    ]
)


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("omim_raw")
    src = get_pipeline("omim")
    (raw / src.files["mimtitles"].file).write_text(TITLES)
    (raw / src.files["morbidmap"].file).write_text(MORBID)
    return src.transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


class TestTitles:
    def test_gene_typed_with_abbrev_label(self, graph):
        t = _spo(graph.filter(F.col("subject") == "OMIM:609577"))
        assert ("OMIM:609577", "rdf:type", "SO:0000704") in t
        assert ("OMIM:609577", "rdfs:label", "CUL7") in t  # abbrev, not full title
        assert ("OMIM:609577", "OIO:hasExactSynonym", "CULLIN 7; CUL7") in t

    def test_phenotype_keeps_full_label(self, graph):
        t = _spo(graph.filter(F.col("subject") == "OMIM:273750"))
        assert ("OMIM:273750", "rdfs:label", "3-M SYNDROME 1") in t
        assert ("OMIM:273750", "rdf:type", "SO:0000704") not in t

    def test_moved_simple(self, graph):
        t = _spo(graph.filter(F.col("subject") == "OMIM:100500"))
        assert ("OMIM:100500", "owl:deprecated", "true") in t
        assert ("OMIM:100500", "IAO:0100001", "OMIM:200150") in t

    def test_moved_malformed_braces_repaired(self, graph):
        t = _spo(graph.filter(F.col("subject") == "OMIM:100650"))
        assert ("OMIM:100650", "IAO:0100001", "OMIM:100640") in t


class TestMorbidmap:
    def test_causal_assoc_with_eco(self, graph):
        t = _spo(graph)
        assert ("OMIM:609577", "RO:0003303", "OMIM:273750") in t
        # phene key 3 → sequencing assay evidence, on the reified assoc
        eco = {o for _, p, o in t if p == "RO:0002558"}
        assert "ECO:0000220" in eco and "ECO:0000177" in eco and "ECO:0000306" in eco

    def test_nogene_row_gets_anonymous_feature(self, graph):
        t = _spo(graph.filter(F.col("object") == "OMIM:104000"))
        assert ("_:feature104000", "RO:0003303", "OMIM:104000") in t

    def test_brace_is_susceptibility(self, graph):
        t = _spo(graph)
        assert ("OMIM:609577", "RO:0002326", "OMIM:125853") in t

    def test_bracket_is_marker(self, graph):
        t = _spo(graph)
        assert ("OMIM:609577", "RO:0002607", "OMIM:145680") in t
