"""ZFIN: octuple composite-key ZP join, normal-row comments, stage/source
decoration, unmapped miss metric (reference ZFIN.py:1396-1520, 2721-2826)."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline
from dipper_spark.sources.zfin import PHENO_COLUMNS

ZPMAP = "\n".join(
    [
        "iri\tid",
        "ZP:0001234\t0-0-ZFA:0000107-PATO:0000587-0-0-0",
        "ZP:0005678\tZFA:0005145-BFO:0000050-ZFA:0000107-PATO:0000462-0-0-0",
        "",
    ]
)


def _row(**kw):
    row = {c: "" for c in PHENO_COLUMNS}
    row.update(kw)
    return "\t".join(row[c] for c in PHENO_COLUMNS)


PHENO = "\n".join(
    [
        _row(**{
            "Fish ID": "ZDB-FISH-150901-29105",
            "Affected Structure or Process 1 superterm ID": "ZFA:0000107",
            "Phenotype Keyword ID": "PATO:0000587",
            "Phenotype Tag": "abnormal",
            "Start Stage ID": "ZDB-STAGE-010723-4",
            "End Stage ID": "ZDB-STAGE-010723-35",
            "Publication ID": "ZDB-PUB-990507-16",
        }),
        # normal row → comment only
        _row(**{
            "Fish ID": "ZDB-FISH-150901-29105",
            "Affected Structure or Process 1 superterm ID": "ZFA:0000107",
            "Affected Structure or Process 1 superterm Name": "brain",
            "Phenotype Keyword ID": "PATO:0000587",
            "Phenotype Keyword Name": "decreased size",
            "Phenotype Tag": "normal",
            "Publication ID": "ZDB-PUB-1",
        }),
        # unmapped octuple → dropped from assocs, visible in the miss metric
        _row(**{
            "Fish ID": "ZDB-FISH-2",
            "Affected Structure or Process 1 superterm ID": "ZFA:9999999",
            "Phenotype Keyword ID": "PATO:0000587",
            "Phenotype Tag": "abnormal",
        }),
        "",
    ]
)


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    raw = tmp_path_factory.mktemp("zfin_raw")
    src = get_pipeline("zfin")
    (raw / src.files["pheno"].file).write_text(PHENO)
    (raw / src.files["zpmap"].file).write_text(ZPMAP)
    return str(raw)


@pytest.fixture(scope="module")
def graph(spark, raw_dir):
    return get_pipeline("zfin").transform(spark, raw_dir).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_octuple_maps_to_zp(graph):
    t = _spo(graph)
    assert ("ZFIN:ZDB-FISH-150901-29105", "RO:0002200", "ZP:0001234") in t


def test_assoc_decorations(graph):
    t = _spo(graph)
    ev = [(s, o) for s, p, o in t if p == "RO:0002558"]
    assert len(ev) == 1 and ev[0][1] == "ECO:0000059"
    src = {o for _, p, o in t if p == "dc:source"}
    assert src == {"ZFIN:ZDB-PUB-990507-16"}
    # stage qualifier on the assoc node
    stages = {o for _, p, o in t if p == "BFO:0000050"}
    assert "ZFIN:ZDB-STAGE-010723-4" in stages


def test_normal_row_is_comment(graph):
    c = graph.filter(F.col("predicate") == "rdfs:comment").collect()
    assert len(c) == 1
    assert c[0].subject == "ZFIN:ZDB-FISH-150901-29105"
    assert "Normal phenotype observed: brain+decreased size" in c[0].object
    # and no assoc for it beyond the abnormal one
    assert graph.filter(F.col("predicate") == "RO:0002200").count() == 1


def test_unmapped_miss_metric(spark, raw_dir):
    miss = get_pipeline("zfin").unmapped_octuples(spark, raw_dir)
    rows = miss.collect()
    assert len(rows) == 1
    assert rows[0].fish_curie == "ZFIN:ZDB-FISH-2"
