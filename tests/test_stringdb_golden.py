"""STRING reference-test port (/root/reference/tests/test_string.py).

The reference's StringTestFakeData feeds two fake link rows through
``_process_protein_links`` with the live-Ensembl protein→gene map; here the
map is the staged biomart fixture with the same two real mappings
(ENSP00000000233→ENSG00000004059/ARF5, ENSP00000003084→ENSG00000001626/
CFTR) and the expected graph is the reference's own triple block
(test_string.py:59-63):

- orientation: protein1 < protein2 → gene1 is PROTEIN2's gene
  (StringDB.py:200-208 'keep orientation the same'), so the single edge is
  CFTR-gene → interacts_with → ARF5-gene plus both gene typings;
- a deprecated protein id absent from the map drops the whole row
  (test_string.py:67-80 expects an EMPTY graph).
"""

import gzip

import pytest
from pyspark.sql import functions as F

from dipper_spark.core.triples import graph_diff
from dipper_spark.io.turtle_parse import triples_from_turtle
from dipper_spark.sources import get_pipeline

LINK_HEADER = (
    "protein1 protein2 neighborhood fusion cooccurence coexpression "
    "experimental database textmining combined_score"
)

# test_set_1 (test_string.py:16-18)
LINKS_OK = "\n".join(
    [
        LINK_HEADER,
        "9606.ENSP00000000233 9606.ENSP00000003084 0 0 0 0 300 0 150 800",
        "",
    ]
)

# test_set_2 (test_string.py:21-23): ENSP00000006101 is deprecated —
# absent from the ensembl biomart export
LINKS_DEPRECATED = "\n".join(
    [
        LINK_HEADER,
        "9606.ENSP00000000233 9606.ENSP00000006101 0 0 0 0 300 0 150 800",
        "",
    ]
)

P2G = "\n".join(
    [
        "ENSP00000000233\tENSG00000004059",
        "ENSP00000003084\tENSG00000001626",
        "",
    ]
)

GOLDEN = """
ENSEMBL:ENSG00000001626 RO:0002434 ENSEMBL:ENSG00000004059 .
ENSEMBL:ENSG00000001626 a SO:0000704 .
ENSEMBL:ENSG00000004059 a SO:0000704 .
"""


def _stage(tmp_path, links: str) -> str:
    src = get_pipeline("stringdb")
    with gzip.open(tmp_path / src.files["links"].file, "wt") as fh:
        fh.write(links)
    (tmp_path / src.files["ensembl_p2g"].file).write_text(P2G)
    return str(tmp_path)


def test_fake_dataset_1_matches_reference_triples(spark, tmp_path):
    graph = get_pipeline("stringdb").transform(spark, _stage(tmp_path, LINKS_OK))
    expected = triples_from_turtle(spark, GOLDEN)
    only_engine, only_golden = graph_diff(graph, expected)
    assert only_golden.isEmpty(), [tuple(r) for r in only_golden.collect()]
    assert only_engine.isEmpty(), [tuple(r) for r in only_engine.collect()]


def test_fake_dataset_2_deprecated_protein_empty_graph(spark, tmp_path):
    graph = get_pipeline("stringdb").transform(
        spark, _stage(tmp_path, LINKS_DEPRECATED)
    )
    assert graph.count() == 0


def test_below_threshold_filtered(spark, tmp_path):
    low = LINKS_OK.replace(" 800", " 700")  # score must be > 700, not >=
    graph = get_pipeline("stringdb").transform(spark, _stage(tmp_path, low))
    assert graph.count() == 0
