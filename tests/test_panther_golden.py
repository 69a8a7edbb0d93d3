"""Panther full-graph golden — reference-traced.

The reference's own test (/root/reference/tests/test_panther.py) is an
assertion-free SourceTestCase shell; the expected graph below is
hand-traced from Panther._process_orthologs (Panther.py:196-285):
gene-id cleanup (`MGI=MGI=` collapse, Ensembl→ENSEMBL), orthology-type
resolve (panther.yaml LDO/P → RO:HOM terms), OrthologyAssoc with
phylogenetic evidence (no source), gene typing + in-taxon facts, and the
gene-family group (OrthologyAssoc.add_gene_family_to_graph →
Family.addMember: family --RO:0002351 has member--> gene, family typed
EDAM-DATA:3148 with no NamedIndividual).  Association ids recomputed with
the reference digest (definedby = 'panther', Panther.py:254)."""

import hashlib

import pytest

from dipper_spark.core.triples import graph_diff
from dipper_spark.io.turtle_parse import triples_from_turtle
from dipper_spark.sources import get_pipeline


def ref_assoc_id(*parts):
    wordage = "+".join([p for p in parts if p is not None])
    return "MONARCH:b" + hashlib.sha1(wordage.encode("utf-8")).hexdigest()[1:20]


FIXTURE = "\n".join(
    [
        # LDO ortholog pair with the MGI=MGI= collapse
        "\t".join(["HUMAN|Ensembl=ENSG00000184730|UniProtKB=Q0VD83",
                   "MOUSE|MGI=MGI=2176230|UniProtKB=Q8VBT6",
                   "LDO", "Euarchontoglires", "PTHR12434"]),
        # within-species paralog pair
        "\t".join(["HUMAN|GeneID=1234|UniProtKB=P1",
                   "HUMAN|GeneID=5678|UniProtKB=P2",
                   "P", "Hominidae", "PTHR99999"]),
        "",
    ]
)

A1 = ref_assoc_id("panther", "ENSEMBL:ENSG00000184730", "RO:HOM0000020", "MGI:2176230")
A2 = ref_assoc_id("panther", "NCBIGene:1234", "RO:HOM0000011", "NCBIGene:5678")

GOLDEN = f"""
# ---- LDO pair --------------------------------------------------------
ENSEMBL:ENSG00000184730 RO:HOM0000020 MGI:2176230 .
{A1} a OBAN:association ;
    OBAN:association_has_subject ENSEMBL:ENSG00000184730 ;
    OBAN:association_has_predicate RO:HOM0000020 ;
    OBAN:association_has_object MGI:2176230 ;
    RO:0002558 ECO:0000080 .
ENSEMBL:ENSG00000184730 a SO:0000704 ;
    RO:0002162 NCBITaxon:9606 .
MGI:2176230 a SO:0000704 ;
    RO:0002162 NCBITaxon:10090 .
PANTHER:PTHR12434 a EDAM-DATA:3148 ;
    RO:0002351 ENSEMBL:ENSG00000184730, MGI:2176230 .

# ---- paralog pair ----------------------------------------------------
NCBIGene:1234 RO:HOM0000011 NCBIGene:5678 .
{A2} a OBAN:association ;
    OBAN:association_has_subject NCBIGene:1234 ;
    OBAN:association_has_predicate RO:HOM0000011 ;
    OBAN:association_has_object NCBIGene:5678 ;
    RO:0002558 ECO:0000080 .
NCBIGene:1234 a SO:0000704 ;
    RO:0002162 NCBITaxon:9606 .
NCBIGene:5678 a SO:0000704 ;
    RO:0002162 NCBITaxon:9606 .
PANTHER:PTHR99999 a EDAM-DATA:3148 ;
    RO:0002351 NCBIGene:1234, NCBIGene:5678 .
"""


@pytest.fixture(scope="module")
def panther_graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("panther_golden_raw")
    (raw / "RefGenomeOrthologs.tsv").write_text(FIXTURE)
    return get_pipeline("panther").transform(spark, str(raw)).cache()


def test_full_graph_matches_reference_trace(spark, panther_graph):
    expected = triples_from_turtle(spark, GOLDEN)
    only_engine, only_golden = graph_diff(panther_graph, expected)
    assert only_golden.isEmpty(), [tuple(r) for r in only_golden.collect()]
    assert only_engine.isEmpty(), [tuple(r) for r in only_engine.collect()]


def test_assoc_id_digest_definedby_is_source_name(panther_graph):
    subjects = {r.subject for r in panther_graph.collect()}
    assert A1 in subjects and A2 in subjects
    wrong = ref_assoc_id("MONARCH", "ENSEMBL:ENSG00000184730", "RO:HOM0000020",
                         "MGI:2176230")
    assert wrong not in subjects
