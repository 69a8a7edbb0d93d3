"""MMRRC full-graph golden — reference-traced.

The reference's own test (/root/reference/tests/test_mmrrc.py) is an
assertion-free SourceTestCase shell, so the expected graph below is
hand-traced from MMRRC.py ``_process_phenotype_data`` (:109-426):

- per-row: holding-center suffix stripped (MMRRC:036933-UNC → :036933,
  :181-184); MG:→MGI: allele repair (:192-203); GeneID:→NCBIGene: +
  NULL scrub (:215-223); ``label [MP:nnnnnnn]`` phenotype parse
  (:240-248); PMID list despaced (:250-259); mouse taxon class re-declared
  every row (:265); strain individual typed mouse (stem cell when STATE
  is ES) with 'Research Areas: ...' description and clique-leader
  (:266-279); allele→MP G2PAssoc with every row PMID as dc:source
  (:282-295); rows whose GENE_NAME is 'withdrawn' skipped entirely
  (:174-176); phenotypes on allele-less rows still declare the MP class
  but hang no association (:283,296-299);
- per-strain build (:311-412): variant loci typed GENO:0000002 with the
  allele-of edge ONLY for 1-variant/1-gene strains; multi-variant strains
  re-add each locus with the DEFAULT allele typing (bare addAllele,
  :328-329); gene-only strains mint ``digest('<gene-noclon>-VL')`` bnode
  loci labeled '<symbol><?>' and declare the gene class (addGene →
  subClassOf SO:0000704); per-locus VSLC ``digest('<vl-noclon>U')`` with
  indeterminate zygosity; GVC only when >1 VSLC (double digest of the
  python list-repr of the vslc curie list, :368-380); unspecified
  genomic background ``digest('GENO0000649-<strain-noclon>')`` with
  taxon; genotype id ``<gvc>-GENO0000649-<strain-noclon>`` typed
  intrinsic genotype (GENO:0000719), label '<gvc label> [n.s.]', linked
  from the strain via has_genotype.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from dipper_spark.core.triples import graph_diff
from dipper_spark.io.turtle_parse import triples_from_turtle
from dipper_spark.sources import get_pipeline

COLS = (
    "STRAIN/STOCK_ID,STRAIN/STOCK_DESIGNATION,STRAIN_TYPE,STATE,"
    "MGI_ALLELE_ACCESSION_ID,ALLELE_SYMBOL,ALLELE_NAME,MUTATION_TYPE,"
    "CHROMOSOME,MGI_GENE_ACCESSION_ID,GENE_SYMBOL,GENE_NAME,SDS_URL,"
    "ACCEPTED_DATE,MPT_IDS,PUBMED_IDS,RESEARCH_AREAS"
)

CSV = "\n".join(
    [
        COLS,
        # A: 1 variant + 1 gene, MG: typo repair, 2 phenotypes, 2 pmids
        '"MMRRC:036933-UNC","B6.129P2-Apoe<tm1Unc>/J","MSR","SC",'
        '"MG:1856155","Apoe<tm1Unc>","targeted mutation 1","TM","7",'
        '"MGI:88057","Apoe","apolipoprotein E","","",'
        '"increased circulating cholesterol level [MP:0005178], '
        'premature death [MP:0002083]",'
        '"PMID: 8356452, PMID: 8825288","Cardiovascular"',
        # B+C: one strain with TWO variant loci (no allele-of edges)
        '"MMRRC:037372-UCD","STOCK Rln3-Rxfp3","MSR","L",'
        '"MGI:3603817","Rln3<tm1Rjs>","","TM","8",'
        '"MGI:1920632","Rln3","relaxin 3","","","","",""',
        '"MMRRC:037372-UCD","STOCK Rln3-Rxfp3","MSR","L",'
        '"MGI:5141924","Rxfp3<tm1Rjs>","","TM","15",'
        '"MGI:2682211","Rxfp3","relaxin receptor 3","","","","",""',
        # D: gene-only ES line; phenotype with NO allele → class only
        '"MMRRC:000255-MU","STOCK Abc1","ESC","ES",'
        '"","","","","",'
        '"GeneID:12345","Abc1","ATP-binding cassette 1","","",'
        '"ataxia [MP:0001393]","",""',
        # E: withdrawn gene name → row skipped entirely
        '"MMRRC:099999-XX","GONE","MSR","L",'
        '"MGI:7777777","Gone<x>","","TM","1",'
        '"MGI:666","Gone","withdrawn","","","","",""',
        "",
    ]
)


def _d(word: str) -> str:
    """dipper hash_id: 'b' + sha1[1:20] (Source.py:259-278)."""
    return "b" + hashlib.sha1(word.encode("utf-8")).hexdigest()[1:20]


def _assoc(sub: str, obj: str) -> str:
    return "MONARCH:" + _d("+".join(("mmrrc", sub, "RO:0002200", obj)))


# ---- traced ids ---------------------------------------------------------
VSLC_A = "_:" + _d("MGI1856155U")
BKGD_A = "_:" + _d("GENO0000649-MMRRC036933")
GENO_A = VSLC_A + "-GENO0000649-MMRRC036933"

VSLC_B1 = "_:" + _d("MGI3603817U")
VSLC_B2 = "_:" + _d("MGI5141924U")
GVC_B = "_:" + _d(
    _d("['" + VSLC_B1 + "', '" + VSLC_B2 + "']")  # make_id then strip _ and :
)
BKGD_B = "_:" + _d("GENO0000649-MMRRC037372")
GENO_B = GVC_B + "-GENO0000649-MMRRC037372"

VL_D = "_:" + _d("NCBIGene12345-VL")
VSLC_D = "_:" + _d(_d("NCBIGene12345-VL") + "U")
BKGD_D = "_:" + _d("GENO0000649-MMRRC000255")
GENO_D = VSLC_D + "-GENO0000649-MMRRC000255"

GOLDEN = f"""
NCBITaxon:10090 a owl:Class .

# ---- strain A: Apoe ------------------------------------------------
MMRRC:036933 a NCBITaxon:10090 ;
    rdfs:label "B6.129P2-Apoe<tm1Unc>/J" ;
    dc:description "Research Areas: Cardiovascular" ;
    MONARCH:cliqueLeader "true"^^xsd:boolean .
PMID:8356452 a IAO:0000013 .
PMID:8825288 a IAO:0000013 .
MP:0005178 a owl:Class .
MP:0002083 a owl:Class .
MGI:1856155 RO:0002200 MP:0005178, MP:0002083 .
{_assoc("MGI:1856155", "MP:0005178")} a OBAN:association ;
    OBAN:association_has_subject MGI:1856155 ;
    OBAN:association_has_predicate RO:0002200 ;
    OBAN:association_has_object MP:0005178 ;
    dc:source PMID:8356452, PMID:8825288 .
{_assoc("MGI:1856155", "MP:0002083")} a OBAN:association ;
    OBAN:association_has_subject MGI:1856155 ;
    OBAN:association_has_predicate RO:0002200 ;
    OBAN:association_has_object MP:0002083 ;
    dc:source PMID:8356452, PMID:8825288 .
MGI:1856155 a GENO:0000002 ;
    rdfs:label "Apoe<tm1Unc>" ;
    GENO:0000408 MGI:88057 .
{VSLC_A} a GENO:0000030 ;
    rdfs:label "Apoe<tm1Unc>/?" ;
    GENO:0000382 MGI:1856155 ;
    GENO:0000608 GENO:0000137 .
{BKGD_A} a GENO:0000649 ;
    rdfs:label "unspecified (MMRRC:036933)" ;
    dc:description "A placeholder for the unspecified genetic background for MMRRC:036933" ;
    RO:0002162 NCBITaxon:10090 .
{GENO_A} a GENO:0000719 ;
    rdfs:label "Apoe<tm1Unc>/? [n.s.]" ;
    GENO:0000385 {BKGD_A} ;
    GENO:0000382 {VSLC_A} .
MMRRC:036933 GENO:0000222 {GENO_A} .

# ---- strain B: two loci --------------------------------------------
MMRRC:037372 a NCBITaxon:10090 ;
    rdfs:label "STOCK Rln3-Rxfp3" ;
    MONARCH:cliqueLeader "true"^^xsd:boolean .
MGI:3603817 a GENO:0000002, GENO:0000512 ;
    rdfs:label "Rln3<tm1Rjs>" .
MGI:5141924 a GENO:0000002, GENO:0000512 ;
    rdfs:label "Rxfp3<tm1Rjs>" .
{VSLC_B1} a GENO:0000030 ;
    rdfs:label "Rln3<tm1Rjs>/?" ;
    GENO:0000382 MGI:3603817 ;
    GENO:0000608 GENO:0000137 .
{VSLC_B2} a GENO:0000030 ;
    rdfs:label "Rxfp3<tm1Rjs>/?" ;
    GENO:0000382 MGI:5141924 ;
    GENO:0000608 GENO:0000137 .
{GVC_B} a GENO:0000009 ;
    rdfs:label "Rln3<tm1Rjs>/?; Rxfp3<tm1Rjs>/?" ;
    GENO:0000382 {VSLC_B1}, {VSLC_B2} .
{BKGD_B} a GENO:0000649 ;
    rdfs:label "unspecified (MMRRC:037372)" ;
    dc:description "A placeholder for the unspecified genetic background for MMRRC:037372" ;
    RO:0002162 NCBITaxon:10090 .
{GENO_B} a GENO:0000719 ;
    rdfs:label "Rln3<tm1Rjs>/?; Rxfp3<tm1Rjs>/? [n.s.]" ;
    GENO:0000385 {BKGD_B} ;
    GENO:0000382 {GVC_B} .
MMRRC:037372 GENO:0000222 {GENO_B} .

# ---- strain D: gene-only ES line -----------------------------------
MMRRC:000255 a CL:0000034 ;
    rdfs:label "STOCK Abc1" ;
    MONARCH:cliqueLeader "true"^^xsd:boolean .
MP:0001393 a owl:Class .
NCBIGene:12345 a owl:Class ;
    rdfs:label "Abc1" ;
    rdfs:subClassOf SO:0000704 .
{VL_D} a GENO:0000002 ;
    rdfs:label "Abc1<?>" ;
    GENO:0000408 NCBIGene:12345 .
{VSLC_D} a GENO:0000030 ;
    rdfs:label "Abc1<?>/?" ;
    GENO:0000382 {VL_D} ;
    GENO:0000608 GENO:0000137 .
{BKGD_D} a GENO:0000649 ;
    rdfs:label "unspecified (MMRRC:000255)" ;
    dc:description "A placeholder for the unspecified genetic background for MMRRC:000255" ;
    RO:0002162 NCBITaxon:10090 .
{GENO_D} a GENO:0000719 ;
    rdfs:label "Abc1<?>/? [n.s.]" ;
    GENO:0000385 {BKGD_D} ;
    GENO:0000382 {VSLC_D} .
MMRRC:000255 GENO:0000222 {GENO_D} .
"""


@pytest.fixture(scope="module")
def mmrrc_graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("mmrrc_golden_raw")
    src = get_pipeline("mmrrc")
    (raw / src.files["catalog"].file).write_text(CSV)
    return src.transform(spark, str(raw)).cache()


def test_full_graph_matches_reference_trace(spark, mmrrc_graph):
    expected = triples_from_turtle(spark, GOLDEN)
    only_engine, only_golden = graph_diff(mmrrc_graph, expected)
    assert only_golden.isEmpty(), [tuple(r) for r in only_golden.collect()]
    assert only_engine.isEmpty(), [tuple(r) for r in only_engine.collect()]


def test_withdrawn_row_fully_skipped(mmrrc_graph):
    assert mmrrc_graph.filter(
        F.col("subject").contains("099999") | F.col("object").contains("Gone")
    ).count() == 0


def test_alleleless_phenotype_has_no_association(mmrrc_graph):
    # MP:0001393 is declared but appears in no association
    assert mmrrc_graph.filter(F.col("subject") == "MP:0001393").count() == 1
    assert mmrrc_graph.filter(
        (F.col("object") == "MP:0001393") & (F.col("predicate") != "rdf:type")
    ).count() == 0
