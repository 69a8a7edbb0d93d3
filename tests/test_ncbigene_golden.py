"""NCBIGene full-graph golden — reference-traced.

The reference's own test (/root/reference/tests/test_ncbi.py) is an
assertion-free SourceTestCase shell, so the expected graph below is
hand-traced from NCBIGene.py:

- per-taxon preamble (``_get_gene_info`` :212-218): the
  ``_:NCBITaxon:<tax>genome`` bnode class (numeric "<tax> genome" label —
  Genotype.addGenome's double-prefixed lookup never hits the translation
  table, Genotype.py:529-545) + bare taxon class;
- gene stanzas (:283-308): addClassToGraph's type is a SUBCLASS edge and
  its description lands on dc:description — gated ONLY on None/'' at
  Model.py:121, so the gene_info "-" placeholder IS emitted (unlike
  name/synonyms/other_designations which are != '-' guarded at
  NCBIGene.py:293-311); sequence
  features become individuals typed ONLY SO:0000110 (:273-289);
- dbxref dispatch (``_add_gene_equivalencies`` :404-494): de-stutter,
  MIM→OMIM rename, HPRD→gene product, ENSEMBL→loose xref, the OMIM
  gene-type gate with moved-to replacement ("last gene wins", :460-467),
  clique-leader designation from resources/clique_leader.yaml (:483-489);
- placement (:343-399): multi-chromosome rows are rejected with
  ``continue`` — which ALSO skips that row's trailing addTaxon (:400);
  X|Y PAR explodes; addChromosomeClass emits class+label+subClassOf
  chromosome (Genotype.py:617-625) plus the "chr<N> (<tax>)" exact
  synonym (:369-372); a band Feature with no coords is just the
  NamedIndividual declaration (GenomicFeature.py:160-172);
- history (:495-586): class-vs-individual branch resolved through
  gene_info's class_or_indiv verdict; old symbol → EXACT synonym (:583);
- gene2pubmed (:588-667): gene re-declared, publication typed
  NamedIndividual AND journal article, is_about edge.

Deliberate divergence (documented in sources/ncbigene.py:chrom_id): the
reference spells chromosome ids in the 'CHR' OBO namespace; this repo uses
the base-namespace ``:<tax>chr<n>`` convention shared with UCSCBands so
cross-source placement joins land on the same nodes.
"""

import gzip

import pytest
from pyspark.sql import functions as F

from dipper_spark.core.triples import graph_diff
from dipper_spark.io.turtle_parse import triples_from_turtle
from dipper_spark.sources import get_pipeline

INFO_COLS = get_pipeline("ncbigene").files["gene_info"].columns


def _info_row(**kw):
    row = {c: "-" for c in INFO_COLS}
    row.update(kw)
    return "\t".join(row[c] for c in INFO_COLS)


GENE_INFO = "\n".join(
    [
        "#" + "\t".join(INFO_COLS),
        # A: human protein-coding class, every decoration + band placement,
        #    gene-typed OMIM, HGNC de-stutter + human clique leader, HPRD,
        #    ENSEMBL loose xref, Vega filtered
        _info_row(
            tax_id="9606", GeneID="3586", Symbol="IL10", Synonyms="CSIF|TGIF",
            dbXrefs="MIM:124092|HGNC:HGNC:5962|Ensembl:ENSG00000136634"
                    "|HPRD:00542|Vega:OTTHUMG2",
            chromosome="1", map_location="1q32.1", description="interleukin 10",
            type_of_gene="protein-coding",
            Full_name_from_nomenclature_authority="interleukin 10",
            Other_designations="CSIF-10",
        ),
        # B: phenotype-typed OMIM dropped; moved-to OMIM replaced by its
        #    gene-typed target
        _info_row(
            tax_id="9606", GeneID="100", Symbol="ADA",
            dbXrefs="MIM:102700|MIM:608958",
            chromosome="20", map_location="20q13.12", type_of_gene="protein-coding",
        ),
        # C: mouse sequence feature → individual; bare-chromosome placement
        _info_row(
            tax_id="10090", GeneID="212390", Symbol="Gm5801",
            chromosome="13", map_location="13", type_of_gene="unknown",
        ),
        # D: X|Y PAR explode, non-band maploc → chromosome level on both
        _info_row(
            tax_id="9606", GeneID="438", Symbol="ASMT", chromosome="X|Y",
            map_location="Xp22.3; Yp11.3", type_of_gene="protein-coding",
        ),
        # E: NEWENTRY (no label) + ambiguous multi-chrom → placement AND
        #    taxon skipped (the reference `continue` ejects both)
        _info_row(
            tax_id="7955", GeneID="619538", Symbol="NEWENTRY",
            chromosome="10|19|3", type_of_gene="protein-coding",
        ),
        # F: unconfigured taxon → filtered
        _info_row(tax_id="4932", GeneID="999", Symbol="YAL1", type_of_gene="protein-coding"),
        "",
    ]
)

HIST = "\n".join(
    [
        "#tax_id\tGeneID\tDiscontinued_GeneID\tDiscontinued_Symbol\tDiscontinue_Date",
        "9606\t3586\t45\tIL10-OLD\t20050510",     # survivor is a class
        "10090\t212390\t46\tGm-OLD\t20050510",    # survivor is an INDIVIDUAL
        "9606\t-\t47\tGONE\t20050510",            # no replacement → dropped
        "4932\t7\t48\tYEAST\t20050510",           # taxon filtered
        "",
    ]
)

G2P = "\n".join(
    [
        "#tax_id\tGeneID\tPubMed_ID",
        "9606\t3586\t12345",
        "10090\t212390\t777",
        "4932\t999\t1",
        "",
    ]
)

MIM_TITLES = "\n".join(
    [
        "# Copyright (c) 1966-2024 Johns Hopkins University",
        "# Prefix\tMIM Number\tPreferred Title; symbol\tAlternative Title(s); symbol(s)\tIncluded Title(s); symbols",
        "Asterisk\t124092\tINTERLEUKIN 10; IL10\t\t",
        "Number Sign\t102700\tSEVERE COMBINED IMMUNODEFICIENCY\t\t",
        "Caret\t608958\tMOVED TO 602450\t\t",
        "Asterisk\t602450\tADENOSINE DEAMINASE; ADA\t\t",
        "",
    ]
)

GOLDEN = """
# ---- per-taxon preamble ---------------------------------------------
_:NCBITaxon:9606genome a owl:Class ; rdfs:label "9606 genome" ;
    rdfs:subClassOf SO:0001026 .
_:NCBITaxon:10090genome a owl:Class ; rdfs:label "10090 genome" ;
    rdfs:subClassOf SO:0001026 .
_:NCBITaxon:7955genome a owl:Class ; rdfs:label "7955 genome" ;
    rdfs:subClassOf SO:0001026 .
NCBITaxon:9606 a owl:Class .
NCBITaxon:10090 a owl:Class .
NCBITaxon:7955 a owl:Class .

# ---- A: IL10 --------------------------------------------------------
NCBIGene:3586 a owl:Class ;
    rdfs:label "IL10" ;
    rdfs:subClassOf SO:0001217 ;
    dc:description "interleukin 10" ;
    OIO:hasExactSynonym "interleukin 10", "IL10-OLD" ;
    OIO:hasRelatedSynonym "CSIF", "TGIF", "CSIF-10" ;
    RO:0002162 NCBITaxon:9606 ;
    RO:0002205 HPRD:00542 ;
    OIO:hasDbXref ENSEMBL:ENSG00000136634, OMIM:124092 ;
    owl:equivalentClass OMIM:124092, HGNC:5962 ;
    RO:0002525 :9606chr1q32.1 .
HGNC:5962 MONARCH:cliqueLeader "true"^^xsd:boolean .
:9606chr1 a owl:Class ; rdfs:label "chr1" ; rdfs:subClassOf SO:0000340 ;
    OIO:hasExactSynonym "chr1 (9606)" .
:9606chr1q32.1 a owl:NamedIndividual .

# ---- B: ADA (OMIM gate) --------------------------------------------
NCBIGene:100 a owl:Class ;
    rdfs:label "ADA" ;
    dc:description "-" ;
    rdfs:subClassOf SO:0001217 ;
    RO:0002162 NCBITaxon:9606 ;
    OIO:hasDbXref OMIM:602450 ;
    owl:equivalentClass OMIM:602450 ;
    RO:0002525 :9606chr20q13.12 .
:9606chr20 a owl:Class ; rdfs:label "chr20" ; rdfs:subClassOf SO:0000340 ;
    OIO:hasExactSynonym "chr20 (9606)" .
:9606chr20q13.12 a owl:NamedIndividual .

# ---- C: mouse sequence feature -------------------------------------
NCBIGene:212390 a SO:0000110 ;
    rdfs:label "Gm5801" ;
    dc:description "-" ;
    RO:0002162 NCBITaxon:10090 ;
    RO:0002525 :10090chr13 .
:10090chr13 a owl:Class ; rdfs:label "chr13" ; rdfs:subClassOf SO:0000340 ;
    OIO:hasExactSynonym "chr13 (10090)" .

# ---- D: ASMT PAR ----------------------------------------------------
NCBIGene:438 a owl:Class ;
    rdfs:label "ASMT" ;
    dc:description "-" ;
    rdfs:subClassOf SO:0001217 ;
    RO:0002162 NCBITaxon:9606 ;
    RO:0002525 :9606chrX, :9606chrY .
:9606chrX a owl:Class ; rdfs:label "chrX" ; rdfs:subClassOf SO:0000340 ;
    OIO:hasExactSynonym "chrX (9606)" .
:9606chrY a owl:Class ; rdfs:label "chrY" ; rdfs:subClassOf SO:0000340 ;
    OIO:hasExactSynonym "chrY (9606)" .

# ---- E: NEWENTRY multi-chrom: bare typed class only -----------------
NCBIGene:619538 a owl:Class ; rdfs:subClassOf SO:0001217 ;
    dc:description "-" .

# ---- history --------------------------------------------------------
NCBIGene:45 a owl:Class ; rdfs:label "IL10-OLD" ;
    owl:deprecated "true"^^xsd:boolean ; IAO:0100001 NCBIGene:3586 .
NCBIGene:46 a owl:NamedIndividual ; rdfs:label "Gm-OLD" ;
    owl:deprecated "true"^^xsd:boolean ; IAO:0100001 NCBIGene:212390 .
NCBIGene:212390 a owl:NamedIndividual .
NCBIGene:212390 OIO:hasExactSynonym "Gm-OLD" .

# ---- gene2pubmed ----------------------------------------------------
PMID:12345 a owl:NamedIndividual, IAO:0000013 ; IAO:0000136 NCBIGene:3586 .
PMID:777 a owl:NamedIndividual, IAO:0000013 ; IAO:0000136 NCBIGene:212390 .
"""


@pytest.fixture(scope="module")
def ncbi_graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("ncbigene_golden_raw")
    src = get_pipeline("ncbigene")
    for key, content in {"gene_info": GENE_INFO, "gene_history": HIST, "gene2pubmed": G2P}.items():
        with gzip.open(raw / src.files[key].file, "wt") as fh:
            fh.write(content)
    (raw / "mimTitles.txt").write_text(MIM_TITLES)
    return src.transform(spark, str(raw)).cache()


def test_full_graph_matches_reference_trace(spark, ncbi_graph):
    expected = triples_from_turtle(spark, GOLDEN)
    only_engine, only_golden = graph_diff(ncbi_graph, expected)
    assert only_golden.isEmpty(), [tuple(r) for r in only_golden.collect()]
    assert only_engine.isEmpty(), [tuple(r) for r in only_engine.collect()]


def test_omim_gate_drops_phenotype_entry(ncbi_graph):
    # MIM:102700 is Number-Sign (phenotype) typed: no xref, no equivalence
    assert ncbi_graph.filter(F.col("object") == "OMIM:102700").count() == 0
    # the moved-to source id never surfaces either — only its replacement
    assert ncbi_graph.filter(F.col("object") == "OMIM:608958").count() == 0


def test_multichrom_continue_skips_taxon_too(ncbi_graph):
    # bug-faithful: the `continue` at NCBIGene.py:352 ejects the row before
    # the trailing addTaxon at :400
    assert ncbi_graph.filter(
        (F.col("subject") == "NCBIGene:619538") & (F.col("predicate") == "RO:0002162")
    ).count() == 0
