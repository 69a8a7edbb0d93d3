"""Orphanet: XML stanza scan, preferred-gene coalesce, clique xrefs,
rel/status resolution (reference Orphanet.py:76-260)."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline

XML = """<?xml version="1.0" encoding="UTF-8"?>
<JDBOR><DisorderList count="3">
<Disorder id="17601">
  <OrphaCode>166024</OrphaCode>
  <Name lang="en">Multiple epiphyseal dysplasia, Al-Gazali type</Name>
  <DisorderGeneAssociationList count="1">
    <DisorderGeneAssociation>
      <Gene id="20160">
        <Name lang="en">kinesin family member 7</Name>
        <Symbol>KIF7</Symbol>
        <SynonymList count="2"><Synonym lang="en">JBTS12</Synonym><Synonym lang="en">UNQ340</Synonym></SynonymList>
        <ExternalReferenceList count="3">
          <ExternalReference><Source>Ensembl</Source><Reference>ENSG00000166813</Reference></ExternalReference>
          <ExternalReference><Source>HGNC</Source><Reference>30497</Reference></ExternalReference>
          <ExternalReference><Source>OMIM</Source><Reference>611254</Reference></ExternalReference>
        </ExternalReferenceList>
        <GeneType id="25993"><Name lang="en">gene with protein product</Name></GeneType>
      </Gene>
      <DisorderGeneAssociationType id="17949"><Name lang="en">Disease-causing germline mutation(s) in</Name></DisorderGeneAssociationType>
      <DisorderGeneAssociationStatus id="17991"><Name lang="en">Assessed</Name></DisorderGeneAssociationStatus>
    </DisorderGeneAssociation>
  </DisorderGeneAssociationList>
</Disorder>
<Disorder id="2">
  <OrphaCode>93400</OrphaCode>
  <Name lang="en">Test disorder</Name>
  <DisorderGeneAssociationList count="1">
    <DisorderGeneAssociation>
      <Gene id="1">
        <SynonymList count="0"/>
        <ExternalReferenceList count="1">
          <ExternalReference><Source>SwissProt</Source><Reference>Q2M1P5</Reference></ExternalReference>
        </ExternalReferenceList>
      </Gene>
      <DisorderGeneAssociationType><Name lang="en">Candidate gene tested in</Name></DisorderGeneAssociationType>
      <DisorderGeneAssociationStatus><Name lang="en">Not yet assessed</Name></DisorderGeneAssociationStatus>
    </DisorderGeneAssociation>
  </DisorderGeneAssociationList>
</Disorder>
<Disorder id="3">
  <OrphaCode>999</OrphaCode>
  <Name lang="en">Geneless disorder</Name>
  <DisorderGeneAssociationList count="0"/>
</Disorder>
</DisorderList></JDBOR>
"""


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("orphanet_raw")
    src = get_pipeline("orphanet")
    (raw / src.files["disease-gene"].file).write_text(XML)
    return src.transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_disorder_class(graph):
    t = _spo(graph.filter(F.col("subject") == "ORPHA:166024"))
    assert ("ORPHA:166024", "rdf:type", "owl:Class") in t
    assert ("ORPHA:166024", "rdfs:label", "Multiple epiphyseal dysplasia, Al-Gazali type") in t
    # geneless disorder still gets its class
    assert graph.filter(F.col("subject") == "ORPHA:999").count() >= 1


def test_preferred_gene_and_clique(graph):
    # HGNC preferred over ENSEMBL/OMIM; the others become equivalentClass
    t = _spo(graph.filter(F.col("predicate") == "owl:equivalentClass"))
    assert ("HGNC:30497", "owl:equivalentClass", "ENSEMBL:ENSG00000166813") in t
    assert ("HGNC:30497", "owl:equivalentClass", "OMIM:611254") in t
    assert len([1 for s, _, _ in t if s == "HGNC:30497"]) == 2


def test_fallback_to_any_prefix(graph):
    # SwissProt is in the preferred list
    t = _spo(graph.filter(F.col("predicate") == "RO:0002607"))
    assert ("SwissProt:Q2M1P5", "RO:0002607", "ORPHA:93400") in t


def test_rel_and_eco_resolution(graph):
    t = _spo(graph)
    assert ("HGNC:30497", "RO:0004013", "ORPHA:166024") in t
    eco = {o for _, p, o in t if p == "RO:0002558"}
    assert eco == {"ECO:0000322", "ECO:0000323"}


def test_synonyms(graph):
    t = _spo(graph.filter(F.col("predicate") == "OIO:hasExactSynonym"))
    assert ("HGNC:30497", "OIO:hasExactSynonym", "JBTS12") in t
    assert ("HGNC:30497", "OIO:hasExactSynonym", "UNQ340") in t


# --------------------------------------------------------------------------
# Reference goldens (/root/reference/tests/test_orphanet.py) over the
# reference's own fixture XMLs (resources/orphanet/orph-*.xml), compared at
# expanded-IRI level with biolink:category decorations dropped (scoped out
# of the model layer — same adjudication as the other golden suites).
# Documented divergence: orph-no-mapping.xml (an association type absent
# from the translation table) raises KeyError in the reference; the engine
# drops the row declaratively and emits no association.
# --------------------------------------------------------------------------

import os as _os

_REF_ORPHA = "/root/reference/tests/resources/orphanet"


def _norm(t, is_literal):
    from dipper_spark.core.curie import CurieMap

    cm = CurieMap()
    if is_literal:
        return ("val", t)
    return ("iri", cm.expand_str(t) if ":" in t and "://" not in t else t)


def _golden(spark, tmp_path, fixture, expected_ttl):
    import shutil

    from dipper_spark.io.turtle_parse import parse_turtle

    src = get_pipeline("orphanet")
    shutil.copy(_os.path.join(_REF_ORPHA, fixture), tmp_path / src.files["disease-gene"].file)
    got = {
        (_norm(r.subject, False), _norm(r.predicate, False), _norm(r.object, r.is_literal))
        for r in src.transform(spark, str(tmp_path)).collect()
    }
    exp = {
        (_norm(t["subject"], False), _norm(t["predicate"], False),
         _norm(t["object"], t["is_literal"]))
        for t in parse_turtle(expected_ttl)
        if "biolink" not in t["predicate"] and "biolink" not in str(t["object"])
    }
    assert got == exp, f"missing: {exp - got}\nextra: {got - exp}"


GERMLINE_TTL = """
MONARCH:ba2ac5d2153c70e2bb98 a OBAN:association ;
    RO:0002558 ECO:0000322 ;
    OBAN:association_has_object ORPHA:938475 ;
    OBAN:association_has_predicate RO:0004013 ;
    OBAN:association_has_subject HGNC:30497 .

ENSEMBL:ENSG00000166813 a owl:Class .

HGNC:30497 a owl:Class ;
    RO:0004013 ORPHA:938475 ;
    oboInOwl:hasExactSynonym "KAS1" ;
    owl:equivalentClass ENSEMBL:ENSG00000166813,
       ORPHA:268061 .

ORPHA:268061 a owl:Class .

ORPHA:938475 a owl:Class ;
    rdfs:label "too much unit testing disorder" .
"""

GERMLINE_LOF_TTL = """
MONARCH:b9ad1b0c562ad4db3f1e a OBAN:association ;
    RO:0002558 ECO:0000322 ;
    OBAN:association_has_object ORPHA:938475 ;
    OBAN:association_has_predicate RO:0004012 ;
    OBAN:association_has_subject ORPHA:268061 .

ORPHA:268061 RO:0004012 ORPHA:938475 ;
    oboInOwl:hasExactSynonym "KAS1" .

ORPHA:938475 a owl:Class ;
    rdfs:label "too much unit testing disorder" .
"""

NO_VARIANT_TTL = """
MONARCH:bdbeb077e365ddedda20 a OBAN:association ;
    RO:0002558 ECO:0000322 ;
    OBAN:association_has_object ORPHA:938475 ;
    OBAN:association_has_predicate RO:0004015 ;
    OBAN:association_has_subject ORPHA:268061 .

ORPHA:268061 RO:0004015 ORPHA:938475 ;
    oboInOwl:hasExactSynonym "KAS1" .

ORPHA:938475 a owl:Class ;
    rdfs:label "too much unit testing disorder" .
"""

_ref_present = pytest.mark.skipif(
    not _os.path.isdir(_REF_ORPHA), reason="reference fixtures absent"
)


@_ref_present
def test_golden_germline_variant_to_disease(spark, tmp_path):
    _golden(spark, tmp_path, "orph-germline.xml", GERMLINE_TTL)


@_ref_present
def test_golden_germline_lof_variant_to_disease(spark, tmp_path):
    _golden(spark, tmp_path, "orph-germline-lof.xml", GERMLINE_LOF_TTL)


@_ref_present
def test_golden_gene_to_disease(spark, tmp_path):
    _golden(spark, tmp_path, "orph-no-variant.xml", NO_VARIANT_TTL)


@_ref_present
def test_golden_unmapped_assoc_type_drops_row(spark, tmp_path):
    """orph-no-mapping.xml: the reference raises KeyError; the engine drops
    the unmapped association declaratively — only the disorder class
    survives (deliberate divergence, documented in the module header)."""
    import shutil

    src = get_pipeline("orphanet")
    shutil.copy(
        _os.path.join(_REF_ORPHA, "orph-no-mapping.xml"),
        tmp_path / src.files["disease-gene"].file,
    )
    got = src.transform(spark, str(tmp_path))
    assert got.filter(F.col("predicate").startswith("OBAN:")).count() == 0
