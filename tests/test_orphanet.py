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
