"""ClinVar XML pipeline: stanza parse, association stanzas, star scores,
SCV pairwise linking, the uncertain-significance buffer-deletion model,
and reject routing (reference: dipper/sources/ClinVar.py; the end-to-end
RCV goldens live in test_clinvar_golden.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline


def _digest(s):
    return "b" + hashlib.sha1(s.encode()).hexdigest()[1:20]


def _scv(num, acc, sig, rev):
    return f"""
    <ClinVarAssertion ID="{num}">
      <ClinVarAccession Acc="{acc}" Version="1" OrgID="1058"/>
      <ClinVarSubmissionID submitter="LabOne"/>
      <ClinicalSignificance>
        <ReviewStatus>{rev}</ReviewStatus>
        <Description>{sig}</Description>
      </ClinicalSignificance>
      <ObservedIn><Method><MethodType>clinical testing</MethodType></Method></ObservedIn>
    </ClinVarAssertion>"""


RCV_HEAD = """
    <ReferenceClinVarAssertion ID="1000">
      <ClinVarAccession Acc="RCV000000001"/>
      <ClinicalSignificance>
        <ReviewStatus>reviewed by expert panel</ReviewStatus>
        <Description>Pathogenic</Description>
      </ClinicalSignificance>
      <MeasureSet Type="Variant" ID="55555">
        <Measure Type="single nucleotide variant" ID="77777">
          <Name><ElementValue Type="Preferred">NM_000.1:c.100A&gt;G</ElementValue></Name>
          <AttributeSet><Attribute Type="HGVS, coding">NM_000.1:c.100A&gt;G</Attribute></AttributeSet>
          <XRef DB="dbSNP" ID="123"/>
          <MeasureRelationship Type="within single gene"><XRef DB="Gene" ID="672"/></MeasureRelationship>
        </Measure>
      </MeasureSet>
      <TraitSet>
        <Trait Type="Disease">
          <Name><ElementValue Type="Preferred">Breast cancer</ElementValue></Name>
          <XRef DB="OMIM" ID="604370"/>
          <XRef DB="MedGen" ID="C000001"/>
        </Trait>
      </TraitSet>
    </ReferenceClinVarAssertion>"""

CLINVAR_XML = f"""<ReleaseSet>
  <ClinVarSet>
    {RCV_HEAD}
    {_scv(2001, "SCV000000010", "Pathogenic", "criteria provided, single submitter")}
    {_scv(2002, "SCV000000011", "Likely pathogenic", "reviewed by expert panel")}
    {_scv(2003, "SCV000000012", "Benign", "practice guideline")}
  </ClinVarSet>
  <ClinVarSet>
    <BadStanza/>
  </ClinVarSet>
</ReleaseSet>
"""

# the reference skips the first mapfile line as a header (ClinVar.py:775)
G2P = "header line skipped\n672\tBRCA1\t\tC000001\tFamilial cancer of breast\n"

ASSOC = {
    num: "MONARCH:" + _digest("1000" + str(num) + "604370")
    for num in (2001, 2002, 2003)
}


@pytest.fixture(scope="module")
def cv_graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("cv_raw")
    (raw / "ClinVarFullRelease_00-latest.xml").write_text(CLINVAR_XML)
    (raw / "gene_condition_source_id").write_text(G2P)
    return get_pipeline("clinvar").transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_variant_and_gene(cv_graph):
    spo = _spo(cv_graph)
    # single allele → the allele IS the variant (measure-set id)
    assert ("ClinVarVariant:55555", "rdf:type", "SO:0001483") in spo
    assert ("ClinVarVariant:55555", "rdfs:label", "NM_000.1:c.100A>G") in spo
    assert ("ClinVarVariant:55555", "RO:0002162", "NCBITaxon:9606") in spo
    assert ("ClinVarVariant:55555", "OIO:hasExactSynonym", "rs123") in spo
    assert ("ClinVarVariant:55555", "OIO:hasDbXref", "dbSNP:123") in spo
    # gene hack: pathogenic + medgen curated in the g2p dim → affected
    assert ("ClinVarVariant:55555", "GENO:0000418", "NCBIGene:672") in spo
    # per-SCV significance edge on the variant
    assert ("ClinVarVariant:55555", "GENO:0000840", "OMIM:604370") in spo
    assert ("ClinVarVariant:55555", "GENO:0000841", "OMIM:604370") in spo
    assert ("ClinVarVariant:55555", "GENO:0000843", "OMIM:604370") in spo


def test_association_stanza(cv_graph):
    spo = _spo(cv_graph)
    a1 = ASSOC[2001]
    assert (a1, "rdf:type", "OBAN:association") in spo
    assert (a1, "OBAN:association_has_subject", "ClinVarVariant:55555") in spo
    assert (a1, "OBAN:association_has_object", "OMIM:604370") in spo
    assert (a1, "OBAN:association_has_predicate", "GENO:0000840") in spo
    assert (a1, "OIO:hasDbXref", "ClinVar:RCV000000001") in spo
    assert ("OMIM:604370", "rdfs:label", "Breast cancer") in spo
    mid = _digest("1000" + "2001" + "604370")
    ev = "_:" + _digest(mid + "_evidence")
    asrt = "_:" + _digest(mid + "_assertion")
    assert (a1, "SEPIO:0000007", ev) in spo
    assert (a1, "SEPIO:0000015", asrt) in spo
    assert (ev, "rdf:type", "ECO:0000000") in spo
    assert (asrt, "rdf:type", "SEPIO:0000001") in spo
    assert (asrt, "rdfs:label", "ClinVarAssertion_2001") in spo
    assert (asrt, "dc:identifier", "SCV000000010.1") in spo
    assert (asrt, "SEPIO:0000018", "ClinVarSubmitters:1058") in spo
    assert ("ClinVarSubmitters:1058", "rdfs:label", "LabOne") in spo
    # observation-method provenance bnode
    prov = "_:" + _digest(ev + "SEPIO:0000067")
    assert (ev, "SEPIO:0000085", prov) in spo
    assert (prov, "rdf:type", "SEPIO:0000067") in spo
    assert (prov, "rdfs:label", "clinical testing") in spo


def test_review_stars(cv_graph):
    # the RCV-level review status scores every kept association
    stars = {
        (r.subject, r.object)
        for r in cv_graph.filter(F.col("predicate") == "SEPIO:0000168").collect()
    }
    assert stars == {(ASSOC[n], "3") for n in (2001, 2002, 2003)}
    dt = cv_graph.filter(F.col("predicate") == "SEPIO:0000168").select("datatype").distinct().collect()
    assert [r.datatype for r in dt] == ["xsd:integer"]


def test_scv_pairwise_links(cv_graph):
    spo = _spo(cv_graph)
    # Pathogenic(1) vs Likely pathogenic(2): diff 1 → is_consistent_with
    assert (ASSOC[2001], "SEPIO:0000099", ASSOC[2002]) in spo
    assert (ASSOC[2002], "SEPIO:0000099", ASSOC[2001]) in spo
    # Pathogenic(1) vs Benign(8): diff 7 → strongly_contradicts
    assert (ASSOC[2001], "SEPIO:0000100", ASSOC[2003]) in spo
    # Likely pathogenic(2) vs Benign(8): diff 6 → contradicts
    assert (ASSOC[2002], "SEPIO:0000101", ASSOC[2003]) in spo


def test_uncertain_scv_deletes_buffer(spark, tmp_path):
    """An uncertain-significance SCV deletes everything accumulated so far
    for the RCV (ClinVar.py:1383-1390): variant triples and earlier SCV
    stanzas die; only stanzas AFTER the last bad SCV survive, and pairwise
    links cover all good SCVs."""
    xml = f"""<ReleaseSet>
      <ClinVarSet>
        {RCV_HEAD}
        {_scv(2001, "SCV000000010", "Pathogenic", "criteria provided, single submitter")}
        {_scv(2004, "SCV000000013", "Uncertain significance", "no assertion provided")}
        {_scv(2002, "SCV000000011", "Likely pathogenic", "reviewed by expert panel")}
      </ClinVarSet>
    </ReleaseSet>
    """
    (tmp_path / "ClinVarFullRelease_00-latest.xml").write_text(xml)
    (tmp_path / "gene_condition_source_id").write_text(G2P)
    spo = _spo(get_pipeline("clinvar").transform(spark, str(tmp_path)))
    # variant triples deleted (a bad SCV exists)
    assert ("ClinVarVariant:55555", "rdf:type", "SO:0001483") not in spo
    # the good SCV BEFORE the bad one: stanza deleted...
    assert (ASSOC[2001], "rdf:type", "OBAN:association") not in spo
    # ...the good SCV AFTER it survives
    assert (ASSOC[2002], "rdf:type", "OBAN:association") in spo
    # links still span ALL good SCVs (pathocalls survives the deletion)
    assert (ASSOC[2001], "SEPIO:0000099", ASSOC[2002]) in spo
    assert (ASSOC[2002], "SEPIO:0000099", ASSOC[2001]) in spo


def test_underspecified_rcv_is_skipped(spark, tmp_path):
    """No condition with both an id and a database → the whole stanza is
    skipped (ClinVar.py:1020-1040)."""
    xml = f"""<ReleaseSet>
      <ClinVarSet>
        <ReferenceClinVarAssertion ID="1001">
          <ClinVarAccession Acc="RCV000000002"/>
          <ClinicalSignificance><Description>Pathogenic</Description></ClinicalSignificance>
          <MeasureSet Type="Variant" ID="66666">
            <Measure Type="single nucleotide variant" ID="88888"/>
          </MeasureSet>
          <TraitSet><Trait Type="Disease"/></TraitSet>
        </ReferenceClinVarAssertion>
        {_scv(3001, "SCV000000020", "Pathogenic", "practice guideline")}
      </ClinVarSet>
    </ReleaseSet>
    """
    (tmp_path / "ClinVarFullRelease_00-latest.xml").write_text(xml)
    assert get_pipeline("clinvar").transform(spark, str(tmp_path)).count() == 0


def test_reject_routing(spark, tmp_path):
    (tmp_path / "ClinVarFullRelease_00-latest.xml").write_text(CLINVAR_XML)
    rejects = get_pipeline("clinvar").rejects(spark, str(tmp_path))
    assert rejects.count() == 1
    assert "BadStanza" in rejects.collect()[0]._corrupt_record
