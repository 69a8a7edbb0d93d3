"""ClinVar XML pipeline: stanza parse, normalization, star scores, SCV
pairwise linking, reject routing."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline


def _scv(acc, sig, rev):
    return f"""
    <ClinVarAssertion>
      <ClinVarAccession Acc="{acc}"/>
      <ClinicalSignificance>
        <ReviewStatus>{rev}</ReviewStatus>
        <Description>{sig}</Description>
      </ClinicalSignificance>
    </ClinVarAssertion>"""


CLINVAR_XML = f"""<ReleaseSet>
  <ClinVarSet>
    <ReferenceClinVarAssertion>
      <ClinVarAccession Acc="RCV000000001"/>
      <MeasureSet>
        <Measure Type="single nucleotide variant" ID="55555">
          <Name><ElementValue>NM_000.1:c.100A&gt;G</ElementValue></Name>
          <MeasureRelationship><XRef DB="Gene" ID="672"/></MeasureRelationship>
        </Measure>
      </MeasureSet>
      <TraitSet><Trait><XRef DB="OMIM" ID="604370"/></Trait></TraitSet>
    </ReferenceClinVarAssertion>
    {_scv("SCV000000010", "Pathogenic", "criteria provided, single submitter")}
    {_scv("SCV000000011", "Likely pathogenic", "reviewed by expert panel")}
    {_scv("SCV000000012", "Benign", "practice guideline")}
  </ClinVarSet>
  <ClinVarSet>
    <BadStanza/>
  </ClinVarSet>
</ReleaseSet>
"""


@pytest.fixture(scope="module")
def cv_graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("cv_raw")
    (raw / "ClinVarFullRelease_00-latest.xml").write_text(CLINVAR_XML)
    return get_pipeline("clinvar").transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_variant_and_gene(cv_graph):
    spo = _spo(cv_graph)
    assert ("ClinVarVariant:55555", "rdfs:label", "NM_000.1:c.100A>G") in spo
    assert ("ClinVarVariant:55555", "GENO:0000418", "NCBIGene:672") in spo
    assert ("ClinVarVariant:55555", "RO:0004013", "OMIM:604370") in spo


def test_significance_and_stars(cv_graph):
    spo = _spo(cv_graph)
    assert any(
        s == "ClinVar:SCV000000011" and p == "GENO:0000840" and o == "GENO:0000841"
        for s, p, o in spo
    )
    stars = {
        (s, o) for s, p, o in spo if p == "SEPIO:0000187"
    }
    assert ("ClinVar:SCV000000010", "1") in stars
    assert ("ClinVar:SCV000000011", "3") in stars
    assert ("ClinVar:SCV000000012", "4") in stars


def test_scv_pairwise_links(cv_graph):
    spo = _spo(cv_graph)
    # Pathogenic(1) vs Likely pathogenic(2): diff 1 → is_consistent_with, both ways
    assert ("ClinVar:SCV000000010", "SEPIO:0000099", "ClinVar:SCV000000011") in spo
    assert ("ClinVar:SCV000000011", "SEPIO:0000099", "ClinVar:SCV000000010") in spo
    # Pathogenic(1) vs Benign(8): diff 7 → strongly_contradicts
    assert ("ClinVar:SCV000000010", "SEPIO:0000100", "ClinVar:SCV000000012") in spo
    # Likely pathogenic(2) vs Benign(8): diff 6 → contradicts
    assert ("ClinVar:SCV000000011", "SEPIO:0000101", "ClinVar:SCV000000012") in spo


def test_reject_routing(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("cv_raw2")
    (raw / "ClinVarFullRelease_00-latest.xml").write_text(CLINVAR_XML)
    rejects = get_pipeline("clinvar").rejects(spark, str(raw))
    assert rejects.count() == 1
    assert "BadStanza" in rejects.collect()[0]._corrupt_record
