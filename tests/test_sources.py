"""Source-pipeline tests over synthetic fixture files (the reference's
golden-subgraph strategy, SURVEY.md §5: one hand-built input row → expected
triples)."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline, run_sources

HPOA_FIXTURE = "\n".join(
    [
        "#description: HPO annotations",
        "#date: 2024-01-01",
        "#tracker: https://example.org/tracker",
        "#HPO-version: http://purl.obolibrary.org/obo/hp/releases/2024-01-01",
        "\t".join(
            ["#DatabaseID", "DiseaseName", "Qualifier", "HPO_ID", "Reference", "Evidence",
             "Onset", "Frequency", "Sex", "Modifier", "Aspect", "Biocuration"]
        ),
        # P-aspect row with onset+freq, PMID + OMIM pubs, female sex
        "\t".join(
            ["OMIM:119600", "Some disease", "", "HP:0001763", "PMID:12345;OMIM:119600",
             "PCS", "HP:0003577", "HP:0040283", "FEMALE", "", "P", "HPO:probinson"]
        ),
        # NOT-qualified row must be dropped (P2)
        "\t".join(
            ["OMIM:119600", "Some disease", "NOT", "HP:0009999", "PMID:999", "IEA",
             "", "", "", "", "P", ""]
        ),
        # I-aspect (inheritance) → has disposition, no onset/freq qualifiers
        "\t".join(
            ["ORPHA:93400", "Other disease", "", "HP:0000006", "PMID:777", "TAS",
             "", "", "", "", "I", ""]
        ),
        # malformed reference value must be rejected (P8)
        "\t".join(
            ["OMIM:120160", "Third disease", "", "HP:0000252", "not a curie", "IEA",
             "", "", "MALE", "", "M", ""]
        ),
        "",
    ]
)

CTD_FIXTURE = "\n".join(
    [
        "# CTD_chemicals_diseases",
        "\t".join(
            ["Nicotine", "D009538", "54-11-5", "Tobacco Use Disorder", "MESH:D014029",
             "marker/mechanism", "", "", "", "10072409|10413661"]
        ),
        "\t".join(
            ["Nicotine", "D009538", "54-11-5", "Hypertension", "MESH:D006973",
             "therapeutic", "", "", "", "123"]
        ),
        # inferred-only row (no direct evidence) must be dropped (P3)
        "\t".join(
            ["Aspirin", "D001241", "50-78-2", "Pain", "MESH:D010146",
             "", "PTGS2", "4.2", "", "456"]
        ),
        "",
    ]
)


@pytest.fixture(scope="module")
def hpoa_graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("hpoa_raw")
    (raw / "phenotype.hpoa").write_text(HPOA_FIXTURE)
    return get_pipeline("hpoa").transform(spark, str(raw)).cache()


@pytest.fixture(scope="module")
def ctd_graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("ctd_raw")
    (raw / "CTD_chemicals_diseases.tsv.gz").write_bytes(
        __import__("gzip").compress(CTD_FIXTURE.encode())
    )
    return get_pipeline("ctd").transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


class TestHpoa:
    def test_not_rows_dropped(self, hpoa_graph):
        assert not [r for r in hpoa_graph.collect() if r.object == "HP:0009999"]

    def test_aspect_dispatch(self, hpoa_graph):
        preds = _spo(hpoa_graph)
        # P-aspect association carries has-phenotype as reified predicate
        assert any(p == "OBAN:association_has_predicate" and o == "RO:0002200" for _, p, o in preds)
        # I-aspect carries has-disposition
        assert any(p == "OBAN:association_has_predicate" and o == "RO:0000091" for _, p, o in preds)

    def test_evidence_resolved(self, hpoa_graph):
        spo = _spo(hpoa_graph)
        objs = {o for _, p, o in spo if p == "RO:0002558"}
        assert {"ECO:0000269", "ECO:0000304"} <= objs
        # the IEA row's only Reference is malformed: the reference emits the
        # association star ONLY inside the valid-pub loop
        # (HPOAnnotations.py:280-327), so its evidence edge never appears —
        # but the eco class declaration does (emitted before the loop)
        assert "ECO:0000501" not in objs
        assert ("ECO:0000501", "rdf:type", "owl:Class") in spo

    def test_onset_frequency_on_assoc(self, hpoa_graph):
        spo = _spo(hpoa_graph)
        assert any(p == "RO:0002488" and o == "HP:0003577" for _, p, o in spo)
        assert any(p == "RO:0003306" and o == "HP:0040283" for _, p, o in spo)

    def test_sex_specificity(self, hpoa_graph):
        spo = _spo(hpoa_graph)
        assert any(p == ":has_sex_specificity" and o == "PATO:0000383" for _, p, o in spo)
        assert any(p == ":has_sex_specificity" and o == "PATO:0000384" for _, p, o in spo)

    def test_pub_rewrite_and_typing(self, hpoa_graph):
        spo = _spo(hpoa_graph)
        # the reference rewrites the OMIM pub to 'http://omim.org/entry/n' —
        # exactly the curie expansion of OMIM:n, so the canonical curie-space
        # node is OMIM:119600 typed web page (SIO:000302); nt serialization
        # expands it to the identical URL bytes
        assert ("OMIM:119600", "rdf:type", "SIO:000302") in spo
        assert ("PMID:12345", "rdf:type", "IAO:0000013") in spo
        # malformed 'not a curie' reference rejected
        assert not any("not a curie" in o for _, _, o in spo)

    def test_test_mode_subsets(self, spark, tmp_path_factory):
        raw = tmp_path_factory.mktemp("hpoa_raw2")
        (raw / "phenotype.hpoa").write_text(HPOA_FIXTURE)
        g = get_pipeline("hpoa").transform(spark, str(raw), test_mode=True)
        # ORPHA:93400 and OMIM:119600/120160 are test ids → all rows survive here;
        # narrow check: subjects only reference test diseases or derived nodes
        diseases = {o for _, p, o in _spo(g) if p == "OBAN:association_has_subject"}
        assert diseases <= {"OMIM:119600", "OMIM:120160", "ORPHA:93400"}

    def test_dedup(self, hpoa_graph):
        assert hpoa_graph.count() == hpoa_graph.dropDuplicates(["subject", "predicate", "object"]).count()


class TestCtd:
    def test_evidence_filter_and_resolve(self, ctd_graph):
        spo = _spo(ctd_graph)
        # marker/mechanism → RO:0002607, therapeutic → RO:0002606
        rels = {o for _, p, o in spo if p == "OBAN:association_has_predicate"}
        assert rels == {"RO:0002607", "RO:0002606"}
        # inferred-only Aspirin row dropped entirely
        assert not any("D001241" in s or "D001241" in o for s, _, o in spo)

    def test_mesh_prefix_and_label(self, ctd_graph):
        assert ("MESH:D009538", "rdfs:label", "Nicotine") in _spo(ctd_graph)

    def test_pubmed_explode(self, ctd_graph):
        spo = _spo(ctd_graph)
        assert ("PMID:10072409", "rdf:type", "IAO:0000013") in spo
        assert ("PMID:10413661", "rdf:type", "IAO:0000013") in spo
        # each pub contributes TAS evidence on the assoc node
        assert any(p == "RO:0002558" and o == "ECO:0000033" for _, p, o in spo)

    def test_assoc_star_shape(self, ctd_graph):
        rows = ctd_graph.filter(F.col("predicate") == "OBAN:association_has_subject").collect()
        assert {r.object for r in rows} == {"MESH:D009538"}
        # assoc node ids are deterministic MONARCH:'b'+sha1[1:20] curies
        assert all(r.subject.startswith("MONARCH:b") and len(r.subject) == 28 for r in rows)


def test_run_sources_union(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("multi_raw")
    (raw / "phenotype.hpoa").write_text(HPOA_FIXTURE)
    (raw / "CTD_chemicals_diseases.tsv.gz").write_bytes(
        __import__("gzip").compress(CTD_FIXTURE.encode())
    )
    g = run_sources(spark, ["hpoa", "ctd"], str(raw))
    assert {r.graph_id for r in g.select("graph_id").distinct().collect()} == {"hpoa", "ctd"}
