"""IMPC: GENO partonomy chain, zygosity/sex dispatch, bnode determinism,
SEPIO evidence/provenance star (FIXTURES.md §2; reference IMPC.py:199-760)."""

import gzip

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline

COLS = get_pipeline("impc").files["g2p_assertions"].columns


def _row(**kw):
    row = {c: "" for c in COLS}
    row.update(kw)
    return ",".join(row[c] for c in COLS)


CSV = "\n".join(
    [
        ",".join(COLS),
        # the reference golden-test shape (tests/test_impc.py:56-88)
        _row(
            marker_accession_id="MGI:2442444", marker_symbol="Gprc5b",
            phenotyping_center="WTSI", colony_id="MEFW", sex="male",
            zygosity="heterozygote", allele_accession_id="MGI:4431644",
            allele_symbol="Gprc5b<tm1a(EUCOMM)Wtsi>",
            strain_accession_id="MGI:2159965", strain_name="C57BL/6N",
            project_name="MGP", pipeline_name="MGP Select Pipeline",
            pipeline_stable_id="MGP_001", procedure_stable_id="IMPC_XRY_001",
            procedure_name="X-ray", parameter_stable_id="IMPC_XRY_008_001",
            parameter_name="Number of ribs right", mp_term_id="MP:0005390",
            mp_term_name="skeleton phenotype", p_value="1.637023E-010",
            effect_size="8.885439E-007",
            statistical_method="Wilcoxon rank sum test with continuity correction",
            resource_name="MGP",
        ),
        # homozygote with center-local allele + curated strain → bnodes
        _row(
            marker_accession_id="MGI:1919199", marker_symbol="Clk1",
            phenotyping_center="JAX", colony_id="JR1", sex="female",
            zygosity="homozygote", allele_accession_id="NULL-114475FCF",
            allele_symbol="Clk1<em1J>", strain_accession_id="IMPC-CURATE-B6",
            strain_name="B6", project_name="JAX", pipeline_name="JAX Pipeline",
            pipeline_stable_id="JAX_001", procedure_stable_id="IMPC_GRS_001",
            procedure_name="Grip Strength", parameter_stable_id="IMPC_GRS_008_001",
            parameter_name="Grip strength", mp_term_id="MP:0001515",
            mp_term_name="abnormal grip strength", p_value="0.0001",
            effect_size="0.5", percentage_change="-12.3",
            statistical_method="Fisher Exact Test framework", resource_name="IMPC",
        ),
        # no marker → allele IS the sequence alteration; no phenotype → no assoc
        _row(
            marker_accession_id="", phenotyping_center="ICS", colony_id="C3",
            sex="male", zygosity="hemizygote", allele_accession_id="MGI:999",
            allele_symbol="X<del>", strain_accession_id="MGI:3", strain_name="S",
            project_name="P", pipeline_name="pl", pipeline_stable_id="pl1",
            procedure_stable_id="pr1", procedure_name="pr",
            parameter_stable_id="pm1", parameter_name="pm", mp_term_id="",
            p_value="", effect_size="", statistical_method="Unknown", resource_name="R",
        ),
        "",
    ]
)


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("impc_raw")
    src = get_pipeline("impc")
    with gzip.open(raw / src.files["g2p_assertions"].file, "wt") as fh:
        fh.write(CSV)
    return src.transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


class TestGenoChain:
    def test_gene_and_variant_locus(self, graph):
        t = _spo(graph.filter(F.col("subject").isin("MGI:2442444", "MGI:4431644")))
        assert ("MGI:2442444", "rdf:type", "SO:0000704") in t
        assert ("MGI:2442444", "rdfs:label", "Gprc5b") in t
        assert ("MGI:4431644", "rdf:type", "GENO:0000002") in t
        assert ("MGI:4431644", "GENO:0000408", "MGI:2442444") in t
        # allele has a bnode sequence alteration part
        sa = [o for s, p, o in t if s == "MGI:4431644" and p == "GENO:0000382"]
        assert len(sa) == 1 and sa[0].startswith("_:b")

    def test_seqalt_label_extracted_from_angle_brackets(self, graph):
        t = _spo(graph.filter(F.col("predicate") == "rdfs:label"))
        assert any(o == "tm1a(EUCOMM)Wtsi" for _, _, o in t)

    def test_markerless_allele_is_the_seqalt(self, graph):
        t = _spo(graph.filter(F.col("subject") == "MGI:999"))
        assert ("MGI:999", "rdf:type", "SO:0001059") in t
        # no variant-locus typing for the markerless case
        assert ("MGI:999", "rdf:type", "GENO:0000002") not in t

    def test_heterozygote_vslc(self, graph):
        # vslc label Gprc5b<tm1a(EUCOMM)Wtsi>/Gprc5b<+> with simple-het zygosity
        lbl = graph.filter(
            (F.col("predicate") == "rdfs:label")
            & (F.col("object") == "Gprc5b<tm1a(EUCOMM)Wtsi>/Gprc5b<+>")
        ).collect()
        assert len(lbl) == 1
        vslc = lbl[0].subject
        t = _spo(graph.filter(F.col("subject") == vslc))
        assert (vslc, "GENO:0000608", "GENO:0000458") in t
        assert (vslc, "rdf:type", "GENO:0000030") in t
        assert (vslc, "rdf:type", "GENO:0000009") in t
        # het has exactly ONE has_variant_part (no second allele)
        assert len([1 for s, p, _ in t if p == "GENO:0000382"]) == 1

    def test_homozygote_vslc_double_allele_label(self, graph):
        lbl = graph.filter(
            (F.col("predicate") == "rdfs:label") & (F.col("object") == "Clk1<em1J>/Clk1<em1J>")
        ).collect()
        assert len(lbl) == 1
        t = _spo(graph.filter(F.col("subject") == lbl[0].subject))
        assert (lbl[0].subject, "GENO:0000608", "GENO:0000136") in t

    def test_genotype_chain(self, graph):
        # genotype derives from colony; sex-qualified genotype has the
        # genotype as variant part and the male GENO type
        sq = graph.filter(
            (F.col("predicate") == "rdf:type") & (F.col("object") == "GENO:0000646")
        ).collect()
        assert len(sq) >= 1
        t = _spo(graph.filter(F.col("subject") == sq[0].subject))
        geno = [o for _, p, o in t if p == "GENO:0000382"]
        assert len(geno) == 1
        t2 = _spo(graph.filter(F.col("subject") == geno[0]))
        assert any(p == "GENO:0000639" for _, p, _ in t2)  # derives from colony

    def test_background_strain(self, graph):
        t = _spo(graph.filter(F.col("subject") == "MGI:2159965"))
        assert ("MGI:2159965", "rdf:type", "GENO:0000611") in t
        assert ("MGI:2159965", "RO:0002162", "NCBITaxon:10090") in t
        # center-specific strain label
        pcs = graph.filter(
            (F.col("predicate") == "rdfs:label") & (F.col("object") == "C57BL/6N-WTSI-MEFW")
        ).collect()
        assert len(pcs) == 1 and pcs[0].subject.startswith("_:b")


class TestAssocEvidence:
    def test_g2p_assoc(self, graph):
        t = _spo(graph.filter(F.col("object") == "MP:0005390"))
        assert any(p == "RO:0002200" for _, p, _ in t)
        assert any(p == "OBAN:association_has_object" for _, p, _ in t)

    def test_no_assoc_without_phenotype(self, graph):
        # third row has no mp_term_id: its sex-qualified genotype exists but
        # carries no phenotype association
        hemi_vslcs = graph.filter(
            (F.col("predicate") == "GENO:0000608") & (F.col("object") == "GENO:0000134")
        ).count()
        assert hemi_vslcs == 1
        assert graph.filter(
            (F.col("predicate") == "RO:0002200") & F.col("object").startswith("MP:")
        ).count() == 2

    def test_evidence_star(self, graph):
        # assoc → evidence line → study; study has procedure+stat parts
        ev = graph.filter(F.col("predicate") == "SEPIO:0000007").collect()
        assert len(ev) == 2
        evline = ev[0].object
        t = _spo(graph.filter(F.col("subject") == evline))
        assert (evline, "rdf:type", "ECO:0000015") in t
        study = [o for _, p, o in t if p == "SEPIO:0000085"]
        assert len(study) == 1
        ts = _spo(graph.filter(F.col("subject") == study[0]))
        assert (study[0], "rdf:type", "OBI:0000471") in ts
        assert any(p == "SEPIO:0000114" for _, p, _ in ts)  # measures parameter
        assert any(o == "STATO:0000076" for _, p, o in ts if p == "BFO:0000051")

    def test_measurements(self, graph):
        # p-value node: typed, has value, output of study
        pv = graph.filter(
            (F.col("predicate") == "rdf:type") & (F.col("object") == "OBI:0000175")
        ).collect()
        assert len(pv) == 2
        t = _spo(graph.filter(F.col("subject") == pv[0].subject))
        assert any(p == "STATO:0000129" for _, p, _ in t)
        assert any(p == "RO:0002353" for _, p, _ in t)
        # percentage_change only on the row that has it
        assert graph.filter(
            (F.col("predicate") == "rdf:type") & (F.col("object") == "STATO:0000169")
        ).count() == 1

    def test_assertion_provenance(self, graph):
        t = _spo(graph.filter(F.col("predicate") == "SEPIO:0000111"))
        assert len(t) == 2
        asrt = next(iter(t))[0]
        ta = _spo(graph.filter(F.col("subject") == asrt))
        assert (asrt, "rdf:type", "SEPIO:0000001") in ta

    def test_sex_specificity_on_assoc(self, graph):
        t = _spo(graph.filter(F.col("predicate") == ":has_sex_specificity"))
        objs = {o for _, _, o in t}
        assert objs == {"PATO:0000384", "PATO:0000383"}

    def test_description_format(self, graph):
        d = graph.filter(
            (F.col("predicate") == "dc:description") & F.col("object").contains("skeleton phenotype")
        ).collect()
        assert len(d) == 1
        assert "(p = 1.6370e-10 )." in d[0].object

    def test_bnode_determinism(self, graph, spark, tmp_path_factory):
        # re-running the transform yields the identical triple set
        raw = tmp_path_factory.mktemp("impc_raw2")
        src = get_pipeline("impc")
        with gzip.open(raw / src.files["g2p_assertions"].file, "wt") as fh:
            fh.write(CSV)
        again = src.transform(spark, str(raw))
        assert _spo(again) == _spo(graph)


class TestReferenceGoldens:
    """The reference's IMPC golden tests (tests/test_impc.py:100-231) ported
    through the turtle harness.  Every bnode digest below is the reference's
    own hard-coded sha1 constant — the strongest external check of
    core/ids.py + the SEPIO star.  genid IRIs in the reference goldens are
    the skolemized spelling of ``_:`` bnodes and are written here in bnode
    form; the p-value double literal is spelled in Spark's canonical double
    formatting of the same value the reference floats."""

    def _one_row(self, spark, **cols):
        return spark.createDataFrame([tuple(cols.values())], list(cols.keys()))

    def test_evidence_model(self, spark):
        """tests/test_impc.py:100-133 (_add_evidence)."""
        from dipper_spark.core.triples import graph_diff
        from dipper_spark.io.turtle_parse import triples_from_turtle
        from dipper_spark.sources.impc import evidence_triples

        df = self._one_row(
            spark,
            assoc_id="MONARCH:test_association", eco_id="ECO:0000015",
            p_value="1.637023E-010", percentage_change="",
            effect_size="8.885439E-007", study_bnode="_:study",
        )
        graph = evidence_triples(df)
        golden = """
        MONARCH:test_association SEPIO:0000007 _:b97a98087df7a99d8a38 .

        _:b97a98087df7a99d8a38 a ECO:0000015 ;
            SEPIO:0000084 _:b41ad2bfd375c9de8888, _:b216606de82749b03956 ;
            SEPIO:0000085 _:study .

        _:b216606de82749b03956 a OBI:0000175 ;
            RO:0002353 _:study ;
            STATO:0000129 "1.637023E-10"^^xsd:double .

        _:b41ad2bfd375c9de8888 a STATO:0000085 ;
            RO:0002353 _:study ;
            STATO:0000129 "8.885439E-007" .
        """
        expected = triples_from_turtle(spark, golden)
        only_engine, only_golden = graph_diff(graph, expected)
        assert only_golden.isEmpty(), [tuple(r) for r in only_golden.collect()]
        assert only_engine.isEmpty(), [tuple(r) for r in only_engine.collect()]

    def test_provenance_model(self, spark):
        """tests/test_impc.py:135-203 (_add_study_provenance)."""
        from dipper_spark.core.triples import graph_diff
        from dipper_spark.io.turtle_parse import triples_from_turtle
        from dipper_spark.sources.impc import study_provenance_triples

        df = self._one_row(
            spark,
            phenotyping_center="WTSI", colony_id="MEFW", project_name="MGP",
            pipeline_name="MGP Select Pipeline", pipeline_stable_id="MGP_001",
            procedure_stable_id="MGP_XRY_001", procedure_name="X-ray",
            parameter_stable_id="IMPC_XRY_008_001",
            parameter_name="Number of ribs right",
            statistical_method="Wilcoxon rank sum test with continuity correction",
            resource_name="IMPC",
        )
        graph = study_provenance_triples(df)
        golden = """
        _:b0b26361b8687b5ad9ef a owl:NamedIndividual ;
            rdfs:label "MEFW" .

        _:b6f14f763c8d0629360e a OBI:0000471 ;
            BFO:0000050 <http://www.sanger.ac.uk/science/data/mouse-genomes-project>,
                IMPC-pipe:MGP_001 ;
            BFO:0000051 STATO:0000076,
                IMPC-proc:MGP_XRY_001 ;
            SEPIO:0000017 <http://www.sanger.ac.uk/> ;
            SEPIO:0000114 <https://www.mousephenotype.org/impress/OntologyInfo?action=list&procID=MGP_XRY_001#IMPC_XRY_008_001> .

        <http://www.sanger.ac.uk/> a foaf:organization ;
            rdfs:label "WTSI" .

        <http://www.sanger.ac.uk/science/data/mouse-genomes-project> a VIVO:Project ;
            rdfs:label "MGP" .

        <https://www.mousephenotype.org/impress/OntologyInfo?action=list&procID=MGP_XRY_001#IMPC_XRY_008_001> a owl:NamedIndividual ;
            rdfs:label "Number of ribs right (X-ray)" .

        IMPC-pipe:MGP_001 a owl:NamedIndividual ;
            rdfs:label "MGP Select Pipeline" .

        IMPC-proc:MGP_XRY_001 a owl:NamedIndividual ;
            rdfs:label "X-ray" .
        """
        expected = triples_from_turtle(spark, golden)
        only_engine, only_golden = graph_diff(graph, expected)
        assert only_golden.isEmpty(), [tuple(r) for r in only_golden.collect()]
        assert only_engine.isEmpty(), [tuple(r) for r in only_engine.collect()]

    def test_assertion_model(self, spark):
        """tests/test_impc.py:205-231 (_add_assertion_provenance)."""
        from dipper_spark.core.triples import graph_diff
        from dipper_spark.io.turtle_parse import triples_from_turtle
        from dipper_spark.sources.impc import assertion_provenance_triples

        df = self._one_row(
            spark, assoc_id="MONARCH:test_association", evidence_line="_:evidence",
        )
        graph = assertion_provenance_triples(df)
        golden = """
        MONARCH:test_association SEPIO:0000015 _:bf92df374a884963e805 .

        _:bf92df374a884963e805 a SEPIO:0000001 ;
            SEPIO:0000018 <https://www.mousephenotype.org/> ;
            SEPIO:0000111 _:evidence .

        <https://www.mousephenotype.org/> a foaf:organization ;
            rdfs:label "International Mouse Phenotyping Consortium" .
        """
        expected = triples_from_turtle(spark, golden)
        only_engine, only_golden = graph_diff(graph, expected)
        assert only_golden.isEmpty(), [tuple(r) for r in only_golden.collect()]
        assert only_engine.isEmpty(), [tuple(r) for r in only_engine.collect()]
