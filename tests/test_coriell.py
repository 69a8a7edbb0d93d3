"""Coriell: latin-1 CSV, cell-line/patient/family build, repository
membership, disease associations (reference Coriell.py:249-786)."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline
from dipper_spark.sources.coriell import COLUMNS


def _row(**kw):
    row = {c: "" for c in COLUMNS}
    row.update(kw)
    return ",".join(f'"{row[c]}"' for c in COLUMNS)


CSV = "\n".join(
    [
        ",".join(COLUMNS),
        _row(
            catalog_id="GM00003", description="HURLER SYNDROME; MPS-I",
            omim_num="607014", sample_type="Fibroblast", dna_ref="GM00004",
            gender="Female", affected="No", relprob="parent", fam="39",
            collection="NIGMS Human Genetic Cell Repository",
            cat_remark="46;XX; clinically normal mother", species="Homo sapiens",
        ),
        # the reference's own 'good example': both abnormal karyotype and
        # variation (Coriell.py:513-515)
        _row(
            catalog_id="GM00325", description="GAUCHER DISEASE",
            omim_num="230800;611254", sample_type="Fibroblast", gender="Male",
            affected="Yes", relprob="proband", fam="39",
            collection="NIGMS Human Genetic Cell Repository",
            dbsnp_id="na001", species="Homo sapiens",
            karyotype="46;XY;t(1;3)(p22;q13)",
            gene="GBA", mutation="L444P",
            variant_id="230800.0002;230800.0001",
        ),
        "",
    ]
)


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("coriell_raw")
    src = get_pipeline("coriell")
    (raw / src.files["NIGMS"].file).write_bytes(CSV.encode("iso-8859-1"))
    return src.transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_cell_line_and_equivalent(graph):
    t = _spo(graph.filter(F.col("subject") == "Coriell:GM00003"))
    assert ("Coriell:GM00003", "rdf:type", "CLO:0000031") in t
    assert ("Coriell:GM00003", "rdfs:label", "NIGMS-GM00003") in t
    assert ("Coriell:GM00003", "owl:sameAs", "Coriell:GM00004") in t
    assert ("Coriell:GM00003", "dc:description", "46;XX; clinically normal mother") in t
    # derives from fibroblast cell type
    assert ("Coriell:GM00003", "RO:0001000", "CL:0000057") in t


def test_patient_and_label(graph):
    # the non-proband parent gets an 'of proband with' label
    lab = graph.filter(
        (F.col("predicate") == "rdfs:label")
        & (F.col("object") == "unaffected female parent of proband with Hurler syndrome")
    ).collect()
    assert len(lab) == 1 and lab[0].subject.startswith("_:b")
    # proband phrasing
    assert graph.filter(
        F.col("object") == "affected male proband with Gaucher disease"
    ).count() == 1


def test_repository_membership(graph):
    t = _spo(graph.filter(F.col("subject") == "CoriellCollection:NIGMS"))
    assert ("CoriellCollection:NIGMS", "RO:0002351", "Coriell:GM00003") in t
    assert ("CoriellCollection:NIGMS", "RO:0002351", "Coriell:GM00325") in t


def test_family_membership(graph):
    fam = _spo(graph.filter(F.col("object") == "CoriellFamily:39"))
    members = [s for s, p, _ in fam if p == "RO:0002350"]
    assert len(members) == 2  # both patients in family 39
    t = _spo(graph.filter(F.col("subject") == "CoriellFamily:39"))
    assert ("CoriellFamily:39", "rdf:type", "PCO:0000020") in t


class TestGenotypeDecomposition:
    """Coriell.py:503-733 karyotype/VSLC/GVC/genotype build on GM00325."""

    def test_karyotype_complement_and_features(self, graph):
        t = _spo(graph)
        kary = [s for s, p, o in t if p == "rdf:type" and o == "GENO:0000644"]
        assert len(kary) == 1 and kary[0].startswith("_:b")
        kid = kary[0]
        assert (kid, "rdfs:label", "46;XY;t(1;3)(p22;q13)") in t
        # t(1;3) decomposes to one anonymous alteration per chromosome
        for chrom in ("1", "3"):
            fid = f"{kid}-{chrom}"
            assert (fid, "rdf:type", "SO:0001059") in t
            assert (fid, "rdfs:label", f"some karyotype alteration on chr{chrom}") in t
            assert (kid, "GENO:0000382", fid) in t
            # coordinate-less FALDO star: feature → UN-UN region → begin
            # position carrying only label + reference
            region = [o for s, p, o in t if s == fid and p == "faldo:location"]
            assert len(region) == 1
            assert (region[0], "rdfs:label", f":9606chr{chrom}-UN-UN-Region") in t
            begin = [o for s, p, o in t if s == region[0] and p == "faldo:begin"]
            assert len(begin) == 1
            assert (begin[0], "faldo:reference", f":9606chr{chrom}") in t
            assert not any(s == begin[0] and p == "faldo:position" for s, p, o in t)

    def test_vslc_and_alleles(self, graph):
        t = _spo(graph)
        vslc = [s for s, p, o in t if p == "rdf:type" and o == "GENO:0000030"]
        assert len(vslc) == 1
        v = vslc[0]
        # variant list is sorted-unique before decomposition
        assert (v, "rdfs:label", "GBA(L444P)") in t
        assert (v, "GENO:0000382", "OMIM:230800.0001") in t
        assert (v, "GENO:0000382", "OMIM:230800.0002") in t
        assert (v, "GENO:0000608", "GENO:0000137") in t
        assert ("OMIM:230800.0001", "rdf:type", "SO:0001059") in t
        # the VSLC is a variant part of the GVC, which is part of the
        # dbSNP genotype
        gvcs = [s for s, p, o in t if p == "GENO:0000382" and o == v]
        assert len(gvcs) == 1
        gvc = gvcs[0]
        assert (gvc, "rdf:type", "GENO:0000009") in t
        assert (gvc, "rdfs:label", "GBA(L444P); 46;XY;t(1;3)(p22;q13)") in t
        assert ("dbSNPIndividual:na001", "GENO:0000382", gvc) in t
        # abnormal karyotype rides into the GVC as a variant part
        # (Coriell.py:612-615: abnormal kary + distinct gvc_id)
        kary = [s for s, p, o in t if p == "rdf:type" and o == "GENO:0000644"]
        assert len(kary) == 1
        assert (gvc, "GENO:0000382", kary[0]) in t

    def test_intrinsic_genotype_on_patient(self, graph):
        t = _spo(graph)
        assert ("dbSNPIndividual:na001", "rdf:type", "GENO:0000719") in t
        assert (
            "dbSNPIndividual:na001", "rdfs:label",
            "GBA(L444P); 46;XY;t(1;3)(p22;q13) [GM00325]",
        ) in t
        assert ("dbSNPIndividual:na001", "RO:0002162", "NCBITaxon:9606") in t
        geno = [s for s, p, o in t if p == "GENO:0000222" and o == "dbSNPIndividual:na001"]
        assert len(geno) == 1 and geno[0].startswith("_:b")

    def test_unaffected_is_wildtype_with_taxon(self, graph):
        t = _spo(graph)
        wild = [s for s, p, o in t if p == "rdf:type" and o == "GENO:0000511"]
        assert len(wild) == 1  # only the unaffected parent
        # no genotype parts for that row → patient carries the taxon
        assert (wild[0], "RO:0002162", "NCBITaxon:9606") in t
        assert not any(s == wild[0] and p == "GENO:0000222" for s, p, o in t)


def test_disease_assoc_only_for_affected(graph):
    dz = {o for _, p, o in _spo(graph) if p == "RO:0002200"}
    # 230800 decomposed as a variant LOCUS → it is a gene, not a disease
    # (the reference's `disease not in omim_map` gate, Coriell.py:744-752)
    assert dz == {"OMIM:611254"}  # affected proband only
    assert graph.filter(F.col("object") == "OMIM:607014").count() == 0


def test_collection_stanza(graph):
    """_process_collection (Coriell.py:787-813): repository individual typed
    ERO collection with label + foaf:page IRI."""
    spo = {(r.subject, r.predicate, r.object) for r in graph.collect()}
    assert ("CoriellCollection:NIGMS", "rdf:type", "ERO:0002190") in spo
    assert ("CoriellCollection:NIGMS", "rdfs:label",
            "NIGMS Human Genetic Cell Repository") in spo
    assert ("CoriellCollection:NIGMS", "foaf:page",
            "https://catalog.coriell.org/1/NIGMS") in spo
