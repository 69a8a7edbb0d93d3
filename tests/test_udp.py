"""UDP patient phenotype/variant pipeline — reference goldens ported from
/root/reference/tests/test_udp.py (test_patient_phenotype_model and
test_variant_model, with their mock rows verbatim) plus the rs-map
resolution tests re-expressed over the reference's own resources/udp map
files, and Spark-shape tests for the disambiguation paths."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline

REF_UDP = "/root/reference/resources/udp"


def _digest(s):
    return "b" + hashlib.sha1(s.encode()).hexdigest()[1:20]


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


# the reference test's variant row, verbatim (test_udp.py:103-126)
VARIANT_ROW = "\t".join([
    "patient_1", "family_1", "1", "HG19", "155230432", "G", "A", "Maternal",
    "Biallelic", "Non-synonymous;DOWNSTREAM", "CLK2", "", "", "", "", "", "",
    "", "Compound heterozygous", "Heterozygous", "", "0.002747253", "",
])

# the reference test's phenotype rows, verbatim (test_udp.py:84-87)
PHENOTYPE_ROWS = "patient_1\tHP:000001\tyes\npatient_1\tHP:000002\tno\n"

# symbol dim standing in for DipperUtil.get_hgnc_id_from_symbol (CLK2)
HGNC_MAP = "HGNC:2069\tCLK2\n"


def test_golden_patient_phenotype_model(spark, tmp_path):
    """reference test_patient_phenotype_model (test_udp.py:70-100):
    foaf person + label, the affected-status edge, and the phenotype edge
    only for present == 'yes'."""
    (tmp_path / "udp_phenotypes.tsv").write_text(PHENOTYPE_ROWS)
    got = get_pipeline("udp").patient_phenotype_triples(spark, str(tmp_path))
    assert _spo(got) == {
        ("MONARCH:patient_1", "rdf:type", "foaf:Person"),
        ("MONARCH:patient_1", "rdfs:label", "patient_1"),
        ("MONARCH:patient_1", "RO:0002200", "MONDO:0000001"),
        ("MONARCH:patient_1", "RO:0002200", "HP:000001"),
    }


@pytest.mark.skipif(not os.path.isdir(REF_UDP), reason="reference resources absent")
def test_golden_variant_model(spark, tmp_path):
    """reference test_variant_model (test_udp.py:102-152) with the real
    resources/udp maps: reference-exact bnode digests, the HGVS label,
    the HGNC affected-feature edge (via the symbol dim replacing the live
    REST lookup), and the rs-map sameAs."""
    (tmp_path / "udp_variants.tsv").write_text(VARIANT_ROW + "\n")
    (tmp_path / "hgnc_symbol_map.tsv").write_text(HGNC_MAP)
    import shutil

    shutil.copy(os.path.join(REF_UDP, "udp_chr_rs.tsv"), tmp_path / "udp_chr_rs.tsv")
    shutil.copy(
        os.path.join(REF_UDP, "gene_coordinates.tsv"), tmp_path / "gene_coordinates.tsv"
    )
    got = _spo(get_pipeline("udp").patient_variant_triples(spark, str(tmp_path)))
    var = "_:" + _digest("chr1-hg19-155230432-G-A")
    geno = "_:" + _digest("patient_1-intrinsic-genotype")
    expected = {
        ("MONARCH:patient_1", "GENO:0000222", geno),
        (geno, "rdf:type", "GENO:0000719"),
        (geno, "rdfs:label", "patient_1 genotype"),
        (geno, "GENO:0000382", var),
        (var, "rdf:type", "SO:0001059"),
        (var, "rdfs:label", "hg19chr1(CLK2):g.155230432G>A"),
        (var, "GENO:0000418", "HGNC:2069"),
        (var, "RO:0002162", "NCBITaxon:9606"),
        (var, "owl:sameAs", "dbSNP:rs11557757"),
    }
    assert got == expected, (
        f"missing: {expected - got}\nextra: {got - expected}"
    )


@pytest.mark.skipif(not os.path.isdir(REF_UDP), reason="reference resources absent")
class TestRsMapResolution:
    """reference test_dbsnp_indel_resolution / test_dbsnp_snp_mapping
    (test_udp.py:29-68) over the real chr-position map, via the pipeline's
    broadcast-join resolution instead of the driver dict probe."""

    def _resolve(self, spark, tmp_path, chrom, pos, ref, var):
        row = "\t".join([
            "p1", "f1", chrom, "HG19", pos, ref, var, "", "", "snv", "GENE",
            "", "", "", "", "", "", "", "", "", "", "", "",
        ])
        (tmp_path / "udp_variants.tsv").write_text(row + "\n")
        import shutil

        shutil.copy(os.path.join(REF_UDP, "udp_chr_rs.tsv"), tmp_path / "udp_chr_rs.tsv")
        got = get_pipeline("udp").patient_variant_triples(spark, str(tmp_path))
        return {
            r.object for r in got.filter(F.col("predicate") == "owl:sameAs").collect()
        }

    def test_indel_resolution(self, spark, tmp_path):
        # 15-51766637 in-del '-/A/AA/AAA/AAAA/CAAA/TAAA' → rs374313651 for -/AAAA
        assert self._resolve(spark, tmp_path, "15", "51766637", "-", "AAAA") == {
            "dbSNP:rs374313651"
        }

    def test_snp_mapping(self, spark, tmp_path):
        assert self._resolve(spark, tmp_path, "15", "54624219", "A", "C") == {
            "dbSNP:rs755532609"
        }


def test_variant_id_line_number_fallback(spark, tmp_path):
    """Incomplete core info → the line number prefixes the id
    (UDP.py:572-576), deterministically."""
    rows = "\n".join([
        "\t".join(["p1", "f1", "1", "HG19", "", "G", "A"] + [""] * 16),
        "\t".join(["p1", "f1", "2", "HG19", "123", "C", "T"] + [""] * 16),
    ])
    (tmp_path / "udp_variants.tsv").write_text(rows + "\n")
    vm = get_pipeline("udp").variant_map(spark, str(tmp_path))
    ids = sorted(r.variant_id for r in vm.collect())
    assert ids == ["1-chr1-hg19-G-A", "chr2-hg19-123-C-T"]


def test_multi_gene_downstream_disambiguation(spark, tmp_path):
    """Multi-gene up/down-stream variant: the gene whose interval contains
    the position is the affected locus; the rest are causally influenced
    (the fixed form of UDP.py:366-445 — see module docstring)."""
    row = "\t".join([
        "p1", "f1", "1", "HG19", "500", "G", "A", "", "", "DOWNSTREAM",
        "GENEA", "", "", "", "", "", "", "", "", "", "", "", "",
    ])
    row2 = "\t".join([
        "p1", "f1", "1", "HG19", "500", "G", "A", "", "", "DOWNSTREAM",
        "GENEB", "", "", "", "", "", "", "", "", "", "", "", "",
    ])
    (tmp_path / "udp_variants.tsv").write_text(row + "\n" + row2 + "\n")
    (tmp_path / "hgnc_symbol_map.tsv").write_text("HGNC:1\tGENEA\nHGNC:2\tGENEB\n")
    (tmp_path / "gene_coordinates.tsv").write_text(
        "HGNC:1\t100\t900\tplus\tGRCh37\nHGNC:2\t2000\t3000\tminus\tGRCh37\n"
    )
    spo = _spo(get_pipeline("udp").patient_variant_triples(spark, str(tmp_path)))
    var = "_:" + _digest("chr1-hg19-500-G-A")
    assert (var, "GENO:0000418", "HGNC:1") in spo
    assert (var, "RO:0002566", "HGNC:2") in spo
    # the resolved gene relabels the variant with its symbol
    assert (var, "rdfs:label", "hg19chr1(GENEA):g.500G>A") in spo


def test_transform_end_to_end(spark, tmp_path):
    (tmp_path / "udp_phenotypes.tsv").write_text(PHENOTYPE_ROWS)
    (tmp_path / "udp_variants.tsv").write_text(VARIANT_ROW + "\n")
    (tmp_path / "hgnc_symbol_map.tsv").write_text(HGNC_MAP)
    graph = get_pipeline("udp").transform(spark, str(tmp_path))
    spo = _spo(graph)
    assert ("MONARCH:patient_1", "rdf:type", "foaf:Person") in spo
    var = "_:" + _digest("chr1-hg19-155230432-G-A")
    assert (var, "GENO:0000418", "HGNC:2069") in spo


# fixture constants consumed by the ETL sweep (test_etl_all_sources)
VARIANTS = VARIANT_ROW + "\n"
PHENOTYPES = PHENOTYPE_ROWS
HGNC = HGNC_MAP
