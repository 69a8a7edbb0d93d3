"""ZFIN: octuple composite-key ZP join, normal-row comments, stage/source
decoration, unmapped miss metric (reference ZFIN.py:1396-1520, 2721-2826)."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline
from dipper_spark.sources.zfin import PHENO_COLUMNS

ZPMAP = "\n".join(
    [
        "iri\tid",
        "ZP:0001234\t0-0-ZFA:0000107-PATO:0000587-0-0-0",
        "ZP:0005678\tZFA:0005145-BFO:0000050-ZFA:0000107-PATO:0000462-0-0-0",
        "",
    ]
)


def _row(**kw):
    row = {c: "" for c in PHENO_COLUMNS}
    row.update(kw)
    return "\t".join(row[c] for c in PHENO_COLUMNS)


PHENO = "\n".join(
    [
        _row(**{
            "Fish ID": "ZDB-FISH-150901-29105",
            "Affected Structure or Process 1 superterm ID": "ZFA:0000107",
            "Phenotype Keyword ID": "PATO:0000587",
            "Phenotype Tag": "abnormal",
            "Start Stage ID": "ZDB-STAGE-010723-4",
            "End Stage ID": "ZDB-STAGE-010723-35",
            "Publication ID": "ZDB-PUB-990507-16",
        }),
        # normal row → comment only
        _row(**{
            "Fish ID": "ZDB-FISH-150901-29105",
            "Affected Structure or Process 1 superterm ID": "ZFA:0000107",
            "Affected Structure or Process 1 superterm Name": "brain",
            "Phenotype Keyword ID": "PATO:0000587",
            "Phenotype Keyword Name": "decreased size",
            "Phenotype Tag": "normal",
            "Publication ID": "ZDB-PUB-1",
        }),
        # unmapped octuple → dropped from assocs, visible in the miss metric
        _row(**{
            "Fish ID": "ZDB-FISH-2",
            "Affected Structure or Process 1 superterm ID": "ZFA:9999999",
            "Phenotype Keyword ID": "PATO:0000587",
            "Phenotype Tag": "abnormal",
        }),
        "",
    ]
)


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    raw = tmp_path_factory.mktemp("zfin_raw")
    src = get_pipeline("zfin")
    (raw / src.files["pheno"].file).write_text(PHENO)
    (raw / src.files["zpmap"].file).write_text(ZPMAP)
    return str(raw)


@pytest.fixture(scope="module")
def graph(spark, raw_dir):
    return get_pipeline("zfin").transform(spark, raw_dir).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_octuple_maps_to_zp(graph):
    t = _spo(graph)
    assert ("ZFIN:ZDB-FISH-150901-29105", "RO:0002200", "ZP:0001234") in t


def test_assoc_decorations(graph):
    t = _spo(graph)
    ev = [(s, o) for s, p, o in t if p == "RO:0002558"]
    assert len(ev) == 1 and ev[0][1] == "ECO:0000059"
    src = {o for _, p, o in t if p == "dc:source"}
    assert src == {"ZFIN:ZDB-PUB-990507-16"}
    # stage qualifier on the assoc node
    stages = {o for _, p, o in t if p == "BFO:0000050"}
    assert "ZFIN:ZDB-STAGE-010723-4" in stages


def test_normal_row_is_comment(graph):
    c = graph.filter(F.col("predicate") == "rdfs:comment").collect()
    assert len(c) == 1
    assert c[0].subject == "ZFIN:ZDB-FISH-150901-29105"
    assert "Normal phenotype observed: brain+decreased size" in c[0].object
    # and no assoc for it beyond the abnormal one
    assert graph.filter(F.col("predicate") == "RO:0002200").count() == 1


def test_unmapped_miss_metric(spark, raw_dir):
    miss = get_pipeline("zfin").unmapped_octuples(spark, raw_dir)
    rows = miss.collect()
    assert len(rows) == 1
    assert rows[0].fish_curie == "ZFIN:ZDB-FISH-2"


# --------------------------------------------------------------------------
# Reference goldens, ported from /root/reference/tests/test_zfin.py with the
# fixture files under tests/resources/zfin/ embedded verbatim.  Expected
# constants are the reference's own hard-coded values (the strongest external
# check of the sha1 composite-key contract) or independently re-derived with
# hashlib in the test body — never computed by the code under test.
# --------------------------------------------------------------------------

# resources/zfin/zp-mapping-test.txt (verbatim)
ZPMAP_GOLDEN = (
    "iri\tid\n"
    "ZP:0002959\tZFA:0009114-BFO:0000050-ZFA:0001056-PATO:0001453-GO:0005927-BFO:0000050-ZFA:0001056\n"
)

# resources/zfin/zp-mapping-test-map.txt (verbatim)
ZPMAP_OCTUPLE = "iri\tid\nZP:0022140\tGO:0061337-BFO:0000066-ZFA:0000471-PATO:0002472-0-0-0\n"

# resources/zfin/zp-mapping-test-phenotype.txt (verbatim, single row)
PHENO_GOLDEN = (
    "ZDB-FISH-151201-4\tAB/TU + MO2-rnf207b + MO4-tp53\tZDB-STAGE-010723-8\t"
    "Larval:Protruding-mouth\tZDB-STAGE-010723-8\tLarval:Protruding-mouth\t"
    "GO:0061337\tcardiac conduction\tBFO:0000066\toccurs_in\tZFA:0000471\tatrium\t"
    "PATO:0002472\tdecreased velocity\tabnormal\t\t\t\t\t\t\t"
    "ZDB-PUB-141005-1\tZDB-EXP-041102-1\n"
)

# resources/zfin/genotype-label-test-genotype_features.txt (verbatim)
GENO_GOLDEN = (
    "ZDB-GENO-070228-3\tshha<sup>tbx392/tbx392</sup>\ttbx392[2,1,1]AB\t"
    "ZDB-ALT-010427-8\ttbx392\ttbx392\tpoint_mutation\tPoint Mutation\t"
    "shha\tZDB-GENE-980526-166\thomozygous\n"
)

# resources/zfin/genotype-label-test-genotype_backgrounds.txt (verbatim)
BACKGROUNDS_GOLDEN = (
    "ZDB-GENO-070228-3\tshha<sup>tbx392/tbx392</sup>\tZDB-GENO-960809-7\tAB\n"
)

# synthetic simple-heterozygous row: the (genotype, locus) group holds a
# single allele, so the alleles array has one element — exercises the
# wild-type '+' branch (ZFIN.py:1024-1026), which under pyspark 4's
# default-on ANSI mode would crash with INVALID_ARRAY_INDEX_IN_ELEMENT_AT
# if the second allele were read with element_at instead of F.get
GENO_HET = (
    "ZDB-GENO-100-1\tfoo<sup>m1/+</sup>\tfoo-m1-het\t"
    "ZDB-ALT-100-1\tm1\tm1\tpoint_mutation\tPoint Mutation\t"
    "foo\tZDB-GENE-100-1\theterozygous\n"
)


@pytest.fixture(scope="module")
def golden_dir(tmp_path_factory):
    raw = tmp_path_factory.mktemp("zfin_golden")
    src = get_pipeline("zfin")
    (raw / src.files["pheno"].file).write_text(PHENO_GOLDEN)
    (raw / src.files["zpmap"].file).write_text(ZPMAP_OCTUPLE)
    (raw / src.files["geno"].file).write_text(GENO_GOLDEN)
    (raw / src.files["backgrounds"].file).write_text(BACKGROUNDS_GOLDEN)
    return str(raw)


def test_golden_load_zp_mappings(spark, tmp_path):
    """reference test_load_zp_mappings (test_zfin.py:49-76): the single map
    row keys to the hard-coded MONARCH:b308a8f1c67793a56d16."""
    src = get_pipeline("zfin")
    (tmp_path / src.files["zpmap"].file).write_text(ZPMAP_GOLDEN)
    rows = src.zp_map(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]._zpkey == "MONARCH:b308a8f1c67793a56d16"
    assert rows[0].zp_id == "ZP:0002959"


def test_golden_octuple_to_zp(spark, golden_dir):
    """reference test_mapping_of_phenotypes_to_zp_ids (test_zfin.py:23-47):
    the EQ octuple of the phenotype row maps to ZP:0022140."""
    graph = get_pipeline("zfin").transform(spark, golden_dir)
    t = _spo(graph)
    assert ("ZFIN:ZDB-FISH-151201-4", "RO:0002200", "ZP:0022140") in t


def test_golden_make_zpkey_zero_padding(spark):
    """reference test_make_zpkey (test_zfin.py:80-97): empty strings pad to
    '0' before keying, and the key is make_id of the '_'-join — re-derived
    here with hashlib, not with the code under test."""
    import hashlib

    from dipper_spark.sources.zfin import OCTUPLE, zp_key

    one_to_eight = [str(i) for i in range(1, 9)]
    df = spark.createDataFrame(
        [tuple(one_to_eight), tuple([""] * 8), tuple(["0"] * 8)], OCTUPLE
    )
    keys = [r.k for r in df.select(zp_key(OCTUPLE).alias("k")).collect()]
    expected = "MONARCH:b" + hashlib.sha1("_".join(one_to_eight).encode()).hexdigest()[1:20]
    assert keys[0] == expected
    assert keys[1] == keys[2]  # '' and '0' octuples key identically


def test_golden_genotype_label(spark, golden_dir):
    """reference test_genotype_labels (test_zfin.py:99-118): after parsing
    the three fixture files, ZDB-GENO-070228-3's label is the hard-coded
    'shha<sup>tbx392/tbx392</sup> (AB)'."""
    row = (
        get_pipeline("zfin")
        .genotype_labels(spark, golden_dir)
        .filter(F.col("genotype_curie") == "ZFIN:ZDB-GENO-070228-3")
        .collect()
    )
    assert len(row) == 1
    assert row[0].genotype_label == "shha<sup>tbx392/tbx392</sup> (AB)"
    # Monarch-style synonym: homozygous tbx392 on shha (Genotype.py:665-687)
    assert row[0].monarch_synonym == "shha<tbx392>/shha<tbx392> [AB]"
    assert row[0].zygosities == ["GENO:0000136"]  # homozygous
    # vslc bnode digest re-derived independently (ZFIN.py:1066-1068)
    import hashlib

    expected_vslc = (
        "_:b"
        + hashlib.sha1(
            b"ZDB-GENE-980526-166-ZDB-ALT-010427-8-ZDB-ALT-010427-8"
        ).hexdigest()[1:20]
    )
    assert row[0].vslc_ids == [expected_vslc]


def test_heterozygous_single_allele_locus(spark, tmp_path):
    """Simple-het genotype (one allele per locus): no ANSI crash; implied
    wild-type partner 'WT'/'+' and GENO simple-heterozygous zygosity
    (ZFIN.py:988-1000, 1024-1026)."""
    import hashlib

    src = get_pipeline("zfin")
    (tmp_path / src.files["geno"].file).write_text(GENO_HET)
    # a background row for a different genotype → the left join misses
    (tmp_path / src.files["backgrounds"].file).write_text(BACKGROUNDS_GOLDEN)
    rows = (
        src.genotype_labels(spark, str(tmp_path))
        .filter(F.col("genotype_curie") == "ZFIN:ZDB-GENO-100-1")
        .collect()
    )
    assert len(rows) == 1
    assert rows[0].zygosities == ["GENO:0000458"]  # simple heterozygous
    assert rows[0].vslc_labels == ["foo<m1>/foo<+>"]
    expected_vslc = (
        "_:b"
        + hashlib.sha1(b"ZDB-GENE-100-1-ZDB-ALT-100-1-WT").hexdigest()[1:20]
    )
    assert rows[0].vslc_ids == [expected_vslc]
    # no backgrounds row → 'unspecified background' label path
    assert rows[0].genotype_label == "foo<sup>m1/+</sup> (unspecified background)"


def test_duplicate_allele_name_spellings_no_crash(spark, tmp_path):
    """Same allele id with two Allele Name spellings in one (genotype,
    locus) group must pick one label deterministically (the max), not raise
    DUPLICATE_MAP_KEY (default spark.sql.mapKeyDedupPolicy=EXCEPTION)."""
    src = get_pipeline("zfin")
    dup = (
        "ZDB-GENO-200-1\tbar<sup>m2/m2</sup>\tbar-m2\t"
        "ZDB-ALT-200-1\tm2alpha\tm2\tpoint_mutation\tPoint Mutation\t"
        "bar\tZDB-GENE-200-1\thomozygous\n"
        "ZDB-GENO-200-1\tbar<sup>m2/m2</sup>\tbar-m2\t"
        "ZDB-ALT-200-1\tm2beta\tm2\tpoint_mutation\tPoint Mutation\t"
        "bar\tZDB-GENE-200-1\thomozygous\n"
    )
    (tmp_path / src.files["geno"].file).write_text(dup)
    (tmp_path / src.files["backgrounds"].file).write_text(BACKGROUNDS_GOLDEN)
    rows = (
        src.genotype_labels(spark, str(tmp_path))
        .filter(F.col("genotype_curie") == "ZFIN:ZDB-GENO-200-1")
        .collect()
    )
    assert len(rows) == 1
    assert rows[0].vslc_labels == ["bar<m2beta>/bar<m2beta>"]


def test_golden_genotype_triples_in_transform(spark, golden_dir):
    """The genotype stanza flows through transform() when the geno files are
    present: label triple, background edge + typing, vslc membership."""
    graph = get_pipeline("zfin").transform(spark, golden_dir)
    t = _spo(graph)
    gt = "ZFIN:ZDB-GENO-070228-3"
    assert (gt, "rdfs:label", "shha<sup>tbx392/tbx392</sup> (AB)") in t
    assert (gt, "rdf:type", "GENO:0000000") in t
    assert (gt, "GENO:0000385", "ZFIN:ZDB-GENO-960809-7") in t
    assert ("ZFIN:ZDB-GENO-960809-7", "rdf:type", "GENO:0000611") in t
    vslc_edges = [(s, o) for s, p, o in t if p == "GENO:0000382" and s == gt]
    assert len(vslc_edges) == 1 and vslc_edges[0][1].startswith("_:b")


# --------------------------------------------------------------------------
# Guarded star probes (round-12 verdict item #7): the MGI skew-guard posture
# generalized to a second multi-dim probe flow.  A Zipfian hub octuple (one
# _zpkey owning most fish rows — the shape a promiscuous phenotype key has
# at cluster scale) must flip the guarded zp-map probe onto the salted plan
# WITHOUT changing a single output triple; the default flag and a uniform
# key keep the plain broadcast join.
# --------------------------------------------------------------------------


class TestGuardedStarJoins:
    @staticmethod
    def _zipf_raw(tmp_path_factory):
        raw = tmp_path_factory.mktemp("zfin_zipf_raw")
        src = get_pipeline("zfin")
        # hub octuple (ZFA:0000107) owns 60 of 69 fact rows over 10
        # distinct keys: straggler factor 60*10/69 ~ 8.7, past the 4x
        # threshold
        zp_lines = ["iri\tid", "ZP:0001234\t0-0-ZFA:0000107-PATO:0000587-0-0-0"]
        rows = []
        for i in range(60):
            rows.append(_row(**{
                "Fish ID": f"ZDB-FISH-HUB-{i}",
                "Affected Structure or Process 1 superterm ID": "ZFA:0000107",
                "Phenotype Keyword ID": "PATO:0000587",
                "Phenotype Tag": "abnormal",
                "Publication ID": "ZDB-PUB-1",
            }))
        for j in range(1, 10):
            zp_lines.append(
                f"ZP:000{2000 + j}\t0-0-ZFA:00002{j:02d}-PATO:0000587-0-0-0"
            )
            rows.append(_row(**{
                "Fish ID": f"ZDB-FISH-TAIL-{j}",
                "Affected Structure or Process 1 superterm ID": f"ZFA:00002{j:02d}",
                "Phenotype Keyword ID": "PATO:0000587",
                "Phenotype Tag": "abnormal",
                "Publication ID": "ZDB-PUB-1",
            }))
        (raw / src.files["pheno"].file).write_text("\n".join(rows) + "\n")
        (raw / src.files["zpmap"].file).write_text("\n".join(zp_lines) + "\n")
        return str(raw)

    def test_guard_engages_on_planted_hub_key_with_identical_output(
        self, spark, tmp_path_factory
    ):
        from dipper_spark.core import graph_equal
        from dipper_spark.sources.zfin import ZfinPipeline

        raw = self._zipf_raw(tmp_path_factory)
        plain = ZfinPipeline()
        assert plain.guard_skew is False  # the documented default
        guarded = ZfinPipeline()
        guarded.guard_skew = True

        g_plain = plain.transform(spark, raw).localCheckpoint(eager=True)
        g_guard = guarded.transform(spark, raw).localCheckpoint(eager=True)
        # the guard is a pure plan decision: triple-for-triple identical
        assert graph_equal(g_plain, g_guard)

        # plan lock: on the planted Zipfian key the guarded probe takes
        # the salted shape (dim replicated via explode -> Generate); the
        # plain probe never contains it
        rows = plain._staged_rows(spark, raw)
        zp = plain.zp_map(spark, raw)
        salted = guarded._probe(rows, zp, "_zpkey", "left")
        assert "explode" in salted._jdf.queryExecution().toString()
        plain_plan = plain._probe(rows, zp, "_zpkey", "left")
        assert "explode" not in plain_plan._jdf.queryExecution().toString()

    def test_guard_stays_plain_on_uniform_key(self, spark, raw_dir):
        from dipper_spark.sources.zfin import ZfinPipeline

        guarded = ZfinPipeline()
        guarded.guard_skew = True
        rows = guarded._staged_rows(spark, raw_dir)
        zp = guarded.zp_map(spark, raw_dir)
        probed = guarded._probe(rows, zp, "_zpkey", "left")
        # 3 rows / 2 distinct keys: no straggler prediction, plain plan
        assert "explode" not in probed._jdf.queryExecution().toString()
