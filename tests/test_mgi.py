"""MGI star-join: dim build passes resolve internal keys to public ids,
probe passes join facts through broadcast dims."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline


def _tsv(cols, rows):
    return "\n".join(["\t".join(cols)] + ["\t".join(str(x) for x in r) for r in rows]) + "\n"


FIXTURES = {
    "gxd_genotype_summary_view.tsv": _tsv(
        ["_object_key", "preferred", "mgiid", "subtype", "short_description"],
        [(101, 1, "MGI:2166359", "Genotype", "Pax6 geno"),
         (101, 0, "MGI:dup", "Genotype", "nonpreferred dup")],
    ),
    "all_summary_view.tsv": _tsv(
        ["_object_key", "preferred", "mgiid", "description", "short_description"],
        [(201, 1, "MGI:1856155", "allele one", "Pax6<Sey>"),
         (202, 1, "MGI:1855555", "allele wt", "Pax6<+>")],
    ),
    "mrk_acc_view.tsv": _tsv(
        ["accid", "prefixpart", "_logicaldb_key", "_object_key", "preferred", "_organism_key"],
        [("MGI:97490", "MGI:", 1, 301, 1, 1),
         ("ENSMUSG0000001", "", 60, 301, 1, 1)],  # non-MGI logicaldb skipped
    ),
    "prb_strain_acc_view.tsv": _tsv(
        ["accid", "prefixpart", "_logicaldb_key", "_object_key", "preferred"],
        [("MGI:3028467", "MGI:", 1, 401, 1)],
    ),
    "bib_acc_view.tsv": _tsv(
        ["accid", "prefixpart", "numericpart", "_object_key", "logicaldb", "_logicaldb_key"],
        [("J:30492", "J:", 30492, 501, "MGI", 1)],
    ),
    "gxd_genotype_view.tsv": _tsv(
        ["_genotype_key", "_strain_key", "strain", "mgiid"],
        [(101, 401, "C57BL/6J", "MGI:2166359")],
    ),
    "all_allele_view.tsv": _tsv(
        ["_allele_key", "_marker_key", "_strain_key", "symbol", "name", "iswildtype"],
        [(201, 301, 401, "Pax6<Sey>", "small eye", 0),
         (202, 301, 401, "Pax6<+>", "wild type", 1)],
    ),
    "gxd_allelepair_view.tsv": _tsv(
        ["_allelepair_key", "_genotype_key", "_allele_key_1", "_allele_key_2",
         "allele1", "allele2", "allelestate"],
        [(601, 101, 201, 202, "Pax6<Sey>", "Pax6<+>", "Heterozygous")],
    ),
    "voc_annot_view.tsv": _tsv(
        ["_annot_key", "annottype", "_object_key", "_term_key", "_qualifier_key",
         "qualifier", "term", "accid"],
        [(701, "Mammalian Phenotype/Genotype", 101, 801, 0, "", "small eyes", "MP:0001286"),
         (702, "Mammalian Phenotype/Genotype", 101, 802, 0, "norm", "normal thing", "MP:0009999"),
         (703, "DO/Genotype", 101, 803, 0, "", "aniridia", "DOID:12271"),
         (704, "DO/Genotype", 101, 804, 1614157, "NOT", "not disease", "DOID:999")],
    ),
    "evidence_view.tsv": _tsv(
        ["_annotevidence_key", "_annot_key", "evidencecode", "jnumid", "term", "value", "annottype"],
        [(901, 701, "EXP", "J:30492", "small eyes", "", "Mammalian Phenotype/Genotype")],
    ),
    "mrk_location_cache.tsv": _tsv(
        ["_marker_key", "_organism_key", "chromosome", "startcoordinate",
         "endcoordinate", "strand", "version"],
        [(301, 1, "2", "105668900.0", "105697364.0", "+", "GRCm38")],
    ),
}


@pytest.fixture(scope="module")
def mgi_graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("mgi_raw")
    for name, content in FIXTURES.items():
        (raw / name).write_text(content)
    return get_pipeline("mgi").transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_genotype_background(mgi_graph):
    spo = _spo(mgi_graph)
    assert ("MGI:2166359", "rdf:type", "GENO:0000000") in spo
    assert ("MGI:2166359", "GENO:0000385", "MGI:3028467") in spo
    assert ("MGI:3028467", "rdf:type", "GENO:0000611") in spo
    assert ("MGI:3028467", "rdfs:label", "C57BL/6J") in spo


def test_allele_marker_join(mgi_graph):
    spo = _spo(mgi_graph)
    assert ("MGI:1856155", "GENO:0000408", "MGI:97490") in spo
    assert ("MGI:1856155", "rdfs:label", "Pax6<Sey>") in spo
    # wildtype allele not typed as variant locus
    assert ("MGI:1856155", "rdf:type", "GENO:0000002") in spo
    assert ("MGI:1855555", "rdf:type", "GENO:0000002") not in spo


def test_allele_pairs_zygosity(mgi_graph):
    spo = _spo(mgi_graph)
    assert ("MGI:2166359", "GENO:0000382", "MGI:1856155") in spo
    assert ("MGI:2166359", "GENO:0000382", "MGI:1855555") in spo
    assert ("MGI:2166359", "GENO:0000608", "GENO:0000135") in spo


def test_g2p_and_disease_annotations(mgi_graph):
    spo = _spo(mgi_graph)
    # MP annotation → G2P assoc with resolved genotype id and J-pub source
    assert any(p == "OBAN:association_has_object" and o == "MP:0001286" for _, p, o in spo)
    # EXP resolves to ECO:0000006 'experimental evidence' (mgi.yaml:3)
    assert any(p == "RO:0002558" and o == "ECO:0000006" for _, p, o in spo)
    assert any(p == "dc:source" and o == "MGI:J:30492" for _, p, o in spo)
    # 'norm' qualifier skipped
    assert not any(o == "MP:0009999" for _, _, o in spo)
    # DO model-of kept, NOT-qualified skipped
    assert ("MGI:2166359", "RO:0003301", "DOID:12271") in spo
    assert not any(o == "DOID:999" for _, _, o in spo)


def test_marker_location_faldo(mgi_graph):
    spo = _spo(mgi_graph)
    assert ("MGI:97490", "faldo:location",
            next(o for s, p, o in spo if s == "MGI:97490" and p == "faldo:location")) in spo
    assert any(p == "faldo:position" and o == "105668900" for _, p, o in spo)


# --------------------------------------------------------------------------
# Reference golden: test_sex_specificity_model
# (/root/reference/tests/test_mgi.py:17-56) over the reference's own
# resources/mgi/evidence_view fixture (embedded verbatim).  The reference
# injects idhash['annot']['6901981'] = ':association'; the engine analog is
# the annot_assoc mapping DataFrame.  Documented divergence: the
# biolink:category decoration on PATO:0000384 is scoped out of the model
# layer (same adjudication as the other golden suites).
# --------------------------------------------------------------------------

EVIDENCE_VIEW_GOLDEN = (
    "_annotevidence_key\t_annot_key\tevidencecode\tjnumid\tterm\tvalue\tannottype\n"
    "7413616\t6901981\tEXP\tJ:74619\tMP-Sex-Specificity\tM\tMammalian Phenotype/Genotype\n"
)


def test_golden_sex_specificity_model(spark, tmp_path):
    (tmp_path / "evidence_view.tsv").write_text(EVIDENCE_VIEW_GOLDEN)
    annot_assoc = spark.createDataFrame(
        [("6901981", ":association")], ["_annot_key", "assoc_id"]
    )
    got = get_pipeline("mgi").evidence_view_triples(spark, str(tmp_path), annot_assoc)
    spo = _spo(got)
    assert spo == {
        (":association", "RO:0002558", "ECO:0000006"),
        (":association", "dc:source", "J:74619"),
        (":association", ":has_sex_specificity", "PATO:0000384"),
        ("J:74619", "rdf:type", "IAO:0000310"),
    }


def test_sex_specificity_in_transform(spark, tmp_path):
    """The MP-Sex-Specificity qualifier decorates the computed association
    node in the full transform."""
    fixtures = dict(FIXTURES)
    fixtures["evidence_view.tsv"] = _tsv(
        ["_annotevidence_key", "_annot_key", "evidencecode", "jnumid", "term", "value", "annottype"],
        [(901, 701, "EXP", "J:30492", "MP-Sex-Specificity", "F", "Mammalian Phenotype/Genotype")],
    )
    for name, content in fixtures.items():
        (tmp_path / name).write_text(content)
    graph = get_pipeline("mgi").transform(spark, str(tmp_path))
    sex = graph.filter(F.col("predicate") == ":has_sex_specificity").collect()
    assert len(sex) == 1
    assert sex[0].object == "PATO:0000383"
    assert sex[0].subject.startswith("MONARCH:b")
    # it decorates the same node the G2P assoc stanza uses
    assoc_subjects = {
        r.subject
        for r in graph.filter(F.col("predicate") == "OBAN:association_has_object").collect()
    }
    assert sex[0].subject in assoc_subjects


class TestGuardedStarJoins:
    """Round-12 verdict item #5: the skew guard threaded through the real
    source pipeline.  A Zipfian fact key planted in the allele-pair fact
    table (one hub genotype owning most rows, the MGI.py:308-313
    probe-dict shape at cluster scale) must flip the guarded probes onto
    the salted plan WITHOUT changing a single output triple; on the
    default flag the pipeline keeps its plain broadcast joins."""

    @staticmethod
    def _zipf_raw(tmp_path_factory):
        raw = tmp_path_factory.mktemp("mgi_zipf_raw")
        fx = dict(FIXTURES)
        # hub genotype 101 owns 60 of 69 fact rows over 10 distinct keys:
        # straggler factor 60*10/69 ≈ 8.7, well past the 4x threshold
        pair_cols = ["_allelepair_key", "_genotype_key", "_allele_key_1",
                     "_allele_key_2", "allele1", "allele2", "allelestate"]
        rows = [(600 + i, 101, 201, 202, "Pax6<Sey>", "Pax6<+>", "Heterozygous")
                for i in range(60)]
        rows += [(700 + j, 101 + j, 201, 202, "Pax6<Sey>", "Pax6<+>", "Homozygous")
                 for j in range(1, 10)]
        fx["gxd_allelepair_view.tsv"] = _tsv(pair_cols, rows)
        fx["gxd_genotype_summary_view.tsv"] = _tsv(
            ["_object_key", "preferred", "mgiid", "subtype", "short_description"],
            [(101, 1, "MGI:2166359", "Genotype", "Pax6 geno"),
             (102, 1, "MGI:7777777", "Genotype", "other geno")],
        )
        for name, content in fx.items():
            (raw / name).write_text(content)
        return str(raw)

    def test_guard_engages_on_planted_hub_key_with_identical_output(
        self, spark, tmp_path_factory
    ):
        from dipper_spark.core import graph_equal
        from dipper_spark.sources.mgi import MgiPipeline

        raw = self._zipf_raw(tmp_path_factory)
        plain = MgiPipeline()
        assert plain.guard_skew is False  # the documented default
        guarded = MgiPipeline()
        guarded.guard_skew = True

        g_plain = plain.transform(spark, raw).localCheckpoint(eager=True)
        g_guard = guarded.transform(spark, raw).localCheckpoint(eager=True)
        # the guard is a pure plan decision: triple-for-triple identical
        assert graph_equal(g_plain, g_guard)

        # plan lock: on the planted Zipfian key the guarded probe takes the
        # salted shape (dim replicated via explode -> Generate), which the
        # plain probe never contains
        fact = plain._read(spark, raw, "gxd_allelepair_view")
        dim = plain.genotype_dim(spark, raw)
        salted = guarded._probe(fact, dim, "_genotype_key", "inner")
        assert "Generate" in salted._jdf.queryExecution().executedPlan().toString() or \
               "explode" in salted._jdf.queryExecution().toString()
        plain_plan = plain._probe(fact, dim, "_genotype_key", "inner")
        txt = plain_plan._jdf.queryExecution().toString()
        assert "explode" not in txt

    def test_guard_stays_plain_on_uniform_key(self, spark, tmp_path_factory):
        from dipper_spark.sources.mgi import MgiPipeline

        raw = self._zipf_raw(tmp_path_factory)
        guarded = MgiPipeline()
        guarded.guard_skew = True
        # genotype_view has one row per genotype — no straggler, so even
        # with the guard armed the probe keeps the plain broadcast plan
        fact = guarded._read(spark, raw, "gxd_genotype_view")
        dim = guarded.genotype_dim(spark, raw)
        out = guarded._probe(fact, dim, "_genotype_key", "inner")
        assert "explode" not in out._jdf.queryExecution().toString()
