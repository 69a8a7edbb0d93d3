"""ETL CLI orchestration: multi-source run, per-source outputs, property
axioms, dataset metadata."""

import gzip
import os

from dipper_spark.etl import run
from dipper_spark.quality import add_property_axioms, default_property_table
from tests.test_sources import CTD_FIXTURE, HPOA_FIXTURE


def test_property_axioms(spark):
    from dipper_spark.core import TRIPLE_SCHEMA

    g = spark.createDataFrame(
        [
            ("OMIM:1", "RO:0002200", "HP:1", False, None, None),
            ("OMIM:1", "rdfs:label", "x", True, None, None),
            ("OMIM:1", "UNKNOWN:pred", "y", True, None, None),
        ],
        TRIPLE_SCHEMA,
    )
    out = add_property_axioms(g, default_property_table(spark))
    spo = {(r.subject, r.predicate, r.object) for r in out.collect()}
    assert ("RO:0002200", "rdf:type", "owl:ObjectProperty") in spo
    assert ("rdfs:label", "rdf:type", "owl:AnnotationProperty") in spo
    # unused ontology properties NOT injected
    assert not any(s == "RO:0003301" for s, _, _ in spo)
    # unknown predicates pass through untyped
    assert not any(s == "UNKNOWN:pred" and p == "rdf:type" for s, p, _ in spo)
    # hardcoded
    assert ("MONARCH:cliqueLeader", "rdf:type", "owl:AnnotationProperty") in spo


def test_etl_cli_end_to_end(spark, tmp_path):
    raw = tmp_path / "raw"
    out = tmp_path / "out"
    raw.mkdir()
    (raw / "phenotype.hpoa").write_text(HPOA_FIXTURE)
    (raw / "CTD_chemicals_diseases.tsv.gz").write_bytes(gzip.compress(CTD_FIXTURE.encode()))

    report = run(
        ["--sources", "hpoa,ctd", "--raw-dir", str(raw), "--out-dir", str(out),
         "--dest-fmt", "nt"],
        spark=spark,
    )
    assert set(report["sources"]) == {"hpoa", "ctd"}
    for name in ("hpoa", "ctd"):
        nt_dir = out / f"{name}.nt"
        lines = []
        for f in os.listdir(nt_dir):
            if f.startswith("part-"):
                lines += [ln for ln in open(nt_dir / f).read().splitlines() if ln]
        assert lines == sorted(lines) and len(lines) > 10
        joined = "\n".join(lines)
        # dataset metadata present (HCLS/VoID stanza)
        assert "void" in joined or "Dataset" in joined or "dataDump" in joined or "triples" in joined


def test_etl_unknown_source(spark, tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        run(
            ["--sources", "nope", "--raw-dir", str(tmp_path), "--out-dir", str(tmp_path)],
            spark=spark,
        )


def test_etl_all_formats(spark, tmp_path):
    """Every CLI dest-fmt produces a parseable artifact for the same source
    (Source.py:192-198 format table: nt/nquads/ttl/rdfxml/n3/parquet)."""
    import xml.etree.ElementTree as ET

    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "CTD_chemicals_diseases.tsv.gz").write_bytes(gzip.compress(CTD_FIXTURE.encode()))

    for fmt in ("nquads", "ttl", "rdfxml", "n3", "parquet"):
        out = tmp_path / f"out_{fmt}"
        run(
            ["--sources", "ctd", "--raw-dir", str(raw), "--out-dir", str(out),
             "--dest-fmt", fmt],
            spark=spark,
        )
        if fmt == "nquads":
            lines = []
            for name in sorted(os.listdir(out / "ctd.nq")):
                if name.startswith("part-"):
                    lines += open(out / "ctd.nq" / name).read().splitlines()
            assert lines and all(ln.endswith(" .") for ln in lines)
            # every quad carries the per-source MonarchData graph term, and
            # no '<null>' ever reaches the sink (ADVICE r1)
            assert all("data.monarchinitiative.org/ttl/ctd.ttl" in ln for ln in lines)
            assert not any("<null>" in ln for ln in lines)
        elif fmt == "ttl":
            text = open(out / "ctd.ttl").read()
            assert text.startswith("@prefix")
        elif fmt == "rdfxml":
            root = ET.parse(out / "ctd.rdf").getroot()
            assert root.tag.endswith("RDF") and len(root) > 0
        elif fmt == "n3":
            from dipper_spark.io.turtle_parse import parse_turtle

            assert len(parse_turtle(open(out / "ctd.n3").read())) > 0
        else:
            assert spark.read.parquet(str(out / "ctd.parquet")).count() > 0


def test_etl_parse_only_and_release_version(spark, tmp_path):
    raw = tmp_path / "raw"
    out = tmp_path / "out"
    raw.mkdir()
    (raw / "phenotype.hpoa").write_text(HPOA_FIXTURE)

    # --parse-only: triple counts reported, nothing written
    report = run(
        ["--sources", "hpoa", "--raw-dir", str(raw), "--out-dir", str(out),
         "--dest-fmt", "nt", "--parse-only"],
        spark=spark,
    )
    assert report["sources"]["hpoa"]["n_triples"] > 10
    assert not out.exists() or not any(out.iterdir())

    # --data-release-version lands in the dataset stanza's version IRIs
    report = run(
        ["--sources", "hpoa", "--raw-dir", str(raw), "--out-dir", str(out),
         "--dest-fmt", "nt", "--data-release-version", "209901"],
        spark=spark,
    )
    lines = []
    for f in os.listdir(out / "hpoa.nt"):
        if f.startswith("part-"):
            lines += open(out / "hpoa.nt" / f).read().splitlines()
    assert any("209901" in ln for ln in lines)


def test_etl_taxon_override(spark, tmp_path):
    from dipper_spark.sources import get_pipeline

    raw = tmp_path / "raw"
    raw.mkdir()
    # panther fixture: one human-mouse pair and one fly-worm pair; restricting
    # --taxon to 9606 must drop the fly-worm row
    rows = [
        "HUMAN|GeneID=1234|UniProtKB=P1\tMOUSE|GeneID=2176|UniProtKB=P2\tLDO\tEuarchontoglires\tPTHR10003",
        "DROME|Gene=Dmel_CG123|UniProtKB=P3\tCAEEL|Gene=WBGene4|UniProtKB=P4\tLDO\tBilateria\tPTHR10004",
    ]
    (raw / "RefGenomeOrthologs.tsv").write_text("\n".join(rows) + "\n")
    base = ["--raw-dir", str(raw), "--out-dir", str(tmp_path / "o"),
            "--dest-fmt", "nt", "--parse-only", "--sources", "panther"]
    all_tax = run(base, spark=spark)["sources"]["panther"]["n_triples"]
    human = run(base + ["--taxon", "9606"], spark=spark)["sources"]["panther"]["n_triples"]
    assert human < all_tax
    # the override is per-run state; restore the class default for other tests
    get_pipeline("panther").__class__.tax_ids = ["9606", "10090", "10116", "7955", "6239", "7227"]
