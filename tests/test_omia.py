"""OMIA: mysql-dump-XML table walker scan, species/breed/phene/gene classes,
breed model-of links with the OMIM phenotype-type filter
(reference OMIA.py:137-760, Source.process_xml_table Source.py:497-529)."""

import gzip

import pytest
from pyspark.sql import functions as F

from dipper_spark.io.readers import dump_table, read_mysqldump_xml
from dipper_spark.sources import get_pipeline


def _field(name, val):
    if val is None:
        return f'<field name="{name}" xsi:nil="true" />'
    return f'<field name="{name}">{val}</field>'


def _row(**fields):
    return "<row>" + "".join(_field(k, v) for k, v in fields.items()) + "</row>"


def _table(name, rows):
    return f'<table_data name="{name}">' + "".join(rows) + "</table_data>"


OMIA_XML = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<mysqldump xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">'
    "<database name=\"omia\">"
    + _table("Species_gb", [
        _row(gb_species_id="9913", sci_name="Bos taurus", com_name="cattle"),
        _row(gb_species_id="9685", sci_name="Felis catus", com_name=""),
    ])
    + _table("Breed", [
        _row(breed_id="758", breed_name="Holstein", gb_species_id="9913"),
        _row(breed_id="100", breed_name="Siamese", gb_species_id="9685"),
    ])
    + _table("Articles", [
        _row(article_id="50", title="A cattle study", year="1999",
             journal="Vet J", pubmed_id="12345"),
        _row(article_id="51", title="An unpublished note", year="2001",
             journal="", pubmed_id=None),
    ])
    + _table("Genes_gb", [
        _row(gene_id="281125", symbol="ASS1", gb_species_id="9913",
             gene_type="protein-coding"),
    ])
    + _table("OMIA_Group", [
        _row(omia_id="000201", group_name="Citrullinaemia",
             group_summary="urea cycle disorder", group_category="1"),
        _row(omia_id="001702", group_name="Lethal thing",
             group_summary="", group_category="13"),
    ])
    + _table("Phene", [
        _row(phene_id="7", omia_id="000201", gb_species_id="9913",
             phene_name="", summary="bovine citrullinaemia",
             inherit="R", characterised="Yes",
             clin_feat="lethargy", history="", pathology="", mol_gen="",
             control=""),
    ])
    + _table("Omim_Xref", [
        _row(omia_id="000201", omim_id="215700"),
        _row(omia_id="000201", omim_id="603470"),  # gene-typed -> filtered
    ])
    + _table("Article_Breed", [_row(article_id="50", breed_id="758")])
    + _table("Article_Phene", [_row(article_id="50", phene_id="7")])
    + _table("Breed_Phene", [_row(breed_id="758", phene_id="7")])
    + _table("Lida_Links", [
        _row(omia_id="000201", lidaurl="http://lida.example/x y"),
    ])
    + _table("Phene_Gene", [_row(phene_id="7", gene_id="281125")])
    + _table("Group_MPO", [_row(omia_id="001702", MPO_no="8762")])
    + "</database></mysqldump>"
)

MIMTITLES = (
    "# Copyright (c) 1966-2020\n"
    "# Prefix\tMIM Number\tPreferred Title; symbol\tAlternative Title(s); symbol(s)\tIncluded Title(s); symbols\n"
    "Number Sign\t215700\tCITRULLINEMIA, TYPE I; CTLN1\t\t\n"
    "Asterisk\t603470\tARGININOSUCCINATE SYNTHETASE 1; ASS1\t\t\n"
)


@pytest.fixture(scope="module")
def raw_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("omia_raw")
    with gzip.open(d / "omia.xml.gz", "wt", encoding="utf-8") as fh:
        fh.write(OMIA_XML)
    (d / "mimTitles.txt").write_text(MIMTITLES)
    return str(d)


@pytest.fixture(scope="module")
def graph(spark, raw_dir):
    return get_pipeline("omia").transform(spark, raw_dir).cache()


def _spo(graph):
    return {(r.subject, r.predicate, r.object) for r in graph.collect()}


class TestDumpReader:
    def test_table_projection_and_nil_fields(self, spark, raw_dir):
        dump = read_mysqldump_xml(
            spark, [f"{raw_dir}/omia.xml.gz"],
            {"Articles": ["article_id", "pubmed_id", "journal"]},
        )
        rows = {r.fields["article_id"]: r.fields for r in dump.collect()}
        assert set(rows) == {"50", "51"}
        assert rows["51"]["pubmed_id"] is None  # xsi:nil -> NULL
        t = dump_table(dump, "Articles", ["article_id", "journal"])
        assert t.columns == ["article_id", "journal"]

    def test_unrequested_tables_dropped(self, spark, raw_dir):
        dump = read_mysqldump_xml(
            spark, [f"{raw_dir}/omia.xml.gz"], {"Breed": ["breed_id"]}
        )
        assert {r.table for r in dump.collect()} == {"Breed"}


class TestOmiaGraph:
    def test_species_and_breed(self, graph):
        spo = _spo(graph)
        assert ("NCBITaxon:9913", "rdf:type", "owl:Class") in spo
        assert ("NCBITaxon:9913", "OIO:hasExactSynonym", "cattle") in spo
        # empty com_name -> no synonym, label falls back to sci_name downstream
        assert not any(
            s == "NCBITaxon:9685" and p == "OIO:hasExactSynonym" for s, p, o in spo
        )
        assert ("OMIA-breed:758", "rdfs:label", "Holstein (cattle)") in spo
        assert ("OMIA-breed:758", "rdf:type", "NCBITaxon:9913") in spo
        assert ("OMIA-breed:100", "rdfs:label", "Siamese (Felis catus)") in spo

    def test_group_and_phene_classes(self, graph):
        spo = _spo(graph)
        # group under its category disease parent (cat 1 -> MONDO:0019052)
        assert ("OMIA:000201", "rdfs:subClassOf", "MONDO:0019052") in spo
        assert ("OMIA:000201", "rdfs:label", "Citrullinaemia") in spo
        # species-specific phene subclass, fallback label, tagged description
        assert ("OMIA:000201-9913", "rdfs:subClassOf", "OMIA:000201") in spo
        assert ("OMIA:000201-9913", "rdfs:label", "Citrullinaemia in cattle") in spo
        assert ("OMIA:000201-9913", "dc:description", "lethargy [clin_feat]") in spo
        # in-taxon OWL restriction: subClassOf a restriction bnode
        rest = [o for s, p, o in spo if s == "OMIA:000201-9913"
                and p == "rdfs:subClassOf" and o.startswith("_:")]
        assert len(rest) == 1
        assert (rest[0], "owl:onProperty", "RO:0002162") in spo
        assert (rest[0], "owl:someValuesFrom", "NCBITaxon:9913") in spo

    def test_inheritance_association(self, graph):
        # inherit 'R' -> autosomal recessive GENO:0000150 via has-disposition
        spo = _spo(graph)
        assert ("OMIA:000201-9913", "RO:0000091", "GENO:0000150") in spo

    def test_embryonic_lethal_group_mpo(self, graph):
        spo = _spo(graph)
        # category 13 -> MP:0008762 both as parent and as D2P association
        assert ("OMIA:001702", "rdfs:subClassOf", "MP:0008762") in spo
        assert ("OMIA:001702", "RO:0002200", "MP:0008762") in spo
        # Group_MPO row adds the zero-padded MP association
        assert ("OMIA:001702", "RO:0002200", "MP:0008762") in spo

    def test_gene_and_variant_locus(self, graph):
        spo = _spo(graph)
        assert ("NCBIGene:281125", "rdfs:label", "ASS1") in spo
        assert ("NCBIGene:281125", "rdfs:subClassOf", "SO:0001217") in spo
        assert ("NCBIGene:281125", "RO:0002162", "NCBITaxon:9913") in spo
        var = [s for s, p, o in spo if p == "GENO:0000408" and o == "NCBIGene:281125"]
        assert len(var) == 1 and var[0].startswith("_:b")
        assert (var[0], "rdfs:label", "some variant of ASS1") in spo
        assert (var[0], "GENO:0000418", "NCBIGene:281125") in spo
        assert (var[0], "RO:0002200", "OMIA:000201-9913") in spo

    def test_omim_xref_and_filtered_model_of(self, graph):
        spo = _spo(graph)
        # both xrefs emitted
        assert ("OMIA:000201", "OIO:hasDbXref", "OMIM:215700") in spo
        assert ("OMIA:000201", "OIO:hasDbXref", "OMIM:603470") in spo
        # model-of only for the phenotype-typed OMIM entry
        assert ("OMIA-breed:758", "RO:0003301", "OMIM:215700") in spo
        assert ("OMIA-breed:758", "RO:0003301", "OMIM:603470") not in spo
        # breed has-phenotype phene
        assert ("OMIA-breed:758", "RO:0002200", "OMIA:000201-9913") in spo
        # description on the model-of association mentions the breed
        descs = [o for s, p, o in spo if p == "dc:description" and "Holstein" in o]
        assert any("model of disease OMIM:215700" in d for d in descs)

    def test_articles_and_links(self, graph):
        spo = _spo(graph)
        # pubmed-backed article: PMID is_about breed + phene; sameAs bnode
        assert ("PMID:12345", "IAO:0000136", "OMIA-breed:758") in spo
        assert ("PMID:12345", "IAO:0000136", "OMIA:000201-9913") in spo
        assert ("_:omiaarticlekey50", "owl:sameAs", "PMID:12345") in spo
        assert ("PMID:12345", "rdfs:comment", "omiaarticlekey50") in spo
        assert ("_:omiaarticlekey50", "rdf:type", "IAO:0000013") in spo
        assert ("_:omiaarticlekey51", "rdf:type", "IAO:0000311") in spo
        # lida url percent-encoded
        assert ("OMIA:000201", "OIO:hasDbXref", "http%3A//lida.example/x%20y") in spo

    def test_test_mode_filters_to_test_ids(self, spark, raw_dir):
        g = get_pipeline("omia").transform(spark, raw_dir, test_mode=True)
        spo = _spo(g)
        # OMIA:000201 is in the test id list -> phene kept; articles dropped
        assert any(s == "OMIA:000201-9913" for s, p, o in spo)
        assert not any(p == "IAO:0000136" and o == "OMIA-breed:758" for s, p, o in spo)


class TestOrthologyComposition:
    """OMIA.py:172: parse() bolts NCBI gene_group orthology for the
    phene-annotated genes onto OMIA's OWN graph."""

    GRP = "\n".join(
        [
            "#tax_id\tGeneID\trelationship\tOther_tax_id\tOther_GeneID",
            "9606\t445\tOrtholog\t9913\t281125",   # human ASS1 anchor → cattle
            "9606\t445\tOrtholog\t10090\t11898",   # → mouse
            "9606\t445\tRegion member\t9606\t777",  # non-ortholog dropped
            "9606\t999\tOrtholog\t9031\t888",       # group w/o annotated member
            "",
        ]
    )

    @pytest.fixture(scope="class")
    def ortho_graph(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("omia_ortho_raw")
        with gzip.open(d / "omia.xml.gz", "wt", encoding="utf-8") as fh:
            fh.write(OMIA_XML)
        (d / "mimTitles.txt").write_text(MIMTITLES)
        with gzip.open(d / "gene_group.gz", "wt") as fh:
            fh.write(self.GRP)
        return get_pipeline("omia").transform(spark, str(d)).cache()

    def test_annotated_gene_gets_group_orthologs(self, ortho_graph):
        t = _spo(ortho_graph.filter(F.col("predicate") == "RO:HOM0000017"))
        # the ONLY annotated gene is 281125 (the Phene_Gene row); it pairs
        # with every member of its anchor group — anchor, other member, self
        assert ("NCBIGene:281125", "RO:HOM0000017", "NCBIGene:445") in t
        assert ("NCBIGene:281125", "RO:HOM0000017", "NCBIGene:11898") in t
        assert ("NCBIGene:281125", "RO:HOM0000017", "NCBIGene:281125") in t
        # unannotated groups contribute nothing
        assert not any("888" in o or "999" in o for _, _, o in t)
        # target stanza + taxon ride along in OMIA's graph
        full = _spo(ortho_graph)
        assert ("NCBIGene:11898", "RO:0002162", "NCBITaxon:10090") in full
        assert ("NCBIGene:11898", "rdfs:subClassOf", "SO:0000704") in full

    def test_triples_claimed_by_omia_graph(self, ortho_graph):
        rows = ortho_graph.filter(
            (F.col("predicate") == "RO:HOM0000017")
        ).select("graph_id").distinct().collect()
        assert [r.graph_id for r in rows] == ["omia"]


def test_no_orthology_without_gene_group(graph):
    # the module fixture stages NO gene_group.gz → degraded mode, no
    # orthology stanzas in the graph
    assert graph.filter(F.col("predicate") == "RO:HOM0000017").count() == 0


def test_whole_graph_serializes_strict(graph):
    from conftest import assert_strict_nt

    assert_strict_nt(graph)


def test_omia_integration_iri_golden(graph):
    """Ported from /root/reference/tests/omia-integration.py: the breed→OMIM
    model-of contract checked at the IRI level.  The reference asserts
    <https://monarchinitiative.org/model/OMIA-breed:758> RO_0003301
    <http://omim.org/entry/...> pairs exist in the rendered graph; here the
    same expansion runs through our curie registry over the model-of rows."""
    from dipper_spark.core.curie import CurieMap

    reg = CurieMap()
    pairs = {
        (reg.expand_str(s), reg.expand_str(o))
        for s, p, o in _spo(graph)
        if p == "RO:0003301"
    }
    assert (
        "https://monarchinitiative.org/model/OMIA-breed:758",
        "http://omim.org/entry/215700",
    ) in pairs
    # the predicate itself must expand to the OBO RO IRI the integration
    # script greps for
    assert reg.expand_str("RO:0003301") == "http://purl.obolibrary.org/obo/RO_0003301"
