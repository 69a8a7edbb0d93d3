"""NCBIGene: typed gene classes, dbxref equivalency dispatch, chrom/band
placement, history deprecation, gene2pubmed, gene_group orthology self-join.

Fixture schema: FIXTURES.md §6 (reference contract NCBIGene.py:46-99)."""

import gzip

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import get_pipeline

INFO_COLS = get_pipeline("ncbigene").files["gene_info"].columns


def _info_row(**kw):
    row = {c: "-" for c in INFO_COLS}
    row.update(kw)
    return "\t".join(row[c] for c in INFO_COLS)


GENE_INFO = "\n".join(
    [
        "#" + "\t".join(INFO_COLS),
        # protein-coding human gene: full decoration incl. band placement
        _info_row(
            tax_id="9606", GeneID="8", Symbol="A2MP1", Synonyms="A2MP",
            dbXrefs="MIM:614444|HGNC:HGNC:8|Ensembl:ENSG00000256069|HPRD:11479|Vega:OTTHUMG1",
            chromosome="12", map_location="12p13.31", description="pseudogene A2MP1",
            type_of_gene="pseudo",
            Full_name_from_nomenclature_authority="alpha-2-macroglobulin pseudogene 1",
            Other_designations="pregnancy zone protein family",
        ),
        # sequence feature (individual, not class); X|Y PAR explode
        _info_row(
            tax_id="9606", GeneID="17", Symbol="AAVS1", chromosome="X|Y",
            map_location="Xp22.33; Yp11.3", type_of_gene="other",
        ),
        # ambiguous multi-chrom → no placement; NEWENTRY → no label
        _info_row(tax_id="10090", GeneID="30188", Symbol="NEWENTRY", chromosome="10|19|3",
                  type_of_gene="protein-coding"),
        # filtered: taxon not configured
        _info_row(tax_id="4932", GeneID="999", Symbol="YAL1", type_of_gene="protein-coding"),
        "",
    ]
)

HIST = "\n".join(
    [
        "#tax_id\tGeneID\tDiscontinued_GeneID\tDiscontinued_Symbol\tDiscontinue_Date",
        "9606\t8\t280\tA2MP-OLD\t20050510",
        "9606\t-\t281\tGONE\t20050510",  # no replacement → dropped
        "4932\t7\t282\tYEAST\t20050510",  # taxon filtered
        "",
    ]
)

G2P = "\n".join(
    [
        "#tax_id\tGeneID\tPubMed_ID",
        "9606\t8\t9873079",
        "9606\t8\t9873079",  # dup collapses
        "4932\t999\t1\t",  # taxon filtered
        "",
    ]
)

GRP = "\n".join(
    [
        "#tax_id\tGeneID\trelationship\tOther_tax_id\tOther_GeneID",
        "9606\t8\tOrtholog\t10090\t11287",
        "9606\t8\tOrtholog\t7955\t30188",
        "9606\t8\tRegion member\t9606\t1234",  # non-ortholog dropped
        "",
    ]
)


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("ncbigene_raw")
    src = get_pipeline("ncbigene")
    files = {"gene_info": GENE_INFO, "gene_history": HIST, "gene2pubmed": G2P, "gene_group": GRP}
    for key, content in files.items():
        with gzip.open(raw / src.files[key].file, "wt") as fh:
            fh.write(content)
    return src.transform(spark, str(raw)).cache()


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


class TestGeneInfo:
    def test_typed_class_with_label(self, graph):
        t = _spo(graph.filter(F.col("subject") == "NCBIGene:8"))
        assert ("NCBIGene:8", "rdf:type", "owl:Class") in t
        # addClassToGraph's type param is a SUBCLASS edge (Model.py:114-120)
        assert ("NCBIGene:8", "rdfs:subClassOf", "SO:0000336") in t  # pseudo
        assert ("NCBIGene:8", "rdfs:label", "A2MP1") in t
        assert ("NCBIGene:8", "dc:description", "pseudogene A2MP1") in t
        assert ("NCBIGene:8", "RO:0002162", "NCBITaxon:9606") in t

    def test_sequence_feature_is_individual(self, graph):
        t = _spo(graph.filter(F.col("subject") == "NCBIGene:17"))
        # reference Model.addIndividualToGraph with an explicit type emits
        # ONLY that type (NCBIGene.py:289) — no owl:NamedIndividual fallback
        assert ("NCBIGene:17", "rdf:type", "SO:0000110") in t
        assert not any(o == "owl:NamedIndividual" for _, _, o in t)
        assert not any(o == "owl:Class" for _, _, o in t)

    def test_newentry_unlabeled(self, graph):
        labels = graph.filter(
            (F.col("subject") == "NCBIGene:30188") & (F.col("predicate") == "rdfs:label")
        ).count()
        assert labels == 0

    def test_taxon_filter(self, graph):
        assert graph.filter(F.col("subject") == "NCBIGene:999").count() == 0

    def test_synonyms(self, graph):
        t = _spo(graph.filter(F.col("predicate").isin("OIO:hasRelatedSynonym", "OIO:hasExactSynonym")))
        assert ("NCBIGene:8", "OIO:hasExactSynonym", "alpha-2-macroglobulin pseudogene 1") in t
        assert ("NCBIGene:8", "OIO:hasRelatedSynonym", "A2MP") in t
        assert ("NCBIGene:8", "OIO:hasRelatedSynonym", "pregnancy zone protein family") in t
        # history symbol becomes an EXACT synonym of the survivor
        # (addSynonym default, NCBIGene.py:583)
        assert ("NCBIGene:8", "OIO:hasExactSynonym", "A2MP-OLD") in t


class TestDbxrefDispatch:
    def test_destutter_and_equivalence(self, graph):
        t = _spo(graph.filter(F.col("predicate") == "owl:equivalentClass"))
        assert ("NCBIGene:8", "owl:equivalentClass", "HGNC:8") in t       # HGNC:HGNC destutter
        # this fixture stages NO mimTitles.txt: without the typing dimension
        # the OMIM gene-type gate cannot run, so OMIM dbxrefs must be
        # DROPPED (safe-direction degradation), never linked ungated
        assert not any(o.startswith("OMIM:") for _, _, o in t)
        assert graph.filter(F.col("object") == "OMIM:614444").count() == 0

    def test_hprd_is_gene_product(self, graph):
        t = _spo(graph.filter(F.col("predicate") == "RO:0002205"))
        assert ("NCBIGene:8", "RO:0002205", "HPRD:11479") in t

    def test_ensembl_is_loose_xref(self, graph):
        t = _spo(graph.filter(F.col("predicate") == "OIO:hasDbXref"))
        assert ("NCBIGene:8", "OIO:hasDbXref", "ENSEMBL:ENSG00000256069") in t
        assert not any(
            o == "ENSEMBL:ENSG00000256069" for _, p, o in _spo(graph) if p == "owl:equivalentClass"
        )

    def test_vega_filtered(self, graph):
        assert graph.filter(F.col("object").contains("OTTHUMG")).count() == 0


class TestPlacement:
    def test_band_level(self, graph):
        rows = graph.filter(
            (F.col("subject") == "NCBIGene:8") & (F.col("predicate") == "RO:0002525")
        ).collect()
        assert len(rows) == 1
        assert rows[0].object.endswith("9606chr12p13.31")

    def test_ambiguous_chrom_skipped(self, graph):
        assert graph.filter(
            (F.col("subject") == "NCBIGene:30188") & (F.col("predicate") == "RO:0002525")
        ).count() == 0

    def test_par_explodes_both(self, graph):
        objs = {
            r.object
            for r in graph.filter(
                (F.col("subject") == "NCBIGene:17") & (F.col("predicate") == "RO:0002525")
            ).collect()
        }
        # 'Xp22.33; Yp11.3' doesn't match the single-band regexp → chromosome level
        assert any("9606chrX" in o for o in objs) and any("9606chrY" in o for o in objs)


class TestHistoryPubsOrthology:
    def test_deprecation(self, graph):
        t = _spo(graph.filter(F.col("subject") == "NCBIGene:280"))
        assert ("NCBIGene:280", "owl:deprecated", "true") in t
        assert ("NCBIGene:280", "IAO:0100001", "NCBIGene:8") in t
        # dropped when replacement missing; taxon filtered
        assert graph.filter(F.col("subject") == "NCBIGene:281").count() == 0
        assert graph.filter(F.col("subject") == "NCBIGene:282").count() == 0

    def test_gene2pubmed(self, graph):
        t = _spo(graph.filter(F.col("subject") == "PMID:9873079"))
        assert ("PMID:9873079", "IAO:0000136", "NCBIGene:8") in t
        assert ("PMID:9873079", "rdf:type", "IAO:0000013") in t
        assert graph.filter(F.col("subject") == "PMID:1").count() == 0

    def test_orthology_not_in_parse(self, graph):
        # the reference does NOT run add_orthologs_by_gene_group from parse()
        # (NCBIGene.py:691-692); the main graph has no orthology edges
        assert graph.filter(F.col("predicate") == "RO:HOM0000017").count() == 0


class TestOrthologGraphSurface:
    """add_orthologs_by_gene_group as the OMIA-style composition surface."""

    @pytest.fixture(scope="class")
    def ortho(self, spark, tmp_path_factory):
        raw = tmp_path_factory.mktemp("ncbigene_grp_raw")
        src = get_pipeline("ncbigene")
        with gzip.open(raw / src.files["gene_group"].file, "wt") as fh:
            fh.write(GRP)
        return src.ortholog_graph(spark, str(raw), ["NCBIGene:11287", "NCBIGene:8"]).cache()

    def test_member_reaches_group_through_anchor(self, ortho):
        t = _spo(ortho.filter(F.col("predicate") == "RO:HOM0000017"))
        # member 11287 pairs with every group member — the anchor, the other
        # member, and ITSELF (the reference loop does not exclude self-pairs)
        assert ("NCBIGene:11287", "RO:HOM0000017", "NCBIGene:8") in t
        assert ("NCBIGene:11287", "RO:HOM0000017", "NCBIGene:30188") in t
        assert ("NCBIGene:11287", "RO:HOM0000017", "NCBIGene:11287") in t
        # anchor-only genes appear in gene_to_group only via the MEMBER side
        # (NCBIGene.py:736-738) — gid 8 contributes nothing as subject
        assert not any(s == "NCBIGene:8" for s, _, _ in t)
        # non-Ortholog relationship rows contribute nothing
        assert not any("1234" in o for _, _, o in t)

    def test_ortholog_taxon_and_reified_assoc(self, ortho):
        t = _spo(ortho)
        assert ("NCBIGene:30188", "RO:0002162", "NCBITaxon:7955") in t
        assert ("NCBIGene:30188", "rdfs:subClassOf", "SO:0000704") in t
        # the association star carries the method paper as dc source
        assoc = {s for s, p, o in t if p == "dc:source" and o == "PMID:24063302"}
        assert assoc and all(a.startswith("MONARCH:b") for a in assoc)
