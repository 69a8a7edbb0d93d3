"""Round-2 source batch: mgislim, zfinslim, monarch, eom, genereviews,
ebi_g2p, decipher, mydrug, mmrrc, monochrom — closing the registry to the
reference's full 41 (reference MGISlim.py, ZFINSlim.py, Monarch.py, EOM.py,
GeneReviews.py, EBIGene2Phen.py, Decipher.py, MyDrug.py, MMRRC.py,
Monochrom.py)."""

import gzip
import json
import zipfile

import pytest
from pyspark.sql import functions as F

from dipper_spark.sources import REGISTRY, get_pipeline


def _spo(graph):
    return {(r.subject, r.predicate, r.object) for r in graph.collect()}


def test_registry_full_parity():
    # the reference CLI maps 41 source names (dipper-etl.py:20-62)
    assert len(REGISTRY) == 41


class TestMgiSlim:
    @pytest.fixture(scope="class")
    def graph(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("mgislim")
        (d / "mousemine_mp_annotations.tsv").write_text(
            "gene_id\tsymbol\tso_name\tmp_id\tmp_name\tpmid\tcomment_type\tcomment_desc\n"
            "MGI:97486\tPax6\tprotein coding gene\tMP:0001262\tdecreased body weight\t12345\t\t\n"
            "MGI:97486\tPax6\tprotein coding gene\tMP:0001286\tabnormal eye\t\t\t\n"
        )
        return get_pipeline("mgislim").transform(spark, str(d)).cache()

    def test_g2p(self, graph):
        spo = _spo(graph)
        assert ("MGI:97486", "rdf:type", "SO:0000704") in spo
        assert ("MGI:97486", "RO:0002162", "NCBITaxon:10090") in spo
        assert ("MGI:97486", "RO:0002200", "MP:0001262") in spo
        assert ("PMID:12345", "rdf:type", "IAO:0000013") in spo
        assert any(p == "RO:0002558" and o == "ECO:0000059" for s, p, o in spo)
        # pmid-less row still associates, without a source
        assert ("MGI:97486", "RO:0002200", "MP:0001286") in spo


class TestZfinSlim:
    @pytest.fixture(scope="class")
    def graph(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("zfinslim")
        # zp map: 7 '-'-joined parts (sub1-rel1-sup1-quality-sub2-rel2-sup2)
        (d / "id_map_zfin.tsv").write_text(
            "iri\tid\n"
            "ZP:0004134\tZFA:0000672-BFO:0000050-ZFA:0001439-PATO:0000642-0-0-0\n"
        )
        cols = [""] * 25
        cols[2] = "ZDB-GENE-980526-166"
        cols[3] = "ZFA:0000672"
        cols[5] = "BFO:0000050"
        cols[7] = "ZFA:0001439"
        cols[9] = "PATO:0000642"
        cols[11] = "abnormal"
        cols[23] = "ZDB-PUB-1"
        bad = list(cols)
        bad[11] = "normal"
        (d / "phenoGeneCleanData_fish.txt").write_text(
            "\t".join(cols) + "\n" + "\t".join(bad) + "\n"
        )
        return get_pipeline("zfinslim").transform(spark, str(d)).cache()

    def test_zp_mapping(self, graph):
        spo = _spo(graph)
        assert ("ZFIN:ZDB-GENE-980526-166", "RO:0002200", "ZP:0004134") in spo
        assert any(p == "dc:source" and o == "ZFIN:ZDB-PUB-1" for s, p, o in spo)
        assert ("ZFIN:ZDB-PUB-1", "rdf:type", "IAO:0000310") in spo
        assert ("ZFIN:ZDB-GENE-980526-166", "MONARCH:cliqueLeader", "true") in spo
        # only ONE association (the 'normal' modifier row is dropped)
        assocs = [s for s, p, o in spo if p == "OBAN:association_has_predicate"]
        assert len(assocs) == 1


class TestMonarch:
    @pytest.fixture(scope="class")
    def graph(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("monarch")
        sub = d / "OMIA-disease-phenotype"
        sub.mkdir()
        header = (
            "Disease ID\tSpecies ID\tBreed Name\tVariant\tInheritance\t"
            "Phenotype ID\tPhenotype Name\tEntity ID\tEntity Name\tQuality ID\t"
            "Quality Name\tRelated Entity ID\tRelated Entity Name\tAbnormal ID\t"
            "Abnormal Name\tPhenotype Desc\tAssay\tFrequency\tPubmed ID\t"
            "Pub Desc\tCurator Notes\tDate Created\n"
        )
        (sub / "000060.txt").write_text(
            header
            + "60\t9913\tHolstein\t\t\tHP:0000252\tmicrocephaly\t\t\t\t\t\t\t\t\t"
              "\tnecropsy\t\tPMID: 123; 456\tdesc here\tnote\t2020-01-01\n"
            + "60\t\t\t\t\tHP:0000001\tx\t\t\t\t\t\t\t\t\t\t\t\t\t\t\t\n"
        )
        return get_pipeline("monarch").transform(spark, str(d)).cache()

    def test_d2p(self, graph):
        spo = _spo(graph)
        # zero-padded, species-qualified disease id
        assert ("OMIA:000060-9913", "RO:0002200", "HP:0000252") in spo
        # scrubbed pmids as sources
        assert any(p == "dc:source" and o == "PMID:123" for s, p, o in spo)
        assert any(p == "dc:source" and o == "PMID:456" for s, p, o in spo)
        # species-less row: unqualified id + OMIA-url source fallback
        assert ("OMIA:000060", "RO:0002200", "HP:0000001") in spo
        assert any(
            p == "dc:source" and str(o).startswith("https://omia.org/OMIA000060")
            for s, p, o in spo
        )
        # assoc decorations
        assert any(p == "dc:description" and o == "desc here" for s, p, o in spo)
        assert any(p == "dc:description" and o == "Holstein [observed in]" for s, p, o in spo)
        assert any(p == "dc:description" and o == "necropsy [assay]" for s, p, o in spo)
        assert any(p == "rdfs:comment" and o == "note" for s, p, o in spo)


class TestEom:
    @pytest.fixture(scope="class")
    def graph(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("eom")
        cols = [
            "morphology_term_id", "morphology_term_num", "morphology_term_label",
            "morphology_term_url", "terminology_category_label",
            "terminology_category_url", "subcategory", "objective_definition",
            "subjective_definition", "comments", "synonyms", "replaces",
            "small_figure_url", "large_figure_url", "e_uid", "v_uid", "v_uuid",
            "v_lastmodified", "v_status", "v_lastmodified_epoch",
        ]
        row = {c: "" for c in cols}
        row.update({
            "morphology_term_id": "OBO:EOM_0000001",
            "morphology_term_label": "Macrocephaly",
            "morphology_term_url": "http://example.org/page",
            "objective_definition": "Big head",
            "subjective_definition": "Head looks big.",
            "synonyms": "megacephaly; big head",
            "replaces": "old name",
            "small_figure_url": "http://example.org/small.png",
        })
        (d / "dvp.pr_nlx_157874_1").write_text(
            "\t".join(cols) + "\n" + "\t".join(row[c] for c in cols) + "\n"
        )
        (d / "hp-to-eom-mapping.tsv").write_text(
            "morphology_term_id\tmorphology_term_label\tHP ID\tHP Label\tNotes\n"
            "OBO:EOM_0000001\tMacrocephaly\tHP_0000256\tMacrocephaly\t\n"
        )
        return get_pipeline("eom").transform(spark, str(d)).cache()

    def test_classes_and_mapping(self, graph):
        spo = _spo(graph)
        assert ("OBO:EOM_0000001", "rdfs:label", "Macrocephaly") in spo
        # trailing periods enforced then concatenated
        assert ("OBO:EOM_0000001", "IAO:0000115", "Big head.  Head looks big.") in spo
        assert ("OBO:EOM_0000001", "OIO:hasExactSynonym", "megacephaly") in spo
        assert ("OBO:EOM_0000001", "OIO:hasExactSynonym", "big head") in spo
        assert ("OBO:EOM_0000001", "OIO:hasRelatedSynonym", "old name") in spo
        assert ("OBO:EOM_0000001", "foaf:depiction", "http://example.org/small.png") in spo
        assert ("OBO:EOM_0000001", "foaf:page", "http://example.org/page") in spo
        # underscore→colon HP id equivalence
        assert ("OBO:EOM_0000001", "owl:equivalentClass", "HP:0000256") in spo


class TestGeneReviews:
    @pytest.fixture(scope="class")
    def graph(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("genereviews")
        (d / "GRtitle_shortname_NBKid.txt").write_text(
            "#GR_shortname\tGR_Title\tNBK_id\tPMID\n"
            "cdls\tCornelia de Lange Syndrome\tNBK1104\t20301283\n"
        )
        (d / "NBKid_shortname_OMIM.txt").write_text(
            "#NBK_id\tGR_shortname\tOMIM\n"
            "NBK1104\tcdls\t122470\n"
            "NBK1104\tcdls\t608749\n"   # gene-typed -> filtered
            "NBK1104\tcdls\t12347\n"    # malformed (5 digits) -> skipped
        )
        (d / "mimTitles.txt").write_text(
            "# Copyright\n"
            "# Prefix\tMIM Number\tPreferred Title; symbol\tAlternative Title(s); symbol(s)\tIncluded Title(s); symbols\n"
            "Number Sign\t122470\tCORNELIA DE LANGE SYNDROME 1; CDLS1\t\t\n"
            "Asterisk\t608749\tNIPBL GENE; NIPBL\t\t\n"
        )
        return get_pipeline("genereviews").transform(spark, str(d)).cache()

    def test_books_and_couplings(self, graph):
        spo = _spo(graph)
        assert ("GeneReviews:NBK1104", "rdfs:label", "Cornelia de Lange Syndrome") in spo
        assert ("GeneReviews:NBK1104", "OIO:hasExactSynonym", "cdls") in spo
        assert ("GeneReviews:NBK1104", "rdfs:subClassOf", "MONDO:0000001") in spo
        # phenotype-typed OMIM under the book; gene-typed filtered out
        assert ("OMIM:122470", "rdfs:subClassOf", "GeneReviews:NBK1104") in spo
        assert ("OMIM:608749", "rdfs:subClassOf", "GeneReviews:NBK1104") not in spo
        assert not any("12347" == str(o).split(":")[-1] for s, p, o in spo)


class TestEbiG2P:
    @pytest.fixture(scope="class")
    def graph(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("ebi")
        header = (
            "gene symbol,gene mim,disease name,disease mim,DDD category,"
            "allelic requirement,mutation consequence,phenotypes,organ specificity list,"
            "pmids,panel,prev symbols,hgnc id,entry date\n"
        )
        with gzip.open(d / "DDG2P.csv.gz", "wt") as fh:
            fh.write(
                header
                + "KIF7,611254,ACROCALLOSAL SYNDROME,200990,confirmed,biallelic,"
                  "loss of function,,,12345;67890,DD,,30497,2015-07-22\n"
                + "GENE2,0,Some unmapped disease,No disease mim,probable,monoallelic,"
                  "uncertain,,,,DD,,99999,2015-07-22\n"
            )
        (d / "unmapped_ebi_diseases.tsv").write_text(
            "Some unmapped disease\tMONDO:0012345\n"
        )
        return get_pipeline("ebi_g2p").transform(spark, str(d)).cache()

    def test_variant_model(self, graph):
        spo = _spo(graph)
        # consequence row mints a variant-locus bnode carrying the assoc
        var = [s for s, p, o in spo if p == "rdfs:label"
               and o == "loss of function variant of KIF7"]
        assert len(var) == 1 and var[0].startswith("_:b")
        v = var[0]
        assert (v, "rdf:type", "GENO:0000002") in spo
        assert (v, "GENO:0000418", "HGNC:30497") in spo
        # functional consequence dispatch + placeholder resolution
        assert (v, ":has_functional_consequence", "SO:0002054") in spo
        # confirmed -> pathogenic_for_condition (ebi_g2p.yaml)
        assert (v, "GENO:0000840", "OMIM:200990") in spo
        assert any(p == "dc:source" and o == "PMID:12345" for s, p, o in spo)

    def test_gene_level_with_mondo_map(self, graph):
        spo = _spo(graph)
        # uncertain consequence -> gene-level assoc; mondo-mapped disease
        # probable -> likely_pathogenic_for_condition
        assert ("HGNC:99999", "GENO:0000841", "MONDO:0012345") in spo
        # allelic requirement decorates the assoc (monoallelic placeholder)
        assert any(
            p == ":has_allelic_requirement" and o == ":monoallelic" for s, p, o in spo
        )
        assert (":monoallelic", "rdfs:label", "monoallelic") in spo


class TestDecipher:
    @pytest.fixture(scope="class")
    def graph(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("decipher")
        with zipfile.ZipFile(d / "ddg2p.zip", "w") as zf:
            zf.writestr(
                "ddg2p.txt",
                "#gencode_gene_name\tmode\tcategory\tconsequence\tdisease\tomim\tddg2p_id\tpubmed_ids\thpo_codes\n"
                "ARSE\tX-linked\tConfirmed DD gene\tLoss of function\tCHONDRODYSPLASIA PUNCTATA\t302950\tDDG2P_1\t8696334;10851256\t\n"
                "NOOMIM\tmono\tProbable\tActivating\tMystery disease\t\tDDG2P_2\t\t\n",
            )
        (d / "hgnc_complete_set.txt").write_text(
            "hgnc_id\tsymbol\n"
            "HGNC:719\tARSE\n"
            "HGNC:1\tNOOMIM\n"
        )
        return get_pipeline("decipher").transform(spark, str(d)).cache()

    def test_consequence_allele(self, graph):
        spo = _spo(graph)
        allele = [s for s, p, o in spo if p == "rdfs:label"
                  and o == "Loss of function allele in ARSE"]
        assert len(allele) == 1 and allele[0].startswith("_:b")
        a = allele[0]
        # localtt: Loss of function -> loss_of_function_variant SO:0002054
        assert (a, "rdf:type", "SO:0002054") in spo
        assert (a, "GENO:0000408", "HGNC:719") in spo
        assert (a, "RO:0002200", "OMIM:302950") in spo
        assert any(p == "dc:source" and o == "PMID:8696334" for s, p, o in spo)
        # rows without an omim id are dropped
        assert not any(o == "Mystery disease" for s, p, o in spo)


class TestMyDrug:
    @pytest.fixture(scope="class")
    def graph(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("mydrug")
        doc = {
            "aeolus": {
                "rxcui": "4024", "unii": "X7BCI9A9RS", "drug_name": "estradiol",
                "outcomes": [
                    {"code": "10002034", "name": "anaphylaxis", "id": "o1",
                     "case_count": 17, "prr": 2.5, "ror": 2.75},
                    {"code": "10012345", "name": "weak signal", "id": "o2",
                     "case_count": 2, "prr": 0.3, "ror": 0.5},
                ],
            },
            "unii": {"inchikey": "VOXZDWNPVJITMN-ZBRFXRBCSA-N"},
        }
        (d / "aeolus.json").write_text(json.dumps(doc) + "\n")
        return get_pipeline("mydrug").transform(spark, str(d)).cache()

    def test_drug_outcome_star(self, graph):
        spo = _spo(graph)
        assert ("RXCUI:4024", "rdfs:label", "estradiol") in spo
        assert ("RXCUI:4024", "owl:sameAs", "UNII:X7BCI9A9RS") in spo
        assert ("RXCUI:4024", "CHEBI:InChIKey", "VOXZDWNPVJITMN-ZBRFXRBCSA-N") in spo
        assert ("RXCUI:4024", "RO:0003302", "MEDDRA:10002034") in spo
        # below the odds-ratio cut-off -> dropped
        assert not any(o == "MEDDRA:10012345" for s, p, o in spo)
        # SEPIO evidence line with measurements
        evs = [o for s, p, o in spo if p == "SEPIO:0000007"]
        assert len(evs) == 1
        ev = evs[0]
        assert (ev, "rdf:type", "ECO:0000180") in spo
        assert (ev, "SEPIO:0000124", "PMID:27193236") in spo
        assert (ev, "dc:source", "DOI:10.5061/dryad.8q0s4/1") in spo
        items = {o for s, p, o in spo if s == ev and p == "SEPIO:0000084"}
        assert len(items) == 3
        assert any(p == "STATO:0000129" and o == "17" for s, p, o in spo)


class TestMmrrc:
    @pytest.fixture(scope="class")
    def graph(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("mmrrc")
        header = ",".join([
            "STRAIN/STOCK_ID", "STRAIN/STOCK_DESIGNATION", "STRAIN_TYPE", "STATE",
            "MGI_ALLELE_ACCESSION_ID", "ALLELE_SYMBOL", "ALLELE_NAME",
            "MUTATION_TYPE", "CHROMOSOME", "MGI_GENE_ACCESSION_ID", "GENE_SYMBOL",
            "GENE_NAME", "SDS_URL", "ACCEPTED_DATE", "MPT_IDS", "PUBMED_IDS",
            "RESEARCH_AREAS",
        ])
        (d / "mmrrc_catalog_data.csv").write_text(
            header + "\n"
            + 'MMRRC:037507-MU,STOCK Pax6,MSR,LA,MGI:1856155,Pax6<sey>,,CM,2,'
              'MGI:97490,Pax6,paired box 6,,2010-01-01,"ataxia [MP:0001393] ,'
              'small eyes [MP:0001286]","PMID: 8356452, PMID: 7865461",Neurology\n'
            + "MMRRC:000255-MU,GENE ONLY STRAIN,MSR,ES,,,,,,GeneID:12345,Abc1,"
              "atp binding,,2010-01-01,,,\n"
        )
        return get_pipeline("mmrrc").transform(spark, str(d)).cache()

    def test_strain_and_phenotypes(self, graph):
        spo = _spo(graph)
        # holding-center suffix stripped; mouse-typed individual
        assert ("MMRRC:037507", "rdfs:label", "STOCK Pax6") in spo
        assert ("MMRRC:037507", "rdf:type", "NCBITaxon:10090") in spo
        assert ("MMRRC:037507", "dc:description", "Research Areas: Neurology") in spo
        # ES state -> stem-cell typing
        assert ("MMRRC:000255", "rdf:type", "CL:0000034") in spo
        # bracketed MP ids on the allele with pmid sources
        assert ("MGI:1856155", "RO:0002200", "MP:0001393") in spo
        assert ("MGI:1856155", "RO:0002200", "MP:0001286") in spo
        assert any(p == "dc:source" and o == "PMID:8356452" for s, p, o in spo)

    def test_genotype_partonomy(self, graph):
        spo = _spo(graph)
        # 1 variant + 1 gene -> allele-of edge; variant-locus typing
        assert ("MGI:1856155", "rdf:type", "GENO:0000002") in spo
        assert ("MGI:1856155", "GENO:0000408", "MGI:97490") in spo
        # vslc with indeterminate zygosity wrapping the variant
        vslcs = {s for s, p, o in spo if p == "GENO:0000608" and o == "GENO:0000137"}
        assert len(vslcs) == 2  # one per strain
        assert any((v, "GENO:0000382", "MGI:1856155") in spo for v in vslcs)
        # gene-only strain mints an anonymous '<?>' variant locus
        assert any(p == "rdfs:label" and o == "Abc1<?>" for s, p, o in spo)
        assert ("NCBIGene:12345", "rdfs:label", "Abc1") in spo
        # genotype linked from each strain, typed intrinsic, with background
        genotypes = {o for s, p, o in spo if p == "GENO:0000222"}
        assert len(genotypes) == 2
        for gt in genotypes:
            # intrinsic genotype resolves to GENO:0000719 in the reference
            # globaltt (previously GENO:0000000)
            assert (gt, "rdf:type", "GENO:0000719") in spo
        assert any(p == "rdfs:label" and str(o).endswith(" [n.s.]") for s, p, o in spo)
        assert any(p == "GENO:0000385" for s, p, o in spo)  # has_reference_part bkgd


class TestMonochrom:
    @pytest.fixture(scope="class")
    def graph(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("monochrom")
        with gzip.open(d / "9606cytoBand.txt.gz", "wt") as fh:
            fh.write(
                "chr13\t4500000\t10000000\tp12\tstalk\n"
                "chr13\t10000000\t16300000\tq21.31\tgneg\n"
                "chr13_KL568008v1_random\t0\t100\t\tgneg\n"
            )
        return get_pipeline("monochrom").transform(spark, str(d)).cache()

    def test_chromosome_ontology(self, graph):
        spo = _spo(graph)
        # genome bnode class with in-taxon restriction
        assert ("_:NCBITaxon:9606genome", "rdfs:label", "Human genome") in spo
        assert ("_:NCBITaxon:9606genome", "rdfs:subClassOf", "SO:0001026") in spo
        assert ("NCBITaxon:9606", "OIO:hasExactSynonym", "Human") in spo
        # chromosome class under SO:chromosome, unplaced scaffold skipped
        assert ("CHR:9606chr13", "rdfs:subClassOf", "SO:0000340") in spo
        assert not any("KL568008" in s for s, p, o in spo)
        # band classes: leaf typed from stain code, parents by notation
        assert ("CHR:9606chr13q21.31", "rdfs:label", "chr13q21.31 (Human)") in spo
        assert ("CHR:9606chr13q21.31", "rdfs:subClassOf", "SO:0000341") in spo
        assert ("CHR:9606chr13q21", "rdfs:subClassOf", "SO:0000341") in spo
        assert ("CHR:9606chr13q", "rdfs:subClassOf", "GENO:0000629") in spo
        # subsequence chain runs through restriction bnodes
        rests = {o for s, p, o in spo if s == "CHR:9606chr13q21.31"
                 and p == "rdfs:subClassOf" and str(o).startswith("_:")}
        assert any((r, "owl:onProperty", "RO:0002525") in spo for r in rests)
        assert any(
            (r, "owl:someValuesFrom", "CHR:9606chr13q21.3") in spo for r in rests
        )
        # stain restriction on the gneg band
        stain_rests = {o for s, p, o in spo if s == "CHR:9606chr13q21.31"
                       and p == "rdfs:subClassOf" and str(o).startswith("_:")}
        assert any((r, "owl:onProperty", "GENO:0000207") in spo for r in stain_rests)


class TestStrictSerialization:
    """Every round-2 source graph renders strict ntriples (no unmapped
    prefixes reach the sink — the CLI-corruption failure ADVICE r1 flagged)."""

    @pytest.mark.parametrize("source_cls", [
        TestMgiSlim, TestZfinSlim, TestMonarch, TestEom, TestGeneReviews,
        TestEbiG2P, TestDecipher, TestMyDrug, TestMmrrc, TestMonochrom,
    ])
    def test_strict_nt(self, request, source_cls):
        from conftest import assert_strict_nt

        # pytest can't request another class's class-scoped fixture directly;
        # rebuild the graph via the fixture function itself
        graph = source_cls.graph.__wrapped__(
            source_cls(), request.getfixturevalue("spark"),
            request.getfixturevalue("tmp_path_factory"),
        )
        assert_strict_nt(graph)
