"""All-41-source ETL integration sweep — the analog of the reference's
Jenkins full run (run_all_sources.sh) + tests/omia-integration.py: every
registered pipeline drives ``etl.run`` end-to-end on fixtures, per-source
triple counts are pinned, and the turtle output round-trips through the
golden parse harness.

Fixture policy: module-level fixture constants are imported from the
per-source test modules (single source of truth); the handful embedded in
class fixtures (the m4 group) are re-declared compactly here.
"""

from __future__ import annotations

import gzip
import json
import zipfile

import pytest

from dipper_spark.etl import run
from dipper_spark.io.turtle_parse import parse_turtle
from dipper_spark.sources import REGISTRY, get_pipeline

from tests import test_animalqtldb as aqtl
from tests import test_biogrid as biogrid
from tests import test_clinvar as clinvar
from tests import test_coriell as coriell
from tests import test_ensembl as ensembl
from tests import test_flybase as flybase
from tests import test_hgnc as hgnc
from tests import test_impc_source as impc
from tests import test_kegg as kegg
from tests import test_mgi as mgi
from tests import test_mychem as mychem
from tests import test_ncbigene as ncbigene
from tests import test_omia as omia
from tests import test_omim as omim
from tests import test_orphanet as orphanet
from tests import test_reactome as reactome
from tests import test_rgd_xenbase as rgdxb
from tests import test_sgd as sgd
from tests import test_sources as srcs
from tests import test_sources_m3 as m3
from tests import test_sources_misc as misc
from tests import test_ucscbands as ucsc
from tests import test_udp as udp
from tests import test_wormbase as wb
from tests import test_zfin as zfin


def _gz(path, text):
    with gzip.open(path, "wt") as fh:
        fh.write(text)


def _w_mgislim(d):
    (d / "mousemine_mp_annotations.tsv").write_text(
        "gene_id\tsymbol\tso_name\tmp_id\tmp_name\tpmid\tcomment_type\tcomment_desc\n"
        "MGI:97486\tPax6\tprotein coding gene\tMP:0001262\tdecreased body weight\t12345\t\t\n"
        "MGI:97486\tPax6\tprotein coding gene\tMP:0001286\tabnormal eye\t\t\t\n"
    )


def _w_zfinslim(d):
    (d / "id_map_zfin.tsv").write_text(
        "iri\tid\nZP:0004134\tZFA:0000672-BFO:0000050-ZFA:0001439-PATO:0000642-0-0-0\n"
    )
    cols = [""] * 25
    cols[2] = "ZDB-GENE-980526-166"
    cols[3] = "ZFA:0000672"
    cols[5] = "BFO:0000050"
    cols[7] = "ZFA:0001439"
    cols[9] = "PATO:0000642"
    cols[11] = "abnormal"
    cols[23] = "ZDB-PUB-1"
    (d / "phenoGeneCleanData_fish.txt").write_text("\t".join(cols) + "\n")


def _w_monarch(d):
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
    )


def _w_eom(d):
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


def _w_genereviews(d):
    (d / "GRtitle_shortname_NBKid.txt").write_text(
        "#GR_shortname\tGR_Title\tNBK_id\tPMID\n"
        "cdls\tCornelia de Lange Syndrome\tNBK1104\t20301283\n"
    )
    (d / "NBKid_shortname_OMIM.txt").write_text(
        "#NBK_id\tGR_shortname\tOMIM\nNBK1104\tcdls\t122470\n"
    )
    (d / "mimTitles.txt").write_text(
        "# Copyright\n"
        "# Prefix\tMIM Number\tPreferred Title; symbol\tAlternative Title(s); symbol(s)\tIncluded Title(s); symbols\n"
        "Number Sign\t122470\tCORNELIA DE LANGE SYNDROME 1; CDLS1\t\t\n"
    )


def _w_ebi_g2p(d):
    header = (
        "gene symbol,gene mim,disease name,disease mim,DDD category,"
        "allelic requirement,mutation consequence,phenotypes,organ specificity list,"
        "pmids,panel,prev symbols,hgnc id,entry date\n"
    )
    _gz(
        d / "DDG2P.csv.gz",
        header
        + "KIF7,611254,ACROCALLOSAL SYNDROME,200990,confirmed,biallelic,"
          "loss of function,,,12345;67890,DD,,30497,2015-07-22\n",
    )
    (d / "unmapped_ebi_diseases.tsv").write_text("Some unmapped disease\tMONDO:0012345\n")


def _w_decipher(d):
    with zipfile.ZipFile(d / "ddg2p.zip", "w") as zf:
        zf.writestr(
            "ddg2p.txt",
            "#gencode_gene_name\tmode\tcategory\tconsequence\tdisease\tomim\tddg2p_id\tpubmed_ids\thpo_codes\n"
            "ARSE\tX-linked\tConfirmed DD gene\tLoss of function\tCHONDRODYSPLASIA PUNCTATA\t302950\tDDG2P_1\t8696334;10851256\t\n",
        )
    (d / "hgnc_complete_set.txt").write_text("hgnc_id\tsymbol\nHGNC:719\tARSE\n")


def _w_mydrug(d):
    doc = {
        "aeolus": {
            "rxcui": "4024", "unii": "X7BCI9A9RS", "drug_name": "estradiol",
            "outcomes": [
                {"code": "10002034", "name": "anaphylaxis", "id": "o1",
                 "case_count": 17, "prr": 2.5, "ror": 2.75},
            ],
        },
        "unii": {"inchikey": "VOXZDWNPVJITMN-ZBRFXRBCSA-N"},
    }
    (d / "aeolus.json").write_text(json.dumps(doc) + "\n")


def _w_mmrrc(d):
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
    )


def _w_monochrom(d):
    _gz(
        d / "9606cytoBand.txt.gz",
        "chr13\t4500000\t10000000\tp12\tstalk\n"
        "chr13\t10000000\t16300000\tq21.31\tgneg\n",
    )


FIXTURE_WRITERS = {
    "animalqtldb": lambda d: _gz_enc(d / "QTL_chicken.gff.txt.gz", aqtl.GFF),
    "bgee": lambda d: _gz(d / "human_anat_entity_all_data.tsv.gz", m3.BGEE_FIXTURE),
    "biogrid": lambda d: (d / "BIOGRID-ALL.mitab.txt").write_text(biogrid.MITAB),
    "clinvar": lambda d: (
        (d / "ClinVarFullRelease_00-latest.xml").write_text(clinvar.CLINVAR_XML),
        (d / "gene_condition_source_id").write_text(clinvar.G2P),
    ),
    "coriell": lambda d: (d / "NIGMS.csv").write_bytes(coriell.CSV.encode("iso-8859-1")),
    "ctd": lambda d: _gz(d / "CTD_chemicals_diseases.tsv.gz", srcs.CTD_FIXTURE),
    "decipher": _w_decipher,
    "ebi_g2p": _w_ebi_g2p,
    "ensembl": lambda d: (
        (d / "ensembl_biomart_9606.txt").write_text(ensembl.HUMAN),
        (d / "ensembl_biomart_10090.txt").write_text(ensembl.MOUSE),
    ),
    "eom": _w_eom,
    "flybase": lambda d: (
        (d / "allele_phenotype.tsv").write_text(flybase.ALLELE_PHENO),
        (d / "gene_xref.tsv").write_text(flybase.GENE_XREF),
        _gz(d / "fbal_to_fbgn_fb.tsv.gz", flybase.ALLELE_GENE),
        _gz(d / "species.ab.gz", flybase.SPECIES),
        _gz(d / "disease_model_annotations.tsv.gz", flybase.DISEASE),
        _gz(d / "fbrf_pmid_pmcid_doi_fb.tsv.gz", flybase.REF_PUBMED),
    ),
    "genereviews": _w_genereviews,
    "go": lambda d: (
        _gz(d / "human.gaf.gz", m3.GAF_FIXTURE),
        _gz(d / "idmapping.tsv.gz", m3.IDMAP_FIXTURE),
    ),
    "gwascatalog": lambda d: (
        d / "gwas-catalog-associations_ontology-annotated.tsv"
    ).write_text(misc.GWAS),
    "hgnc": lambda d: (d / "hgnc_complete_set.txt").write_text(hgnc.TSV),
    "hpoa": lambda d: (d / "phenotype.hpoa").write_text(srcs.HPOA_FIXTURE),
    "impc": lambda d: _gz(d / "ALL_genotype_phenotype.csv.gz", impc.CSV),
    "kegg": lambda d: kegg.write_kegg_fixture(d),
    "mgi": lambda d: [
        (d / name).write_text(content) for name, content in mgi.FIXTURES.items()
    ],
    "mgislim": _w_mgislim,
    "mmrrc": _w_mmrrc,
    "monarch": _w_monarch,
    "monochrom": _w_monochrom,
    "mpd": lambda d: misc.write_mpd_fixture(d),
    "mychem": lambda d: (
        (d / "drugbank_targets.jsonl").write_text(mychem.DRUGBANK),
        (d / "drugcentral_interactors.jsonl").write_text(mychem.DRUGCENTRAL),
    ),
    "mydrug": _w_mydrug,
    "ncbigene": lambda d: (
        _gz(d / "gene_info.gz", ncbigene.GENE_INFO),
        _gz(d / "gene_history.gz", ncbigene.HIST),
        _gz(d / "gene2pubmed.gz", ncbigene.G2P),
        _gz(d / "gene_group.gz", ncbigene.GRP),
    ),
    "omia": lambda d: (
        _gz(d / "omia.xml.gz", omia.OMIA_XML),
        (d / "mimTitles.txt").write_text(omia.MIMTITLES),
    ),
    "omim": lambda d: (
        (d / "mimTitles.txt").write_text(omim.TITLES),
        (d / "morbidmap.txt").write_text(omim.MORBID),
    ),
    "orphanet": lambda d: (d / "en_product6.xml").write_text(orphanet.XML),
    "panther": lambda d: (d / "RefGenomeOrthologs.tsv").write_text(misc.PANTHER),
    "reactome": lambda d: (
        (d / "Ensembl2Reactome.txt").write_text(reactome.ENS),
        (d / "ChEBI2Reactome.txt").write_text(reactome.CHEBI),
    ),
    "rgd": lambda d: (d / "rattus_genes_mp").write_text(rgdxb.RGD_GAF),
    "sgd": lambda d: (d / "phenotype_data.tab").write_text(sgd.TSV),
    "stringdb": lambda d: (
        _gz(d / "protein.links.detailed.txt.gz", m3.STRING_LINKS),
        _gz(d / "entrez_2_string.tsv.gz", m3.STRING_IDMAP),
    ),
    "ucscbands": lambda d: (d / "cytoBand.txt.gz").write_bytes(
        gzip.compress(ucsc.BANDS.encode())
    ),
    "udp": lambda d: (
        (d / "udp_variants.tsv").write_text(udp.VARIANTS),
        (d / "udp_phenotypes.tsv").write_text(udp.PHENOTYPES),
        (d / "hgnc_symbol_map.tsv").write_text(udp.HGNC),
    ),
    "wormbase": lambda d: (
        _gz(d / "c_elegans.PRJNA13758.geneIDs.txt.gz", wb.GENE_IDS),
        (d / "phenotype_association.wb").write_text(wb.ALLELE_PHENO),
        (d / "rnai_phenotypes.wb").write_text(wb.RNAI_PHENO),
        _gz(d / "c_elegans.PRJNA13758.annotations.gff3.gz", wb.GFF),
        (d / "disease_association.wb").write_text(wb.DISEASE),
        (d / "CHECKSUMS").write_text(wb.CHECKSUMS),
    ),
    "xenbase": lambda d: (
        (d / "xb_xpo_spo_v_v1.tab").write_text(rgdxb.XB_G2P),
        (d / "XenbaseGenepageToGeneIdMapping.txt").write_text(rgdxb.XB_PAGES),
        (d / "LiteratureMatchedGenesByPaper.txt").write_text(rgdxb.XB_LIT),
    ),
    "zfin": lambda d: (
        (d / "phenotype_fish.txt").write_text(zfin.PHENO),
        (d / "id_map_zfin.tsv").write_text(zfin.ZPMAP),
        (d / "genotype_features.txt").write_text(zfin.GENO_GOLDEN),
        (d / "genotype_backgrounds.txt").write_text(zfin.BACKGROUNDS_GOLDEN),
    ),
    "zfinslim": _w_zfinslim,
}


def _gz_enc(path, text, encoding="ISO-8859-1"):
    with gzip.open(path, "wt", encoding=encoding) as fh:
        fh.write(text)


#: pinned per-source triple counts (graph + dataset metadata + property
#: axioms, after dedup) — regenerate deliberately when a pipeline's semantics
#: change, never to silence a diff
EXPECTED_COUNTS = json.loads((__import__("pathlib").Path(__file__).parent / "etl_sweep_counts.json").read_text())


def test_sweep_covers_every_registered_source():
    assert set(FIXTURE_WRITERS) == set(REGISTRY)
    assert set(EXPECTED_COUNTS) == set(REGISTRY)


#: the sweep source routed through the DISTRIBUTED turtle layout
#: (--ttl-parts → write_turtle_parts), so the 100 TB ttl path is exercised
#: end-to-end by the sweep at least once — impc is the largest pinned
#: graph (234 triples).  All other sources keep the single-file contract.
PARTS_SOURCE = "impc"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_etl_sweep(spark, tmp_path, name):
    from dipper_spark.io.sinks import concat_turtle_parts

    raw = tmp_path / "raw"
    out = tmp_path / "out"
    raw.mkdir()
    FIXTURE_WRITERS[name](raw)
    extra = ["--ttl-parts"] if name == PARTS_SOURCE else []
    report = run(
        ["--sources", name, "--raw-dir", str(raw), "--out-dir", str(out),
         "--dest-fmt", "ttl", *extra],
        spark=spark,
    )
    assert name in report["sources"]
    if name == PARTS_SOURCE:
        ttl = "".join(concat_turtle_parts(str(out / f"{name}.ttl.parts")))
    else:
        ttl = (out / f"{name}.ttl").read_text(encoding="utf-8")
    # round-trip through the golden parse harness: count pinned
    triples = parse_turtle(ttl)
    assert triples, f"{name}: empty graph"
    assert len(triples) == EXPECTED_COUNTS[name], (
        f"{name}: {len(triples)} triples, pinned {EXPECTED_COUNTS[name]}"
    )
    # HCLS dataset metadata stanza present in every source output (summary
    # level node, Dataset.py:245-263)
    assert any(t["subject"] == f"MonarchArchive:#{name}" for t in triples)


# --------------------------------------------------------------------------
# S1 fetch-path sweep: the same etl.run drive but through --fetch
# --cache-base against a local fixture HTTP server, covering the full S1
# chain (cache fetch, size integrity, staged-file provenance in the HCLS
# stanza) end-to-end for a representative subset of sources.
# --------------------------------------------------------------------------

FETCH_SOURCES = ["reactome", "sgd", "ucscbands", "mpd"]


@pytest.fixture(scope="module")
def fixture_http_server(tmp_path_factory):
    import threading
    import time as _time
    from http.server import BaseHTTPRequestHandler, HTTPServer

    files: dict[str, bytes] = {}
    stage = tmp_path_factory.mktemp("fetch_fixtures")
    for name in FETCH_SOURCES:
        d = stage / name
        d.mkdir()
        FIXTURE_WRITERS[name](d)
        for f in d.iterdir():
            files[f"/{name}/{f.name}"] = f.read_bytes()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 - http.server API
            payload = files.get(self.path)
            if payload is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            from email.utils import formatdate

            self.send_header("Last-Modified", formatdate(_time.time(), usegmt=True))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *args):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


@pytest.mark.parametrize("name", FETCH_SOURCES)
def test_etl_sweep_with_fetch(spark, tmp_path, name, fixture_http_server):
    raw = tmp_path / "raw"
    out = tmp_path / "out"
    report = run(
        ["--sources", name, "--raw-dir", str(raw), "--out-dir", str(out),
         "--dest-fmt", "ttl", "--fetch", "--cache-base", fixture_http_server],
        spark=spark,
    )
    timings = report["sources"][name]
    assert "fetch" in timings and timings["fetch"] >= 0
    triples = parse_turtle((out / f"{name}.ttl").read_text(encoding="utf-8"))
    # staged-file provenance: version-level dc:source per contract url +
    # pav:retrievedOn per staged file (2 triples per url-bearing file)
    pipe = get_pipeline(name)
    urls = [c.url for c in pipe.files.values() if c.url]
    stamp = __import__("datetime").datetime.utcnow().strftime("%Y%m%d")
    version_node = f"MonarchArchive:{stamp}/#{name}"
    src_edges = {
        str(t["object"])
        for t in triples
        if t["predicate"] == "dc:source" and t["subject"] == version_node
    }
    assert len(src_edges) == len(urls), (src_edges, urls)
    for url in urls:
        tail = url.rsplit("/", 1)[-1]
        assert any(tail in o for o in src_edges), (url, src_edges)
    retrieved = [t for t in triples if t["predicate"] == "pav:retrievedOn"]
    assert len(retrieved) == len(urls)
    # the graph itself matches the pinned non-fetch count plus the
    # provenance triples
    assert len(triples) == EXPECTED_COUNTS[name] + 2 * len(urls)


# --------------------------------------------------------------------------
# K2 turtle-path dispatch: a real source's output must be byte-equal across
# the driver-streamed single file and the distributed part-file layout
# (round-12 verdict item #2 — write_turtle_parts wired into the ETL writer).
# --------------------------------------------------------------------------


def test_etl_ttl_parts_byte_equal_to_single_file(spark, tmp_path):
    from dipper_spark.io.sinks import concat_turtle_parts

    name = PARTS_SOURCE
    raw = tmp_path / "raw"
    raw.mkdir()
    FIXTURE_WRITERS[name](raw)
    out_single = tmp_path / "out_single"
    out_parts = tmp_path / "out_parts"
    run(
        ["--sources", name, "--raw-dir", str(raw), "--out-dir", str(out_single),
         "--dest-fmt", "ttl"],
        spark=spark,
    )
    run(
        ["--sources", name, "--raw-dir", str(raw), "--out-dir", str(out_parts),
         "--dest-fmt", "ttl", "--ttl-parts"],
        spark=spark,
    )
    single = (out_single / f"{name}.ttl").read_text(encoding="utf-8")
    concat = "".join(concat_turtle_parts(str(out_parts / f"{name}.ttl.parts")))
    # the documented layout contract: concat == driver render + one
    # trailing newline (each part's last block keeps its between-block
    # blank line)
    assert concat == single + "\n"


def test_etl_ttl_threshold_dispatch(spark, tmp_path):
    # size-based dispatch: threshold 1 forces every graph to the parts
    # layout; the default (1M) keeps fixture graphs on the single file
    name = PARTS_SOURCE
    raw = tmp_path / "raw"
    raw.mkdir()
    FIXTURE_WRITERS[name](raw)
    out = tmp_path / "out_thresh"
    run(
        ["--sources", name, "--raw-dir", str(raw), "--out-dir", str(out),
         "--dest-fmt", "ttl", "--ttl-parts-threshold", "1"],
        spark=spark,
    )
    assert (out / f"{name}.ttl.parts" / "header.ttl").exists()
    assert not (out / f"{name}.ttl").exists()
