"""GWAS Catalog reference goldens, ported from
/root/reference/tests/test_gwascatalog.py + resources/gwascatalog/: the three
per-variant expected graphs (kgp8851185, rs1491921, rs1329573) with inputs
and expected turtle embedded verbatim.

Comparison runs at the expanded-IRI level (both sides normalized through the
engine's CurieMap) with skolem genid IRIs folded back to bnodes, so prefix
spelling differences between the reference's rdflib serialization and our
curie-form triples cannot mask or fake a diff.

Documented divergences from the expected files (each asserted to be the ONLY
diffs): biolink:category decorations are scoped out of the engine's model
layer (same adjudication as the CTD golden, test_serializers.py).
"""

import pytest
from pyspark.sql import functions as F

from dipper_spark.core.curie import CurieMap
from dipper_spark.io.turtle_parse import parse_turtle
from dipper_spark.sources import get_pipeline

GENID = "https://monarchinitiative.org/.well-known/genid/"

# symbol->HGNC dim standing in for the reference's live REST lookup
# (DipperUtil.get_hgnc_id_from_symbol); PAX5 per the rs1329573 golden
HGNC_MAP = "hgnc_id\tsymbol\nHGNC:8619\tPAX5\n"

# input/kgp8851185/gwas-catalog-associations_ontology-annotated.tsv (verbatim)
INPUT_KGP8851185 = 'DATE ADDED TO CATALOG\tPUBMEDID\tFIRST AUTHOR\tDATE\tJOURNAL\tLINK\tSTUDY\tDISEASE/TRAIT\tINITIAL SAMPLE SIZE\tREPLICATION SAMPLE SIZE\tREGION\tCHR_ID\tCHR_POS\tREPORTED GENE(S)\tMAPPED_GENE\tUPSTREAM_GENE_ID\tDOWNSTREAM_GENE_ID\tSNP_GENE_IDS\tUPSTREAM_GENE_DISTANCE\tDOWNSTREAM_GENE_DISTANCE\tSTRONGEST SNP-RISK ALLELE\tSNPS\tMERGED\tSNP_ID_CURRENT\tCONTEXT\tINTERGENIC\tRISK ALLELE FREQUENCY\tP-VALUE\tPVALUE_MLOG\tP-VALUE (TEXT)\tOR or BETA\t95% CI (TEXT)\tPLATFORM [SNPS PASSING QC]\tCNV\tMAPPED_TRAIT\tMAPPED_TRAIT_URI\tSTUDY ACCESSION\tGENOTYPING TECHNOLOGY\n2014-10-06\t24529757\tXie T\t2014-01-17\tNeurobiol Aging\twww.ncbi.nlm.nih.gov/pubmed/24529757\tGenome-wide association study combining pathway analysis for typical sporadic amyotrophic lateral sclerosis in Chinese Han populations.\tAmyotrophic lateral sclerosis (sporadic)\t250 Han Chinese ancestry cases, 250 Han Chinese ancestry controls\tNA\t\t\t\tLRRTM4\t\t\t\t\t\t\tkgp8851185-?\tkgp8851185\t0\t\t\t1\t0.09\t2E-8\t7.698970004336019\t\t\t\tIllumina [859311]\tN\tsporadic amyotrophic lateral sclerosis\thttp://www.ebi.ac.uk/efo/EFO_0001357\tGCST002337\tGenome-wide genotyping array\n'

# expected/kgp8851185.ttl (verbatim)
EXPECTED_KGP8851185 = 'MONARCH:b795746ddae073f28409 a OBAN:association ;\n    RO:0002558 ECO:0000213 ;\n    dc:description "A study of Amyotrophic lateral sclerosis (sporadic) in 250 Han Chinese ancestry cases, 250 Han Chinese ancestry controls with NA on platform Illumina [859311] (p=2E-8)" ;\n    dc:source <http://www.ncbi.nlm.nih.gov/pubmed/24529757> ;\n    OBAN:association_has_object EFO:0001357 ;\n    OBAN:association_has_predicate RO:0003304 ;\n    OBAN:association_has_subject GWAS:kgp8851185 .\n\n<http://www.ncbi.nlm.nih.gov/pubmed/24529757> a OBO:IAO_0000013 .\n\nGWAS:kgp8851185 a OBO:SO_0000001,\n        OBO:SO_0000694 ;\n    rdfs:label "kgp8851185-?" ;\n    RO:0002162 OBO:NCBITaxon_9606 ;\n    RO:0003304 EFO:0001357 ;\n    dc:description "0.09 [risk allele frequency]" ;\n    MONARCH:cliqueLeader true .\n'

# input/kgp8851185/mondo.json (verbatim)
MONDO_KGP8851185 = '{"graphs": [{"nodes": [{"meta": {"xrefs": [{"val": "EFO:0003949"}, {"val": "EFO:0001357"}]}}]}]}\n'

# input/rs1491921/gwas-catalog-associations_ontology-annotated.tsv (verbatim)
INPUT_RS1491921 = 'DATE ADDED TO CATALOG\tPUBMEDID\tFIRST AUTHOR\tDATE\tJOURNAL\tLINK\tSTUDY\tDISEASE/TRAIT\tINITIAL SAMPLE SIZE\tREPLICATION SAMPLE SIZE\tREGION\tCHR_ID\tCHR_POS\tREPORTED GENE(S)\tMAPPED_GENE\tUPSTREAM_GENE_ID\tDOWNSTREAM_GENE_ID\tSNP_GENE_IDS\tUPSTREAM_GENE_DISTANCE\tDOWNSTREAM_GENE_DISTANCE\tSTRONGEST SNP-RISK ALLELE\tSNPS\tMERGED\tSNP_ID_CURRENT\tCONTEXT\tINTERGENIC\tRISK ALLELE FREQUENCY\tP-VALUE\tPVALUE_MLOG\tP-VALUE (TEXT)\tOR or BETA\t95% CI (TEXT)\tPLATFORM [SNPS PASSING QC]\tCNV\tMAPPED_TRAIT\tMAPPED_TRAIT_URI\tSTUDY ACCESSION\tGENOTYPING TECHNOLOGY\n2016-02-07\t25918132\tYucesoy B\t2015-04-26\tToxicol Sci\twww.ncbi.nlm.nih.gov/pubmed/25918132\tGenome-Wide Association Study Identifies Novel Loci Associated With Diisocyanate-Induced Occupational Asthma.\tDiisocyanate-induced asthma\t74 European ancestry cases, 824 European ancestry controls\tNA\t5p14.3\t5\t21259029\tNUP50P3, LOC728411\tAC140172.1 - AC093274.1\tENSG00000248286\tENSG00000249359\t\t62169\t64844\trs1491921-C\trs1491921\t0\t1491921\tintergenic_variant\t1\t0.013\t7E-7\t6.154901959985743\t\t5.69\t[2.63-12.33]\tIllumina [1556551]\tN\tresponse to diisocyanate, asthma\thttp://www.ebi.ac.uk/efo/EFO_0006995, http://www.ebi.ac.uk/efo/EFO_0000270\tGCST002875\tGenome-wide genotyping array\n'

# expected/rs1491921.ttl (verbatim)
EXPECTED_RS1491921 = 'MONARCH:b506ad69fc4a85427fdb a OBAN:association ;\n    OBO:RO_0002558 OBO:ECO_0000213 ;\n    dc:description "A study of Diisocyanate-induced asthma in 74 European ancestry cases, 824 European ancestry controls with NA on platform Illumina [1556551] (p=7E-7)" ;\n    dc:source <http://www.ncbi.nlm.nih.gov/pubmed/25918132> ;\n    OBAN:association_has_object <http://www.ebi.ac.uk/efo/EFO_0000270> ;\n    OBAN:association_has_predicate OBO:RO_0003304 ;\n    OBAN:association_has_subject dbSNP:rs1491921 .\n\nMONARCH:bff9b97458d67ed7f517 a OBAN:association ;\n    OBO:RO_0002558 OBO:ECO_0000213 ;\n    dc:description "A study of Diisocyanate-induced asthma in 74 European ancestry cases, 824 European ancestry controls with NA on platform Illumina [1556551] (p=7E-7)" ;\n    dc:source <http://www.ncbi.nlm.nih.gov/pubmed/25918132> ;\n    OBAN:association_has_object <http://www.ebi.ac.uk/efo/EFO_0006995> ;\n    OBAN:association_has_predicate OBO:RO_0003304 ;\n    OBAN:association_has_subject dbSNP:rs1491921 .\n\n<https://monarchinitiative.org/.well-known/genid/bee62aebc378782c23ad> a faldo:Region ;\n    rdfs:label "GRCh38chr5-21259029-21259029-Region" ;\n    faldo:begin <https://monarchinitiative.org/.well-known/genid/bed3341497b6bee94927> ;\n    faldo:end <https://monarchinitiative.org/.well-known/genid/bed3341497b6bee94927> .\n\n<http://www.ebi.ac.uk/efo/EFO_0000270> a owl:Class ;\n    rdfs:label "asthma" ;\n    biolink:category biolink:PhenotypicFeature ;\n    rdfs:subClassOf OBO:UPHENO_0001001 .\n\n<http://www.ebi.ac.uk/efo/EFO_0006995> a owl:Class ;\n    rdfs:label "response to diisocyanate" ;\n    biolink:category biolink:PhenotypicFeature ;\n    rdfs:subClassOf OBO:UPHENO_0001001 .\n\ndbSNP:rs1491921 a OBO:SO_0000694,\n        OBO:SO_0001628 ;\n    rdfs:label "rs1491921-C" ;\n    faldo:location <https://monarchinitiative.org/.well-known/genid/bee62aebc378782c23ad> ;\n    OBO:RO_0002162 OBO:NCBITaxon_9606 ;\n    OBO:RO_0002528 ENSEMBL:ENSG00000249359 ;\n    OBO:RO_0002529 ENSEMBL:ENSG00000248286 ;\n    OBO:RO_0003304 <http://www.ebi.ac.uk/efo/EFO_0000270>,\n        <http://www.ebi.ac.uk/efo/EFO_0006995> ;\n    dc:description "0.013 [risk allele frequency]" ;\n    MONARCH:cliqueLeader true .\n\n<http://www.ncbi.nlm.nih.gov/pubmed/25918132> a OBO:IAO_0000013 .\n\n<https://monarchinitiative.org/.well-known/genid/bed3341497b6bee94927> a faldo:Position ;\n    rdfs:label "GRCh38chr5-21259029" ;\n    faldo:position 21259029 ;\n    faldo:reference OBO:CHR_GRCh38chr5 .\n'

# input/rs1491921/mondo.json (verbatim)
MONDO_RS1491921 = '{"graphs": [{"nodes": [{"meta": {"xrefs": [{"val": "EFO:0003949"}, {"val": "EFO:0001357"}]}}]}]}\n'

# input/rs1329573/gwas-catalog-associations_ontology-annotated.tsv (verbatim)
INPUT_RS1329573 = 'DATE ADDED TO CATALOG\tPUBMEDID\tFIRST AUTHOR\tDATE\tJOURNAL\tLINK\tSTUDY\tDISEASE/TRAIT\tINITIAL SAMPLE SIZE\tREPLICATION SAMPLE SIZE\tREGION\tCHR_ID\tCHR_POS\tREPORTED GENE(S)\tMAPPED_GENE\tUPSTREAM_GENE_ID\tDOWNSTREAM_GENE_ID\tSNP_GENE_IDS\tUPSTREAM_GENE_DISTANCE\tDOWNSTREAM_GENE_DISTANCE\tSTRONGEST SNP-RISK ALLELE\tSNPS\tMERGED\tSNP_ID_CURRENT\tCONTEXT\tINTERGENIC\tRISK ALLELE FREQUENCY\tP-VALUE\tPVALUE_MLOG\tP-VALUE (TEXT)\tOR or BETA\t95% CI (TEXT)\tPLATFORM [SNPS PASSING QC]\tCNV\tMAPPED_TRAIT\tMAPPED_TRAIT_URI\tSTUDY ACCESSION\tGENOTYPING TECHNOLOGY\n2012-04-25\t22449649\tLoo SK\t2012-02-28\tJ Am Acad Child Adolesc Psychiatry\twww.ncbi.nlm.nih.gov/pubmed/22449649\tGenome-wide association study of intelligence: additive effects of novel brain expressed genes.\tIntelligence\t656 European ancestry individuals from ADHD families\tNA\t9p13.2\t9;9;9;9\t36998996;37002118;37000690;36997420\tPAX5\tPAX5; PAX5; PAX5; PAX5\t\t\t\t\t\trs1329573-?; rs7020413-?; rs3824344-?; rs3758171-?\trs1329573; rs7020413; rs3824344; rs3758171\t0\t\tintron_variant; intron_variant; intron_variant; intron_variant\t\tNR\t4E-8\t7.3979400086720375\t(Neurodevelopment)\t\t\tIllumina [795637]\tN\tintelligence\thttp://www.ebi.ac.uk/efo/EFO_0004337\tGCST001428\tGenome-wide genotyping array\n'

# expected/rs1329573.ttl (verbatim)
EXPECTED_RS1329573 = ':MONARCH_b464cf2c118cac01ef22 a OBAN:association ;\n    OBO:RO_0002558 OBO:ECO_0000213 ;\n    dc:description "A study of Intelligence in 656 European ancestry individuals from ADHD families with NA on platform Illumina [795637] (p=4E-8)" ;\n    dc:source <http://www.ncbi.nlm.nih.gov/pubmed/22449649> ;\n    OBAN:association_has_object <http://www.ebi.ac.uk/efo/EFO_0004337> ;\n    OBAN:association_has_predicate OBO:RO_0003304 ;\n    OBAN:association_has_subject :haplotype_bb627b1f64039b0f751a .\n\ndbSNP:rs1329573 a OBO:SO_0000694,\n        OBO:SO_0001627 ;\n    rdfs:label "rs1329573-?" ;\n    faldo:location <https://monarchinitiative.org/.well-known/genid/b3fad5df82cdfb283329> ;\n    OBO:GENO_0000418 HGNC:8619 ;\n    OBO:RO_0002162 OBO:NCBITaxon_9606 .\n\ndbSNP:rs3758171 a OBO:SO_0000694,\n        OBO:SO_0001627 ;\n    rdfs:label "rs3758171-?" ;\n    faldo:location <https://monarchinitiative.org/.well-known/genid/b25a2da36647bdd71be3> ;\n    OBO:GENO_0000418 HGNC:8619 ;\n    OBO:RO_0002162 OBO:NCBITaxon_9606 .\n\ndbSNP:rs3824344 a OBO:SO_0000694,\n        OBO:SO_0001627 ;\n    rdfs:label "rs3824344-?" ;\n    faldo:location <https://monarchinitiative.org/.well-known/genid/b096a3e94e32fe23374a> ;\n    OBO:GENO_0000418 HGNC:8619 ;\n    OBO:RO_0002162 OBO:NCBITaxon_9606 .\n\ndbSNP:rs7020413 a OBO:SO_0000694,\n        OBO:SO_0001627 ;\n    rdfs:label "rs7020413-?" ;\n    faldo:location <https://monarchinitiative.org/.well-known/genid/bbb252d9b6cd02e9880a> ;\n    OBO:GENO_0000418 HGNC:8619 ;\n    OBO:RO_0002162 OBO:NCBITaxon_9606 .\n\n<http://www.ncbi.nlm.nih.gov/pubmed/22449649> a OBO:IAO_0000013 .\n\n<https://monarchinitiative.org/.well-known/genid/b096a3e94e32fe23374a> a faldo:Region ;\n    rdfs:label "GRCh38chr9-37000690-37000690-Region" ;\n    faldo:begin <https://monarchinitiative.org/.well-known/genid/b5d61dbc7958a979d046> ;\n    faldo:end <https://monarchinitiative.org/.well-known/genid/b5d61dbc7958a979d046> .\n\n<https://monarchinitiative.org/.well-known/genid/b25a2da36647bdd71be3> a faldo:Region ;\n    rdfs:label "GRCh38chr9-36997420-36997420-Region" ;\n    faldo:begin <https://monarchinitiative.org/.well-known/genid/b21985847fe0774084eb> ;\n    faldo:end <https://monarchinitiative.org/.well-known/genid/b21985847fe0774084eb> .\n\n<https://monarchinitiative.org/.well-known/genid/b3fad5df82cdfb283329> a faldo:Region ;\n    rdfs:label "GRCh38chr9-36998996-36998996-Region" ;\n    faldo:begin <https://monarchinitiative.org/.well-known/genid/b55051762f8d5a3dbeb5> ;\n    faldo:end <https://monarchinitiative.org/.well-known/genid/b55051762f8d5a3dbeb5> .\n\n<https://monarchinitiative.org/.well-known/genid/bbb252d9b6cd02e9880a> a faldo:Region ;\n    rdfs:label "GRCh38chr9-37002118-37002118-Region" ;\n    faldo:begin <https://monarchinitiative.org/.well-known/genid/bb870c3d7606a3e0fc3c> ;\n    faldo:end <https://monarchinitiative.org/.well-known/genid/bb870c3d7606a3e0fc3c> .\n\n:haplotype_bb627b1f64039b0f751a a OBO:SO_0001024 ;\n    rdfs:label "rs1329573-?; rs7020413-?; rs3824344-?; rs3758171-?" ;\n    OBO:GENO_0000382 dbSNP:rs1329573,\n        dbSNP:rs3758171,\n        dbSNP:rs3824344,\n        dbSNP:rs7020413 ;\n    OBO:GENO_0000418 HGNC:8619 ;\n    OBO:RO_0002162 OBO:NCBITaxon_9606 ;\n    OBO:RO_0003304 <http://www.ebi.ac.uk/efo/EFO_0004337> .\n\n<http://www.ebi.ac.uk/efo/EFO_0004337> a owl:Class ;\n    rdfs:label "intelligence" ;\n    biolink:category biolink:PhenotypicFeature ;\n    rdfs:subClassOf OBO:UPHENO_0001001 .\n\n<https://monarchinitiative.org/.well-known/genid/b21985847fe0774084eb> a faldo:Position ;\n    rdfs:label "GRCh38chr9-36997420" ;\n    faldo:position 36997420 ;\n    faldo:reference OBO:CHR_GRCh38chr9 .\n\n<https://monarchinitiative.org/.well-known/genid/b55051762f8d5a3dbeb5> a faldo:Position ;\n    rdfs:label "GRCh38chr9-36998996" ;\n    faldo:position 36998996 ;\n    faldo:reference OBO:CHR_GRCh38chr9 .\n\n<https://monarchinitiative.org/.well-known/genid/b5d61dbc7958a979d046> a faldo:Position ;\n    rdfs:label "GRCh38chr9-37000690" ;\n    faldo:position 37000690 ;\n    faldo:reference OBO:CHR_GRCh38chr9 .\n\n<https://monarchinitiative.org/.well-known/genid/bb870c3d7606a3e0fc3c> a faldo:Position ;\n    rdfs:label "GRCh38chr9-37002118" ;\n    faldo:position 37002118 ;\n    faldo:reference OBO:CHR_GRCh38chr9 .\n'

# input/rs1329573/mondo.json (verbatim)
MONDO_RS1329573 = '{"graphs": [{"nodes": [{"meta": {"xrefs": [{"val": "EFO:0003949"}, {"val": "EFO:0001357"}]}}]}]}\n'

_CM = CurieMap()


def _term(t, is_literal):
    """Normalize a term for spelling-insensitive comparison: literals and
    colon-less tokens by value, bnodes/skolem-genid by digest, everything
    else by expanded IRI."""
    if is_literal:
        return ("val", t)
    if t.startswith("_:"):
        return ("bnode", t.lstrip("_:"))
    if "://" in t:
        iri = t
    elif ":" in t:
        iri = _CM.expand_str(t)
    else:
        return ("val", t)  # e.g. bare 'true' parsed as a resource token
    if iri.startswith(GENID):
        return ("bnode", iri[len(GENID):])
    return ("iri", iri)


def _norm_expected(ttl, drop_biolink=True):
    out = set()
    for t in parse_turtle(ttl):
        if drop_biolink and (
            t["predicate"].startswith("biolink:") or str(t["object"]).startswith("biolink:")
        ):
            continue
        out.add((
            _term(t["subject"], False),
            _term(t["predicate"], False),
            _term(t["object"], t["is_literal"]),
        ))
    return out


def _norm_graph(df):
    return {
        (_term(r.subject, False), _term(r.predicate, False), _term(r.object, r.is_literal))
        for r in df.collect()
    }


def _run(spark, tmp_path, input_tsv, mondo=None, hgnc=False):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "gwas-catalog-associations_ontology-annotated.tsv").write_text(input_tsv)
    if mondo is not None:
        (raw / "mondo.json").write_text(mondo)
    if hgnc:
        (raw / "hgnc_complete_set.txt").write_text(HGNC_MAP)
    return get_pipeline("gwascatalog").transform(spark, str(raw))


def _assert_golden(got, expected_ttl):
    exp = _norm_expected(expected_ttl)
    act = _norm_graph(got)
    missing = exp - act
    extra = act - exp
    assert not missing and not extra, (
        f"missing from engine output:\n" + "\n".join(map(str, sorted(missing)))
        + "\nextra in engine output:\n" + "\n".join(map(str, sorted(extra)))
    )


def test_golden_kgp8851185(spark, tmp_path):
    """Unlocated GWAS-prefixed snp: region-typed feature, risk-allele-freq
    description, mondo-xref'd EFO trait (no class stanza), assoc digest
    MONARCH:b795746ddae073f28409 (reference-exact)."""
    got = _run(spark, tmp_path, INPUT_KGP8851185, mondo=MONDO_KGP8851185)
    _assert_golden(got, EXPECTED_KGP8851185)


def test_golden_rs1491921(spark, tmp_path):
    """Located dbSNP snp: FALDO star with reference-exact bnode digests,
    intergenic context typing, up/downstream gene relations, two EFO trait
    classes + assocs."""
    got = _run(spark, tmp_path, INPUT_RS1491921)
    _assert_golden(got, EXPECTED_RS1491921)


def test_golden_rs1329573(spark, tmp_path):
    """Haplotype of four located snps: SO:0001024 individual with
    has_variant_part members, per-member FALDO stars + intron context
    typing, HGNC affected-locus via the file dim, hap-level affected locus,
    assoc on the haplotype bnode-curie."""
    got = _run(spark, tmp_path, INPUT_RS1329573, hgnc=True)
    _assert_golden(got, EXPECTED_RS1329573)
