"""ClinVar XML pipeline: streaming stanza scan → nested RCV records →
SEPIO evidence/provenance triples, bit-compatible with the reference's
RCV goldens.

Reference: dipper/sources/ClinVar.py — iterparse stanza loop 824-848 with
reject routing 753-760 + under-specified skip 1020-1040, nested record model
(ClinVarRecord.py), process_measure_set 301-405, record_to_triples 474-603
(with the gene/variant relationship "hack" 500-553), the per-SCV×condition
association stanza 1068-1393 (digest ids 1076-1078, evidence/assertion
bnodes 1102-1110), assertion methods 1232-1295, citations 1312-1337 +
1399-1450, observed-in provenance 1469-1506, the uncertain-significance
buffer deletion 1341-1390, and the SCV pairwise significance linker
scv_link 233-278.  Translation facts from translationtable/clinvar.yaml
composed with GLOBAL_TERMS.yaml (resolve, ClinVar.py:409-436).

Spark shape:

- the XML scan is one task per file (unsplittable stream — the same bound
  the reference accepts single-threaded; N files scan in parallel, and the
  staging layer can pre-split one release file at stanza boundaries);
- each ``<ClinVarSet>`` parses to ONE nested row (pure structural
  extraction, no vocabulary); ALL semantics — translation-table resolution,
  sha1 digest identifiers, the gene-relation hack, the order-dependent
  uncertain-significance deletion, pairwise SCV links — are column
  expressions over the nested row: ``explode``/``posexplode`` for the
  SCV×condition fan-out, higher-order ``transform``/``filter``/``forall``
  for array logic, ``F.sha1`` for digests.  No per-row Python beyond the
  stanza parse itself;
- the g2p mapping file is a broadcast dim (gene → medgen set), replacing
  the reference's driver-global dict;
- the SCV pairwise linker is map-side: association keys are already
  grouped in the record's arrays, so pairs come from a double
  ``posexplode`` of one array — no self-join shuffle;
- release-level set semantics (the reference's ``releasetriple`` set) are
  a ``dropDuplicates`` on (subject, predicate, object).

The reference's buffer-deletion semantics (ClinVar.py:1383-1390): triples
accumulate per-RCV and an SCV whose significance is uncertain/unmapped
deletes EVERYTHING accumulated so far, so the kept output is (a) variant
triples only when no bad SCV exists, (b) association stanzas only for good
SCVs AFTER the last bad one, (c) pairwise links over ALL good SCVs
(pathocalls survives deletion).  Modeled exactly, order included, via the
last-bad-position filter.

Documented divergences (all crash paths in the reference, not outputs):
unmapped significance labels / review statuses / method types produce no
triples here where the reference would raise KeyError; a submitter-less
SCV simply omits the submitter triples where the reference's make_spo
would assert.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, StringType, StructField, StructType,
)

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.ids import digest_id
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

# ---------------------------------------------------------------------------
# translation facts (clinvar.yaml ∘ GLOBAL_TERMS.yaml, pre-composed)
# ---------------------------------------------------------------------------

#: clinical-significance label → internal label (clinvar.yaml "Pathos
#: Association types"); the full table, so real release spellings resolve
SIG_INTERNAL = {
    "Benign": "benign_for_condition", "benign": "benign_for_condition",
    "conflicting data from submitters": "has_uncertain_significance_for_condition",
    "Likely benign": "likely_benign_for_condition",
    "likely benign": "likely_benign_for_condition",
    "Likely Benign": "likely_benign_for_condition",
    "likely pathogenic": "likely_pathogenic_for_condition",
    "Likely pathogenic": "likely_pathogenic_for_condition",
    "no known pathogenicity": "has_uncertain_significance_for_condition",
    "non-pathogenic": "has_uncertain_significance_for_condition",
    "pathogenic": "pathogenic_for_condition", "Pathogenic": "pathogenic_for_condition",
    "Pathogenic/Likely pathogenic": "pathogenic_for_condition",
    "Pathologic": "pathogenic_for_condition", "pathologic": "pathogenic_for_condition",
    "probable-non-pathogenic": "likely_benign_for_condition",
    "probable-pathogenic": "likely_pathogenic_for_condition",
    "probably pathogenic": "likely_pathogenic_for_condition",
    "probably not pathogenic": "likely_benign_for_condition",
    "Suspected Benign": "likely_benign_for_condition",
    "Suspected Pathogenic": "likely_pathogenic_for_condition",
    "uncertain": "has_uncertain_significance_for_condition",
    "Uncertain": "has_uncertain_significance_for_condition",
    "Uncertain significance": "has_uncertain_significance_for_condition",
    "Uncertain Significance": "has_uncertain_significance_for_condition",
    "unknown": "has_uncertain_significance_for_condition",
    "Unknown": "has_uncertain_significance_for_condition",
    "variant of unknown significance": "has_uncertain_significance_for_condition",
    "MUT": "has_uncertain_significance_for_condition",
    "Unknown significance": "has_uncertain_significance_for_condition",
    "likely pathogenic - adrenal pheochromocytoma": "likely_pathogenic_for_condition",
    "pathogenic variant for Bardet-Biedl Syndrome": "pathogenic_for_condition",
    "untested": "has_uncertain_significance_for_condition",
    "other": "has_uncertain_significance_for_condition",
    "not provided": "has_uncertain_significance_for_condition",
    "cancer": "pathogenic_for_condition",
    "risk factor": "likely_pathogenic_for_condition",
    "drug response": "has_drug_response", "drug-response": "has_drug_response",
    "association": "has_uncertain_significance_for_condition",
    "association not found": "has_uncertain_significance_for_condition",
    "Affects": "has_uncertain_significance_for_condition",
    "Moderate": "has_uncertain_significance_for_condition",
    "protective": "protective_for_condition",
    "unknown significance": "has_uncertain_significance_for_condition",
    "likely pathogenic - adrenal bilateral pheochromocy": "likely_pathogenic_for_condition",
    "Associated with leiomyomas": "likely_benign_for_condition",
    "VSB": "likely_benign_for_condition",
    "VOUS": "has_uncertain_significance_for_condition",
    "POLY": "has_uncertain_significance_for_condition",
    "Affects, other": "has_uncertain_significance_for_condition",
    "Benign/Likely benign": "likely_benign_for_condition",
    "Benign/Likely benign, other": "likely_benign_for_condition",
    "Benign/Likely benign, risk factor": "likely_benign_for_condition",
    "Benign, other": "benign_for_condition",
    "Benign, risk factor": "benign_for_condition",
    "Conflicting interpretations of pathogenicity": "has_uncertain_significance_for_condition",
    "Conflicting interpretations of pathogenicity, other": "has_uncertain_significance_for_condition",
    "Conflicting interpretations of pathogenicity, risk factor": "has_uncertain_significance_for_condition",
    "Likely benign, other": "likely_benign_for_condition",
    "Likely benign, risk factor": "likely_benign_for_condition",
    "Likely pathogenic, other": "likely_pathogenic_for_condition",
    "Likely pathogenic, risk factor": "likely_pathogenic_for_condition",
    "other, risk factor": "has_uncertain_significance_for_condition",
    "Pathogenic, Affects": "pathogenic_for_condition",
    "Pathogenic, association": "pathogenic_for_condition",
    "Pathogenic, drug response": "pathogenic_for_condition",
    "Pathogenic/Likely pathogenic, other": "pathogenic_for_condition",
    "Pathogenic/Likely pathogenic, risk factor": "pathogenic_for_condition",
    "Pathogenic, other": "pathogenic_for_condition",
    "Pathogenic, risk factor": "pathogenic_for_condition",
    "Uncertain significance, Affects": "has_uncertain_significance_for_condition",
    "Uncertain significance, other": "has_uncertain_significance_for_condition",
    "Uncertain significance, risk factor": "has_uncertain_significance_for_condition",
    "Likely pathogenic, Affects": "likely_pathogenic_for_condition",
}
UNCERTAIN = "has_uncertain_significance_for_condition"
#: internal significance label → curie (GLOBAL_TERMS.yaml)
SIG_CURIE = {
    "pathogenic_for_condition": "GENO:0000840",
    "likely_pathogenic_for_condition": "GENO:0000841",
    "benign_for_condition": "GENO:0000843",
    "likely_benign_for_condition": "GENO:0000844",
    "has_uncertain_significance_for_condition": "GENO:0000845",
    "has_drug_response": ":has_drug_response",
    "protective_for_condition": "RO:0003307",
}
#: significance label → curie directly (resolve = global ∘ local)
SIGNIFICANCE = {k: SIG_CURIE[v] for k, v in SIG_INTERNAL.items()}

#: variant/measure @Type → SO/GENO curie (clinvar.yaml "Variant Sequence
#: Types" ∘ GLOBAL_TERMS.yaml)
VARIANT_TYPE = {
    "single nucleotide variant": "SO:0001483",
    "Deletion": "SO:0000159",
    "copy number gain": "SO:0001742",
    "copy number loss": "SO:0001743",
    "Duplication": "SO:1000035",
    "Diplotype": "SO:0001028",
    "Insertion": "SO:0000667",
    "Indel": "SO:1000032",
    "Variation": "SO:0001059",
    "Translocation": "SO:0000199",
    "Tandem duplication": "SO:1000173",
    "Complex": "SO:0001784",
    "Structural variant": "SO:0001785",
    "NT expansion": "SO:1000039",
    "undetermined variant": "SO:0001059",
    "Inversion": "SO:1000036",
    "Microsatellite": "SO:0000289",
    "protein only": "SO:0001818",
    "CompoundHeterozygote": "GENO:0000402",
    "Haplotype": "SO:0001024",
    "Haplotype, single variant": "SO:0001024",
    "Phase unknown": "SO:0001024",
    "Distinct chromosomes": ":mosaic_genotype",  # 'mosaic' has no OBO home
}
#: measure-set supertypes accepted verbatim (process_measure_set 310-320);
#: 'Variant' infers from the single allele
MEASURE_SET_TYPES = {
    "Haplotype", "Phase unknown", "Distinct chromosomes",
    "Haplotype, single variant",
}

#: MeasureRelationship @Type → internal label (clinvar.yaml)
REL_INTERNAL = {
    "within single gene": "has_affected_feature",
    "genes overlapped by variant": "has_part",
    "within multiple genes by overlap": "has_affected_feature",
    "variant in gene": "has_affected_feature",
    "near gene, upstream": "is upstream of sequence of",
    "near gene, downstream": "is downstream of sequence of",
    "asserted, but not computed": "part_of",
}
REL_CURIE_GLOBAL = {
    "has_affected_feature": "GENO:0000418",
    "has_part": "BFO:0000051",
    "is upstream of sequence of": "RO:0002528",
    "is downstream of sequence of": "RO:0002529",
    "part_of": "BFO:0000050",
}
REL_CURIE = {k: REL_CURIE_GLOBAL[v] for k, v in REL_INTERNAL.items()}

#: ObservedIn/Method/MethodType → evidence-activity curie
METHOD_TYPE = {
    "clinical testing": "SEPIO:0000067",
    "research": "SEPIO:0000066",
    "literature only": "SEPIO:0000080",
    "curation": "SEPIO:0000081",
    "reference population": "SEPIO:0000102",
    "case-control": "SEPIO:0000071",
    "in vitro": "SEPIO:0000073",
    "patient phenotyping study": "SEPIO:0000186",  # 'phenotyping only'
    "provider interpretation": "ECO:0000311",      # 'imported information'
}

#: review status → stars (ClinVar.py:1083-1091)
REVIEW_STARS = {
    "no assertion criteria provided": "0",
    "no assertion provided": "0",
    "criteria provided, single submitter": "1",
    "criteria provided, conflicting interpretations": "1",
    "criteria provided, multiple submitters, no conflicts": "2",
    "reviewed by expert panel": "3",
    "practice guideline": "4",
}
#: 'arbitrary scoring scheme increments as powers of two' (ClinVar.py:255-262)
SIG_SCORE = {
    "GENO:0000840": 1, "GENO:0000841": 2, "GENO:0000844": 4,
    "GENO:0000843": 8, "GENO:0000845": 16,
}
#: |score diff| → link predicate (ClinVar.py:264-276)
SIG_LINK = {
    "0": "SEPIO:0000098", "1": "SEPIO:0000099", "2": "SEPIO:0000101",
    "3": "SEPIO:0000101", "4": "SEPIO:0000099", "6": "SEPIO:0000101",
    "7": "SEPIO:0000100", "8": "SEPIO:0000126", "12": "SEPIO:0000126",
    "14": "SEPIO:0000126", "15": "SEPIO:0000126",
}

EVIDENCE_CLASS = "ECO:0000000"
ASSERTION_CLASS = "SEPIO:0000001"
ASSERTION_METHOD_CLASS = "SEPIO:0000037"
HAS_SUPPORTING_EVIDENCE = "SEPIO:0000007"
IS_ASSERTED_IN = "SEPIO:0000015"
CREATED_BY = "SEPIO:0000018"
IS_SPECIFIED_BY = "SEPIO:0000041"
HAS_SUPPORTING_ACTIVITY = "SEPIO:0000085"
SUPPORTED_BY_EVIDENCE = "SEPIO:0000111"
HAS_SUPPORTING_REFERENCE = "SEPIO:0000124"
CONFIDENCE_SCORE = "SEPIO:0000168"
HAS_URL = "ERO:0000480"
JOURNAL_ARTICLE = "IAO:0000013"
ORGANIZATION = "foaf:organization"
OBAN_ASSOCIATION = "OBAN:association"
HAS_SUBJECT = "OBAN:association_has_subject"
HAS_OBJECT = "OBAN:association_has_object"
HAS_PREDICATE = "OBAN:association_has_predicate"
HUMAN = "NCBITaxon:9606"

# ---------------------------------------------------------------------------
# nested record schema
# ---------------------------------------------------------------------------

GENE_SCHEMA = StructType([
    StructField("id", StringType()), StructField("rel", StringType()),
])
ALLELE_SCHEMA = StructType([
    StructField("id", StringType()),
    StructField("label", StringType()),
    StructField("variant_type", StringType()),
    StructField("synonyms", ArrayType(StringType())),
    StructField("dbsnps", ArrayType(StringType())),
    StructField("genes", ArrayType(GENE_SCHEMA)),
])
VARIANT_SCHEMA = StructType([
    StructField("id", StringType()),
    StructField("alleles", ArrayType(ALLELE_SCHEMA)),
])
CONDITION_SCHEMA = StructType([
    StructField("id", StringType()),
    StructField("label", StringType()),
    StructField("database", StringType()),
    StructField("medgen", StringType()),
])
METHOD_SCHEMA = StructType([
    StructField("name", StringType()), StructField("url", StringType()),
])
SCV_SCHEMA = StructType([
    StructField("num_id", StringType()),
    StructField("acc", StringType()),
    StructField("version", StringType()),
    StructField("org_id", StringType()),
    StructField("submitter", StringType()),
    StructField("sig_label", StringType()),
    StructField("eval_date", StringType()),
    StructField("methods", ArrayType(METHOD_SCHEMA)),
    StructField("sig_pmids", ArrayType(StringType())),
    StructField("obs_pmids", ArrayType(StringType())),
    StructField("obs_descriptions", ArrayType(StringType())),
    StructField("method_types", ArrayType(StringType())),
])
RECORD_SCHEMA = StructType([
    StructField("rcv_id", StringType()),
    StructField("rcv_acc", StringType()),
    StructField("significance", StringType()),
    StructField("review_status", StringType()),
    StructField("genovar_id", StringType()),
    StructField("genovar_label", StringType()),
    StructField("genovar_type", StringType()),
    StructField("is_genotype", BooleanType()),
    StructField("variants", ArrayType(VARIANT_SCHEMA)),
    StructField("conditions", ArrayType(CONDITION_SCHEMA)),
    StructField("scvs", ArrayType(SCV_SCHEMA)),
])


def _parse_measure_set(measure_set, rcv_acc: str) -> dict:
    """process_measure_set (ClinVar.py:301-405) → variant dict."""
    ms_type = measure_set.get("Type")
    variant = {"id": "ClinVarVariant:" + measure_set.get("ID"), "alleles": []}
    variant_type = ms_type if ms_type in MEASURE_SET_TYPES else None
    if variant_type is None and ms_type != "Variant":
        raise ValueError(f"{rcv_acc} UNKNOWN VARIANT SUPERTYPE / TYPE {ms_type}")
    for measure in measure_set.findall("./Measure"):
        name = measure.find('./Name/ElementValue[@Type="Preferred"]')
        allele = {
            "id": "ClinVarVariant:" + measure.get("ID"),
            "label": name.text if name is not None else None,
            "variant_type": measure.get("Type").strip(),
            "synonyms": [], "dbsnps": [], "genes": [],
        }
        for syn in measure.findall("./AttributeSet/Attribute[@Type]"):
            if syn.get("Type").startswith("HGVS") and syn.text is not None:
                allele["synonyms"].append(syn.text)
        for dbsnp in measure.findall('./XRef[@DB="dbSNP"]'):
            allele["dbsnps"].append("dbSNP:" + dbsnp.get("ID"))
            allele["synonyms"].append("rs" + dbsnp.get("ID"))
        for rel in measure.findall("./MeasureRelationship"):
            gene = rel.find('./XRef[@DB="Gene"]')
            allele["genes"].append({
                "id": gene.get("ID") if gene is not None else None,
                "rel": rel.get("Type").strip(),
            })
        variant["alleles"].append(allele)
    # single allele: the allele IS the variant (ClinVar.py:396-400)
    if len(variant["alleles"]) == 1:
        variant["alleles"][0]["id"] = variant["id"]
        variant_type = variant["alleles"][0]["variant_type"]
    if variant_type is None:
        raise ValueError(f"{rcv_acc} Unable to infer type from {ms_type}")
    return variant, variant_type


def _parse_condition(trait) -> dict:
    """One Trait[@Type='Disease'] → condition dict (ClinVar.py:938-1012)."""
    name = trait.find('./Name/ElementValue[@Type="Preferred"]')
    db = cid = medgen = None
    for xr in trait.findall('./XRef[@DB="OMIM"]'):
        db, cid = "OMIM", xr.get("ID")
        if cid.startswith("PS"):
            db = "OMIMPS"
        break
    if db is None:
        for xr in trait.findall('./XRef[@DB="Orphanet"]'):
            db, cid = "ORPHA", xr.get("ID")
            break
    if db is None:
        for xr in trait.findall('./XRef[@DB="MONDO"]'):
            db, cid = "MONDO", xr.get("ID")
            break
    for xr in trait.findall('./XRef[@DB="MedGen"]'):
        medgen = xr.get("ID")
        if db is None:
            db = "UMLS"
        if cid is None:
            cid = medgen
    return {
        "id": cid, "label": name.text if name is not None else None,
        "database": db, "medgen": medgen,
    }


def _parse_scv(scv) -> dict:
    """One ClinVarAssertion → SCV dict (structural slice of the reference's
    SCV loop, ClinVar.py:1052-1506)."""
    acc_el = scv.find("./ClinVarAccession")
    sub_el = scv.find("./ClinVarSubmissionID")
    clin_sig = scv.find("./ClinicalSignificance")
    sig_el = clin_sig.find("./Description") if clin_sig is not None else None
    rec = {
        "num_id": scv.get("ID"),
        "acc": acc_el.get("Acc"),
        "version": acc_el.get("Version"),
        "org_id": acc_el.get("OrgID"),
        "submitter": sub_el.get("submitter") if sub_el is not None else None,
        "sig_label": sig_el.text.strip() if sig_el is not None and sig_el.text else None,
        "eval_date": clin_sig.get("DateLastEvaluated") if clin_sig is not None else None,
        "methods": [], "sig_pmids": [], "obs_pmids": [],
        "obs_descriptions": [], "method_types": [],
    }
    for aset in scv.findall("./AttributeSet"):
        attr = aset.find('./Attribute[@Type="AssertionMethod"]')
        if attr is not None:
            cite = aset.find("./Citation/URL")
            rec["methods"].append({
                "name": attr.text, "url": cite.text if cite is not None else None,
            })
    if clin_sig is not None:
        for cite in clin_sig.findall('./Citation/ID[@Source="PubMed"]'):
            rec["sig_pmids"].append(cite.text)
    for obs in scv.findall("./ObservedIn"):
        for od in obs.findall("./ObservedData"):
            for cite in od.findall("./Citation"):
                for pmid in cite.findall('./ID[@Source="PubMed"]'):
                    rec["obs_pmids"].append(pmid.text)
            for desc in od.findall('Attribute[@Type="Description"]'):
                if desc.text != "not provided":
                    rec["obs_descriptions"].append(desc.text)
        for mt in obs.findall("./Method/MethodType"):
            if mt.text != "not provided":
                rec["method_types"].append(mt.text)
    return rec


def parse_clinvarset(elem) -> dict:
    """One <ClinVarSet> stanza → nested RCV record (the Spark analog of the
    reference's ClinVarRecord construction, ClinVar.py:824-1040).  Pure
    structural extraction; raises on malformed stanzas → corrupt-record
    routing upstream."""
    rcv = elem.find("./ReferenceClinVarAssertion")
    rcv_acc = rcv.find("./ClinVarAccession").get("Acc")
    sig_el = rcv.find("./ClinicalSignificance/Description")
    rev_el = rcv.find("./ClinicalSignificance/ReviewStatus")

    measure_set = rcv.find("./MeasureSet")
    if measure_set is None:
        gset = rcv.find("./GenotypeSet")
        name = gset.find('./Name/ElementValue[@Type="Preferred"]')
        genovar_id = "ClinVarVariant:" + gset.get("ID")
        genovar_label = name.text if name is not None else None
        genovar_type = gset.get("Type")
        is_genotype = True
        variants = [
            _parse_measure_set(ms, rcv_acc)[0]
            for ms in gset.findall("./MeasureSet")
        ]
    else:
        variant, genovar_type = _parse_measure_set(measure_set, rcv_acc)
        genovar_id, genovar_label, is_genotype = variant["id"], None, False
        variants = [variant]

    return {
        "rcv_id": rcv.get("ID"),
        "rcv_acc": rcv_acc,
        "significance": sig_el.text if sig_el is not None else None,
        "review_status": rev_el.text.strip() if rev_el is not None and rev_el.text else None,
        "genovar_id": genovar_id,
        "genovar_label": genovar_label,
        "genovar_type": genovar_type,
        "is_genotype": is_genotype,
        "variants": variants,
        "conditions": [
            _parse_condition(t)
            for ts in rcv.findall("./TraitSet")
            for t in ts.findall('./Trait[@Type="Disease"]')
        ],
        "scvs": [_parse_scv(s) for s in elem.findall("./ClinVarAssertion")],
    }


# ---------------------------------------------------------------------------
# column-expression helpers
# ---------------------------------------------------------------------------


def _map_lit(d: dict) -> Column:
    """A static dict as a MapType literal (broadcast in the plan, no UDF)."""
    pairs = []
    for k, v in d.items():
        pairs.extend([F.lit(str(k)), F.lit(str(v))])
    return F.create_map(*pairs)


def _lookup(d: dict, col: Column) -> Column:
    return F.element_at(_map_lit(d), col)


def _digest(*cols: Column) -> Column:
    return digest_id(F.concat(*cols))


def _disease_curie(cond: Column) -> Column:
    """db:id, or the last two ':'-segments when the id is already a curie
    (ClinVar.py:1071-1075)."""
    return F.when(
        cond["id"].contains(":"),
        F.concat_ws(":", F.slice(F.split(cond["id"], ":"), -2, 2)),
    ).otherwise(F.concat(cond["database"], F.lit(":"), cond["id"]))


def _scv_is_good(s: Column) -> Column:
    """The reference keeps an SCV's stanza only when its significance is
    explicit (ClinVar.py:1341-1390): mapped, not uncertain, not
    'protective'."""
    internal = _lookup(SIG_INTERNAL, s["sig_label"])
    return internal.isNotNull() & (internal != UNCERTAIN) & (s["sig_label"] != "protective")


@register
class ClinVarPipeline(SourcePipeline):
    name = "clinvar"
    files = {
        "release": FileContract(
            file="ClinVarFullRelease*.xml*",
            url="ftp://ftp.ncbi.nlm.nih.gov/pub/clinvar/xml/",
            # the real release is ONE ~1.5 GB xml.gz — staging splits it at
            # ClinVarSet boundaries so the scan runs one task per chunk
            split_tag="ClinVarSet",
        ),
        "g2p": FileContract(
            file="gene_condition_source_id",
            url="ftp://ftp.ncbi.nlm.nih.gov/pub/clinvar/gene_condition_source_id",
        ),
    }

    def read_records(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        import glob

        from dipper_spark.io import read_xml_stanzas
        from dipper_spark.io.staging import expand_split_inputs

        paths = expand_split_inputs(sorted(glob.glob(self.path(raw_dir, "release"))))
        return read_xml_stanzas(spark, paths, "ClinVarSet", parse_clinvarset, RECORD_SCHEMA)

    def g2p_map(self, spark: SparkSession, raw_dir: str) -> DataFrame | None:
        """gene_condition_source_id as a (gene, medgen_ids) broadcast dim.
        The reference reads it driver-side skipping the FIRST LINE as a
        header (ClinVar.py:772-781) — mirrored with a deterministic
        zipWithIndex so the same row is dropped."""
        import glob as _glob

        paths = sorted(_glob.glob(self.path(raw_dir, "g2p")))
        if not paths:
            return None
        lines = (
            spark.read.text(paths).rdd.zipWithIndex()
            .filter(lambda pair: pair[1] > 0)
            .map(lambda pair: (pair[0].value,))
        )
        return (
            spark.createDataFrame(lines, "value string")
            .select(F.split("value", "\t").alias("f"))
            .select(F.get("f", 0).alias("gene_num"), F.get("f", 3).alias("medgen"))
            .filter(F.col("gene_num").isNotNull() & F.col("medgen").isNotNull())
            .groupBy("gene_num")
            .agg(F.collect_set("medgen").alias("medgen_ids"))
        )

    # ------------------------------------------------------------------
    # triple generation
    # ------------------------------------------------------------------

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        recs = self.read_records(spark, raw_dir).filter(F.col("_corrupt_record").isNull())
        if limit:
            recs = recs.limit(limit)
        # under-specified skip (ClinVar.py:1020-1040): at least one condition
        # with both an id and a database
        recs = recs.filter(
            F.exists("conditions", lambda c: c["id"].isNotNull() & c["database"].isNotNull())
        )
        # order-dependent buffer-deletion model: last bad SCV position
        bads = F.filter(
            F.transform(
                "scvs",
                lambda s, i: F.struct(i.alias("pos"), _scv_is_good(s).alias("good")),
            ),
            lambda e: ~e["good"],
        )
        recs = recs.withColumn(
            "last_bad", F.coalesce(F.array_max(bads["pos"]), F.lit(-1))
        ).localCheckpoint(eager=False)

        parts: list[DataFrame] = [
            self._variant_triples(spark, recs.filter(F.col("last_bad") == -1), raw_dir),
            self._scv_triples(recs),
            self._link_triples(recs),
        ]
        return union_graphs(*parts).dropDuplicates(["subject", "predicate", "object"])

    # -- record_to_triples (ClinVar.py:474-603) -------------------------

    def _variant_triples(
        self, spark: SparkSession, recs: DataFrame, raw_dir: str
    ) -> DataFrame:
        g = self.name
        parts: list[DataFrame] = []

        # genovar typing/taxon/label
        typed = recs.withColumn("gv_type", _lookup(VARIANT_TYPE, F.col("genovar_type")))
        parts.append(
            make_triples(
                typed.filter(F.col("gv_type").isNotNull()),
                "genovar_id", F.lit(T.TYPE), "gv_type", graph_id=g,
            )
        )
        parts.append(
            make_triples(recs, "genovar_id", F.lit(T.IN_TAXON), F.lit(HUMAN), graph_id=g)
        )
        parts.append(
            make_triples(
                recs.filter(F.col("genovar_label").isNotNull()),
                "genovar_id", F.lit(T.LABEL), "genovar_label",
                is_literal=True, graph_id=g,
            )
        )

        # allele_to_triples for every allele of every variant (both branches)
        alleles = recs.select(
            "rcv_acc", "is_genotype",
            F.explode(F.flatten("variants.alleles")).alias("a"),
        ).select(
            "rcv_acc", "is_genotype",
            F.col("a.id").alias("allele_id"),
            F.col("a.label").alias("allele_label"),
            _lookup(VARIANT_TYPE, F.col("a.variant_type")).alias("allele_type"),
            F.col("a.synonyms").alias("synonyms"),
            F.col("a.dbsnps").alias("dbsnps"),
            F.col("a.genes").alias("genes"),
        )
        parts.append(
            make_triples(
                alleles.filter(F.col("allele_type").isNotNull()),
                "allele_id", F.lit(T.TYPE), "allele_type", graph_id=g,
            )
        )
        parts.append(
            make_triples(alleles, "allele_id", F.lit(T.IN_TAXON), F.lit(HUMAN), graph_id=g)
        )
        parts.append(
            make_triples(
                alleles.filter(F.col("allele_label").isNotNull()),
                "allele_id", F.lit(T.LABEL), "allele_label", is_literal=True, graph_id=g,
            )
        )
        dbsnps = alleles.select("allele_id", F.explode("dbsnps").alias("snp"))
        parts.append(
            make_triples(dbsnps, "allele_id", F.lit(T.HAS_DBXREF), "snp", graph_id=g)
        )
        syns = alleles.select("allele_id", F.explode("synonyms").alias("syn"))
        parts.append(
            make_triples(
                syns, "allele_id", F.lit(T.HAS_EXACT_SYNONYM), "syn",
                is_literal=True, graph_id=g,
            )
        )

        # ---- Variant branch (ClinVar.py:495-553) ----------------------
        vb = recs.filter(~F.col("is_genotype")).withColumn(
            "v0", F.get("variants", 0)
        )
        multi = vb.filter(F.size(F.col("v0.alleles")) > 1).select(
            "genovar_id", F.explode(F.col("v0.alleles")).alias("a")
        )
        parts.append(
            make_triples(
                multi, "genovar_id", F.lit(T.HAS_VARIANT_PART), F.col("a.id"), graph_id=g
            )
        )
        # the gene/variant relationship "hack": when every relation maps to
        # has_affected_feature, relate the GENOVAR to each gene — affected
        # iff pathogenic/likely-pathogenic AND every condition's medgen is
        # curated for that gene in the g2p dim; else part_of.  Otherwise
        # each ALLELE is part_of each gene.
        rel_internal = _map_lit(REL_INTERNAL)
        vb = vb.withColumn("gene_rels", F.flatten(F.transform(F.col("v0.alleles"), lambda a: a["genes"])))
        all_haf = F.forall(
            "gene_rels",
            lambda gr: F.element_at(rel_internal, gr["rel"]) == "has_affected_feature",
        )
        sig_ok = _lookup(SIGNIFICANCE, F.col("significance")).isin(
            "GENO:0000840", "GENO:0000841"
        )
        hack = (
            vb.filter(all_haf)
            .select(
                "genovar_id", "conditions", sig_ok.alias("sig_ok"),
                F.explode("gene_rels").alias("gr"),
            )
            .withColumn("gene_num", F.col("gr.id"))
            .filter(F.col("gene_num").isNotNull())
        )
        g2p = self.g2p_map(spark, raw_dir)
        if g2p is not None:
            hack = hack.join(F.broadcast(g2p), "gene_num", "left")
        else:
            hack = hack.withColumn("medgen_ids", F.lit(None).cast("array<string>"))
        affected = F.col("sig_ok") & F.forall(
            "conditions",
            lambda c: c["medgen"].isNotNull()
            & F.coalesce(F.array_contains(F.col("medgen_ids"), c["medgen"]), F.lit(False)),
        )
        parts.append(
            make_triples(
                hack,
                "genovar_id",
                F.when(affected, _lookup(REL_CURIE, F.col("gr.rel"))).otherwise(
                    F.lit(REL_CURIE_GLOBAL["part_of"])
                ),
                F.concat(F.lit("NCBIGene:"), "gene_num"),
                graph_id=g,
            )
        )
        no_hack = (
            vb.filter(~all_haf)
            .select(F.explode(F.col("v0.alleles")).alias("a"))
            .select(F.col("a.id").alias("allele_id"), F.explode(F.col("a.genes")).alias("gr"))
            .filter(F.col("gr.id").isNotNull())
        )
        parts.append(
            make_triples(
                no_hack, "allele_id", F.lit(REL_CURIE_GLOBAL["part_of"]),
                F.concat(F.lit("NCBIGene:"), F.col("gr.id")), graph_id=g,
            )
        )

        # ---- Genotype branch (ClinVar.py:560-603) ---------------------
        gb = recs.filter(F.col("is_genotype"))
        gvariants = gb.select("genovar_id", F.explode("variants").alias("v"))
        parts.append(
            make_triples(
                gvariants, "genovar_id", F.lit(T.HAS_VARIANT_PART), F.col("v.id"), graph_id=g
            )
        )
        gt_genes = (
            gb.select(F.explode(F.flatten("variants.alleles")).alias("a"))
            .select(F.col("a.id").alias("allele_id"), F.explode(F.col("a.genes")).alias("gr"))
            .withColumn("rel_curie", _lookup(REL_CURIE, F.col("gr.rel")))
            .filter(F.col("rel_curie").isNotNull() & F.col("gr.id").isNotNull())
        )
        parts.append(
            make_triples(
                gt_genes, "allele_id", F.col("rel_curie"),
                F.concat(F.lit("NCBIGene:"), F.col("gr.id")), graph_id=g,
            )
        )
        comp_het = gb.filter(F.col("genovar_type") == "CompoundHeterozygote")
        parts.append(
            make_triples(
                comp_het, "genovar_id", F.lit("GENO:0000608"), F.lit("GENO:0000402"),
                graph_id=g,
            )
        )
        # single-gene genotype → has_affected_feature (ClinVar.py:590-601)
        gb2 = gb.withColumn(
            "gene_rels", F.flatten(F.transform(F.flatten("variants.alleles"), lambda a: a["genes"]))
        )
        single_gene = gb2.filter(
            F.forall("gene_rels", lambda gr: gr["rel"].isin("within single gene", "variant in gene"))
            & (F.size(F.array_distinct(F.col("gene_rels.id"))) == 1)
        )
        parts.append(
            make_triples(
                single_gene, "genovar_id", F.lit(REL_CURIE_GLOBAL["has_affected_feature"]),
                F.concat(F.lit("NCBIGene:"), F.get(F.col("gene_rels.id"), 0)), graph_id=g,
            )
        )
        return union_graphs(*parts)

    # -- per-SCV×condition association stanza (ClinVar.py:1052-1506) ----

    def _scv_triples(self, recs: DataFrame) -> DataFrame:
        g = self.name
        scx = (
            recs.select(
                "rcv_id", "rcv_acc", "genovar_id", "review_status", "last_bad",
                "conditions", F.posexplode("scvs").alias("pos", "scv"),
            )
            .filter(_scv_is_good(F.col("scv")) & (F.col("pos") > F.col("last_bad")))
            .select(
                "rcv_id", "rcv_acc", "genovar_id", "review_status", "scv",
                F.explode(
                    F.filter("conditions", lambda c: c["database"].isNotNull())
                ).alias("cond"),
            )
            .withColumn("disease", _disease_curie(F.col("cond")))
            .withColumn("mid", _digest(F.col("rcv_id"), F.col("scv.num_id"), F.col("cond.id")))
            .withColumn("assoc", F.concat(F.lit("MONARCH:"), "mid"))
            .withColumn("ev_id", F.concat(F.lit("_:"), _digest(F.col("mid"), F.lit("_evidence"))))
            .withColumn("as_id", F.concat(F.lit("_:"), _digest(F.col("mid"), F.lit("_assertion"))))
            .withColumn("scv_geno", _lookup(SIGNIFICANCE, F.col("scv.sig_label")))
        )
        parts: list[DataFrame] = []
        lit = dict(is_literal=True, graph_id=g)

        # review-status confidence score (xsd:integer literal)
        scored = scx.withColumn("stars", _lookup(REVIEW_STARS, F.col("review_status"))).filter(
            F.col("stars").isNotNull()
        )
        parts.append(
            make_triples(
                scored, "assoc", F.lit(CONFIDENCE_SCORE), "stars",
                is_literal=True, datatype="xsd:integer", graph_id=g,
            )
        )
        # core association stanza
        parts.append(make_triples(scx, "assoc", F.lit(T.TYPE), F.lit(OBAN_ASSOCIATION), graph_id=g))
        parts.append(make_triples(scx, "assoc", F.lit(HAS_SUBJECT), "genovar_id", graph_id=g))
        parts.append(make_triples(scx, "assoc", F.lit(HAS_OBJECT), "disease", graph_id=g))
        parts.append(
            make_triples(
                scx.filter(F.col("cond.label").isNotNull()),
                "disease", F.lit(T.LABEL), F.col("cond.label"), **lit,
            )
        )
        parts.append(make_triples(scx, "assoc", F.lit(HAS_SUPPORTING_EVIDENCE), "ev_id", graph_id=g))
        parts.append(make_triples(scx, "assoc", F.lit(IS_ASSERTED_IN), "as_id", graph_id=g))
        parts.append(make_triples(scx, "ev_id", F.lit(T.TYPE), F.lit(EVIDENCE_CLASS), graph_id=g))
        parts.append(
            make_triples(scx, "ev_id", F.lit(T.LABEL), F.concat("mid", F.lit("_evidence")), **lit)
        )
        parts.append(make_triples(scx, "as_id", F.lit(T.TYPE), F.lit(ASSERTION_CLASS), graph_id=g))
        parts.append(
            make_triples(scx, "as_id", F.lit(T.LABEL), F.concat("mid", F.lit("_assertion")), **lit)
        )
        parts.append(
            make_triples(
                scx, "as_id", F.lit(T.LABEL),
                F.concat(F.lit("ClinVarAssertion_"), F.col("scv.num_id")), **lit,
            )
        )
        parts.append(make_triples(scx, "as_id", F.lit(SUPPORTED_BY_EVIDENCE), "ev_id", graph_id=g))
        parts.append(
            make_triples(
                scx, "as_id", F.lit(T.DC_IDENTIFIER),
                F.concat(F.col("scv.acc"), F.lit("."), F.col("scv.version")), **lit,
            )
        )
        submitters = scx.filter(F.col("scv.org_id").isNotNull()).withColumn(
            "org", F.concat(F.lit("ClinVarSubmitters:"), F.col("scv.org_id"))
        )
        parts.append(make_triples(submitters, "as_id", F.lit(CREATED_BY), "org", graph_id=g))
        parts.append(make_triples(submitters, "org", F.lit(T.TYPE), F.lit(ORGANIZATION), graph_id=g))
        parts.append(
            make_triples(
                submitters.filter(F.col("scv.submitter").isNotNull()),
                "org", F.lit(T.LABEL), F.col("scv.submitter"), **lit,
            )
        )

        # assertion methods (ClinVar.py:1232-1295)
        methods = scx.select(
            "as_id", F.col("scv.eval_date").alias("eval_date"), F.explode("scv.methods").alias("m")
        ).withColumn(
            "mb", F.concat(F.lit("_:"), _digest(F.col("m.name"), F.lit("_assertionmethod")))
        )
        parts.append(
            make_triples(
                methods.filter(F.col("eval_date").isNotNull()),
                "as_id", F.lit(T.DC_CREATED), "eval_date", **lit,
            )
        )
        parts.append(
            make_triples(
                methods, "mb", F.lit(T.LABEL),
                F.concat(F.col("m.name"), F.lit("_assertionmethod")), **lit,
            )
        )
        parts.append(make_triples(methods, "as_id", F.lit(IS_SPECIFIED_BY), "mb", graph_id=g))
        parts.append(
            make_triples(methods, "mb", F.lit(T.TYPE), F.lit(ASSERTION_METHOD_CLASS), graph_id=g)
        )
        parts.append(make_triples(methods, "mb", F.lit(T.LABEL), F.col("m.name"), **lit))
        parts.append(
            make_triples(
                methods.filter(F.col("m.url").isNotNull()),
                "mb", F.lit(HAS_URL), F.col("m.url"), **lit,
            )
        )

        # citations: significance-level and observed-data (same 3 triples)
        pmids = scx.select(
            "assoc", "ev_id",
            F.explode(F.concat("scv.sig_pmids", "scv.obs_pmids")).alias("p"),
        ).withColumn("pmid", F.concat(F.lit("PMID:"), "p"))
        parts.append(
            make_triples(pmids, "ev_id", F.lit(HAS_SUPPORTING_REFERENCE), "pmid", graph_id=g)
        )
        parts.append(make_triples(pmids, "assoc", F.lit(T.SOURCE), "pmid", graph_id=g))
        parts.append(make_triples(pmids, "pmid", F.lit(T.TYPE), F.lit(JOURNAL_ARTICLE), graph_id=g))

        # observed-data descriptions
        descs = scx.select("ev_id", F.explode("scv.obs_descriptions").alias("d"))
        parts.append(make_triples(descs, "ev_id", F.lit(T.DESCRIPTION), "d", **lit))

        # observation method provenance (ClinVar.py:1469-1506); the bnode
        # digests over the evidence id WITH its '_:' prefix, and the first
        # label is that raw concatenation — reference-exact
        provs = (
            scx.select("ev_id", F.explode("scv.method_types").alias("mt"))
            .withColumn("mt_curie", _lookup(METHOD_TYPE, F.col("mt")))
            .filter(F.col("mt_curie").isNotNull())
            .withColumn("prov", F.concat(F.lit("_:"), _digest(F.col("ev_id"), F.col("mt_curie"))))
        )
        parts.append(
            make_triples(
                provs, "prov", F.lit(T.LABEL), F.concat("ev_id", "mt_curie"), **lit
            )
        )
        parts.append(make_triples(provs, "ev_id", F.lit(HAS_SUPPORTING_ACTIVITY), "prov", graph_id=g))
        parts.append(make_triples(provs, "prov", F.lit(T.TYPE), "mt_curie", graph_id=g))
        parts.append(make_triples(provs, "prov", F.lit(T.LABEL), "mt", **lit))

        # explicit-significance triples (ClinVar.py:1349-1381)
        parts.append(make_triples(scx, "assoc", F.lit(HAS_PREDICATE), "scv_geno", graph_id=g))
        parts.append(make_triples(scx, "genovar_id", F.col("scv_geno"), "disease", graph_id=g))
        parts.append(
            make_triples(
                scx, "assoc", F.lit(T.HAS_DBXREF),
                F.concat(F.lit("ClinVar:"), "rcv_acc"), graph_id=g,
            )
        )
        return union_graphs(*parts)

    # -- SCV pairwise significance links (scv_link, ClinVar.py:233-278) --

    def _link_triples(self, recs: DataFrame) -> DataFrame:
        """pathocalls → pairwise links.  The keys live in one record row, so
        pairs come from a double posexplode — map-side, no self-join."""
        g = self.name
        sig_score = _map_lit({k: str(v) for k, v in SIG_SCORE.items()})
        assocs = F.array_distinct(
            F.flatten(
                F.transform(
                    F.filter("scvs", _scv_is_good),
                    lambda s: F.transform(
                        F.filter("conditions", lambda c: c["database"].isNotNull()),
                        lambda c: F.struct(
                            F.concat(
                                F.lit("MONARCH:"),
                                digest_id(F.concat(F.col("rcv_id"), s["num_id"], c["id"])),
                            ).alias("assoc"),
                            F.element_at(
                                sig_score, _lookup(SIGNIFICANCE, s["sig_label"])
                            ).cast("int").alias("score"),
                        ),
                    ),
                )
            )
        )
        lhs = recs.select(assocs.alias("arr")).filter(F.size("arr") > 1)
        pairs = (
            lhs.select("arr", F.posexplode("arr").alias("pa", "a"))
            .select("a", "pa", F.posexplode("arr").alias("pb", "b"))
            .filter(F.col("pb") > F.col("pa"))
            .withColumn(
                "link",
                _lookup(
                    SIG_LINK,
                    F.abs(F.col("a.score") - F.col("b.score")).cast("string"),
                ),
            )
            .filter(F.col("link").isNotNull())
        )
        return union_graphs(
            make_triples(pairs, F.col("a.assoc"), F.col("link"), F.col("b.assoc"), graph_id=g),
            make_triples(pairs, F.col("b.assoc"), F.col("link"), F.col("a.assoc"), graph_id=g),
        )

    def rejects(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """Malformed stanzas (the reference's reject XML file,
        ClinVar.py:1020-1040) as a DataFrame."""
        return self.read_records(spark, raw_dir).filter(F.col("_corrupt_record").isNotNull())
