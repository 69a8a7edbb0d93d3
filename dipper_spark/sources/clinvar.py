"""ClinVar XML pipeline (M5): streaming stanza scan → nested rows →
normalize → SCV pairwise linking self-join → triples.

Reference: dipper/sources/ClinVar.py — iterparse stanza loop 824-848 with
reject routing 753-760, nested record model (ClinVarRecord.py:9-141),
record_to_triples 474-603, significance localtt
(translationtable/clinvar.yaml:24-33 → GENO:0000840/841/843/844/845),
review-status star scores (write_review_status_scores 606-666, dict 811-819,
W2), SCV agree/conflict pairwise linker (scv_link 233-278, J8).

Spark shape: one task per XML file (unsplittable format — same bound the
reference accepts single-threaded; here N files scan in parallel), nested
StructType rows, ``explode`` for alleles/scvs, and the scv linker as a
self-join on rcv_id with ``scv1 < scv2`` then symmetric emission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, StringType, StructField, StructType,
)

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import class_triples
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

#: clinical significance → GENO (clinvar.yaml:24-33 + GLOBAL_TERMS 255-259)
SIGNIFICANCE = {
    "Pathogenic": "GENO:0000840",
    "Likely pathogenic": "GENO:0000841",
    "Benign": "GENO:0000843",
    "Likely benign": "GENO:0000844",
    "Uncertain significance": "GENO:0000845",
}
#: 'arbitrary scoring scheme increments as powers of two' (ClinVar.py:250-256)
SIG_SCORE = {
    "GENO:0000840": 1, "GENO:0000841": 2, "GENO:0000844": 4,
    "GENO:0000843": 8, "GENO:0000845": 16,
}
#: |score diff| → link predicate (ClinVar.py:258-270)
SIG_LINK = {
    0: "SEPIO:0000098", 1: "SEPIO:0000099", 2: "SEPIO:0000101",
    3: "SEPIO:0000101", 4: "SEPIO:0000099", 6: "SEPIO:0000101",
    7: "SEPIO:0000100", 8: "SEPIO:0000126", 12: "SEPIO:0000126",
    14: "SEPIO:0000126", 15: "SEPIO:0000126",
}
#: review status → stars (ClinVar.py:811-819)
REVIEW_STARS = {
    "no assertion criteria provided": 0,
    "no assertion provided": 0,
    "criteria provided, single submitter": 1,
    "criteria provided, conflicting interpretations": 1,
    "criteria provided, multiple submitters, no conflicts": 2,
    "reviewed by expert panel": 3,
    "practice guideline": 4,
}
IS_CAUSAL_GERMLINE = "RO:0004013"  # globaltt['is causal germline mutation in']
HAS_STARS = "SEPIO:0000187"

SCV_SCHEMA = StructType([
    StructField("scv_id", StringType()),
    StructField("significance", StringType()),
    StructField("review_status", StringType()),
])

RECORD_SCHEMA = StructType([
    StructField("rcv_id", StringType()),
    StructField("variant_id", StringType()),
    StructField("variant_label", StringType()),
    StructField("variant_type", StringType()),
    StructField("gene_id", StringType()),
    StructField("condition_id", StringType()),
    StructField("scvs", ArrayType(SCV_SCHEMA)),
])


def parse_clinvarset(elem) -> dict:
    """One <ClinVarSet> stanza → flat-ish record (the Spark analog of
    ClinVarRecord construction, ClinVarRecord.py:115-141).  Raises on
    malformed stanzas → corrupt-record routing upstream."""
    rcv = elem.find("ReferenceClinVarAssertion")
    acc = rcv.find("ClinVarAccession").get("Acc")
    measure = rcv.find(".//Measure")
    variant_id = "ClinVarVariant:" + measure.get("ID")
    name = measure.find(".//Name/ElementValue")
    gene = measure.find(".//MeasureRelationship/XRef[@DB='Gene']")
    trait_xref = rcv.find(".//Trait/XRef[@DB='OMIM']")
    scvs = []
    for scv in elem.findall("ClinVarAssertion"):
        scv_acc = scv.find("ClinVarAccession").get("Acc")
        sig = scv.find(".//ClinicalSignificance/Description")
        rev = scv.find(".//ClinicalSignificance/ReviewStatus")
        scvs.append(
            {
                "scv_id": "ClinVar:" + scv_acc,
                "significance": sig.text if sig is not None else None,
                "review_status": rev.text if rev is not None else None,
            }
        )
    return {
        "rcv_id": "ClinVar:" + acc,
        "variant_id": variant_id,
        "variant_label": name.text if name is not None else None,
        "variant_type": measure.get("Type"),
        "gene_id": ("NCBIGene:" + gene.get("ID")) if gene is not None else None,
        "condition_id": ("OMIM:" + trait_xref.get("ID")) if trait_xref is not None else None,
        "scvs": scvs,
    }


def _static_map(mapping: dict, col: F.Column) -> F.Column:
    expr = F.lit(None).cast("string")
    for k, v in mapping.items():
        expr = F.when(col == str(k), F.lit(str(v))).otherwise(expr)
    return expr


@register
class ClinVarPipeline(SourcePipeline):
    name = "clinvar"
    files = {
        "release": FileContract(
            file="ClinVarFullRelease*.xml*",
            url="ftp://ftp.ncbi.nlm.nih.gov/pub/clinvar/xml/",
        ),
    }

    def read_records(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        import glob

        from dipper_spark.io import read_xml_stanzas

        paths = sorted(glob.glob(self.path(raw_dir, "release")))
        return read_xml_stanzas(spark, paths, "ClinVarSet", parse_clinvarset, RECORD_SCHEMA)

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        recs = self.read_records(spark, raw_dir).filter(F.col("_corrupt_record").isNull())
        if limit:
            recs = recs.limit(limit)

        variants = recs.filter(F.col("variant_id").isNotNull())
        var_facts = union_graphs(
            class_triples(
                variants.select(F.col("variant_id").alias("id"), F.col("variant_label").alias("lbl")),
                "id", "lbl", graph_id=g,
            ),
            make_triples(
                variants.filter(F.col("gene_id").isNotNull()),
                "variant_id", F.lit(T.HAS_AFFECTED_FEATURE), "gene_id", graph_id=g,
            ),
        )

        # variant → condition edge predicated by the RCV's strongest call is
        # modeled per-SCV here: each SCV asserts its significance (GENO
        # disposition) on the variant-condition pair
        scvs = (
            recs.select("rcv_id", "variant_id", "condition_id", F.explode("scvs").alias("scv"))
            .select(
                "rcv_id", "variant_id", "condition_id",
                F.col("scv.scv_id").alias("scv_id"),
                _static_map(SIGNIFICANCE, F.col("scv.significance")).alias("sig_geno"),
                F.col("scv.review_status").alias("review_status"),
            )
        )
        scv_facts = union_graphs(
            make_triples(scvs, "scv_id", F.lit(T.TYPE), F.lit("SEPIO:0000001"), graph_id=g),
            make_triples(
                scvs.filter(F.col("sig_geno").isNotNull()),
                "scv_id", F.lit(T.PATHOGENICITY), "sig_geno", graph_id=g,
            ),
            make_triples(
                scvs.filter(F.col("review_status").isNotNull()),
                "scv_id",
                F.lit(HAS_STARS),
                _static_map(REVIEW_STARS, F.col("review_status")),
                is_literal=True, datatype="xsd:integer", graph_id=g,
            ),
            make_triples(
                scvs.filter(F.col("condition_id").isNotNull() & F.col("sig_geno").isNotNull()),
                "variant_id", F.lit(IS_CAUSAL_GERMLINE), "condition_id", graph_id=g,
            ),
        )

        # SCV pairwise linker (J8): self-join on rcv_id, scv1 < scv2, link by
        # |sig score diff|, emitted in both directions (ClinVar.py:271-278)
        sigs = scvs.filter(F.col("sig_geno").isNotNull()).select(
            "rcv_id", "scv_id", _static_map(SIG_SCORE, F.col("sig_geno")).cast("int").alias("score")
        )
        a, b = sigs.alias("a"), sigs.alias("b")
        pairs = (
            a.join(b, (F.col("a.rcv_id") == F.col("b.rcv_id")) & (F.col("a.scv_id") < F.col("b.scv_id")))
            .select(
                F.col("a.scv_id").alias("scv1"),
                F.col("b.scv_id").alias("scv2"),
                _static_map(SIG_LINK, F.abs(F.col("a.score") - F.col("b.score")).cast("string")).alias("link"),
            )
            .filter(F.col("link").isNotNull())
        )
        links = union_graphs(
            make_triples(pairs, "scv1", F.col("link"), "scv2", graph_id=g),
            make_triples(pairs, "scv2", F.col("link"), "scv1", graph_id=g),
        )

        return union_graphs(var_facts, scv_facts, links).dropDuplicates(
            ["subject", "predicate", "object"]
        )

    def rejects(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """Malformed stanzas (the reference's reject XML file,
        ClinVar.py:753-760) as a DataFrame."""
        return self.read_records(spark, raw_dir).filter(F.col("_corrupt_record").isNotNull())
