"""MyDrug (AEOLUS) pipeline: drug → adverse-outcome associations with a
SEPIO evidence star.

Reference behavior: dipper/sources/MyDrug.py:83-215 — staged mydrug.info
JSON docs (one per line inside a JSON array); per doc: RXCUI/UNII drug
labels + sameAs + inchikey literal; outcomes filtered at odds-ratio >=
``or_limit`` (default 1) become ``RXCUI causes_or_contributes MEDDRA``
associations with the cut-off description and the ror as a
probabilistic-quantifier literal; each association carries a clinical-study
evidence line (digest id over assoc+outcome+source) with the Dryad dataset
source, the AEOLUS PMID, and count/prr/ror data individuals; provenance
asserts the association to the Monarch agent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.curie import CurieMap
from dipper_spark.core.ids import make_id
from dipper_spark.models import association_triples, individual_triples, pairwise_triples
from dipper_spark.models import terms as T
from dipper_spark.models.assoc import with_assoc_id
from dipper_spark.sources.base import FileContract, SourcePipeline, register

CAUSES_OR_CONTRIBUTES = "RO:0003302"
INCHI_KEY = "CHEBI:InChIKey"
PROB_QUANTIFIER = "GENO:0000867"
ASSERTED_BY = "SEPIO:0000130"
ORGANIZATION = "foaf:organization"
CLINICAL_STUDY_EVIDENCE = "ECO:0000180"
DATA_SET = "IAO:0000100"
PUBLICATION = "IAO:0000311"
COUNT = "SIO:000794"
PRR = "OAE:0001563"
ODDS_RATIO = "STATO:0000182"
HAS_EVIDENCE_LINE = "SEPIO:0000007"
HAS_EVIDENCE_ITEM = "SEPIO:0000084"
HAS_SUPPORTING_REF = "SEPIO:0000124"
HAS_VALUE = "STATO:0000129"
DRYAD_SOURCE = "DOI:10.5061/dryad.8q0s4/1"
DRYAD_LABEL = (
    "Data from: A curated and standardized adverse "
    "drug event resource to accelerate drug safety research"
)
AEOLUS_PMID = "PMID:27193236"

OUTCOME = StructType([
    StructField("code", StringType()),
    StructField("name", StringType()),
    StructField("id", StringType()),
    StructField("case_count", LongType()),
    StructField("prr", DoubleType()),
    StructField("ror", DoubleType()),
])
DOC_SCHEMA = StructType([
    StructField("aeolus", StructType([
        StructField("rxcui", StringType()),
        StructField("unii", StringType()),
        StructField("drug_name", StringType()),
        StructField("outcomes", ArrayType(OUTCOME)),
    ])),
    StructField("unii", StructType([StructField("inchikey", StringType())])),
])


@register
class MyDrugPipeline(SourcePipeline):
    name = "mydrug"
    files = {
        "aeolus": FileContract(
            file="aeolus.json",
            url="http://mydrug.info/v1/query",
        ),
    }
    test_ids = []

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False, or_limit: float = 1.0,
    ) -> DataFrame:
        g = self.name
        docs = spark.read.schema(DOC_SCHEMA).json(self.path(raw_dir, "aeolus"))
        if limit:
            docs = docs.limit(limit)
        drugs = docs.select(
            F.concat(F.lit("RXCUI:"), F.col("aeolus.rxcui")).alias("rxcui"),
            F.concat(F.lit("UNII:"), F.col("aeolus.unii")).alias("unii_curie"),
            F.col("aeolus.drug_name").alias("drug_name"),
            F.col("unii.inchikey").alias("inchikey"),
            F.col("aeolus.outcomes").alias("outcomes"),
        )
        outcomes = (
            drugs.select("rxcui", F.explode("outcomes").alias("o"))
            .filter(F.col("o.ror").isNotNull() & (F.col("o.ror") >= or_limit))
            .select(
                "rxcui",
                F.concat(F.lit("MEDDRA:"), F.col("o.code")).alias("meddra"),
                F.col("o.name").alias("outcome_name"),
                F.col("o.id").alias("outcome_id"),
                F.col("o.case_count").alias("case_count"),
                F.col("o.prr").alias("prr"),
                F.col("o.ror").alias("ror"),
            )
            .withColumn("_pred", F.lit(CAUSES_OR_CONTRIBUTES))
        )
        desc = (
            "A proportional reporting ratio or odds ratio greater than or "
            f"equal to {or_limit} in the AEOLUS data was the significance "
            "cut-off used for creating drug-outcome associations"
        )
        keyed = with_assoc_id(outcomes, "rxcui", "_pred", "meddra", definedby=g)
        # evidence line id digests assoc+outcome+source (MyDrug.py:180-183)
        keyed = keyed.withColumn(
            "ev_id", make_id(F.concat("assoc_id", "outcome_id", F.lit(g)))
        )
        measurements = [
            ("case_count", COUNT, "cnt_b"),
            ("prr", PRR, "prr_b"),
            ("ror", ODDS_RATIO, "ror_b"),
        ]
        keyed = (
            keyed.withColumn("cnt_b", make_id(F.concat("ev_id", F.col("case_count").cast("string"), F.lit(g)), prefix="_"))
            .withColumn("prr_b", make_id(F.concat("ev_id", F.col("prr").cast("string"), F.lit(g), F.lit("prr")), prefix="_"))
            .withColumn("ror_b", make_id(F.concat("ev_id", F.col("ror").cast("string"), F.lit(g), F.lit("ror")), prefix="_"))
        )
        base_iri = CurieMap().mapping[""]
        parts = [
            # drug labels + identity clique + inchikey (MyDrug.py:110-120)
            make_triples(drugs, "rxcui", F.lit(T.LABEL), "drug_name", is_literal=True, graph_id=g),
            make_triples(drugs, "unii_curie", F.lit(T.LABEL), "drug_name", is_literal=True, graph_id=g),
            pairwise_triples(drugs, "rxcui", "unii_curie", T.SAME_AS, graph_id=g),
            make_triples(
                drugs.filter(F.col("inchikey").isNotNull()),
                "rxcui", F.lit(INCHI_KEY), "inchikey", is_literal=True, graph_id=g,
            ),
            make_triples(outcomes, "meddra", F.lit(T.LABEL), "outcome_name", is_literal=True, graph_id=g),
            association_triples(outcomes, "rxcui", "_pred", "meddra", definedby=g, graph_id=g),
            make_triples(keyed, "assoc_id", F.lit(T.DESCRIPTION), F.lit(desc), is_literal=True, graph_id=g),
            make_triples(
                keyed, "assoc_id", F.lit(PROB_QUANTIFIER),
                F.col("ror").cast("string"), is_literal=True, graph_id=g,
            ),
            # provenance: asserted by the Monarch agent (MyDrug.py:150-160)
            make_triples(keyed, "assoc_id", F.lit(ASSERTED_BY), F.lit(base_iri), is_literal=False, graph_id=g),
            # SEPIO evidence star (MyDrug.py:162-215)
            make_triples(keyed, "assoc_id", F.lit(HAS_EVIDENCE_LINE), "ev_id", is_literal=False, graph_id=g),
            make_triples(keyed, "ev_id", F.lit(T.TYPE), F.lit(CLINICAL_STUDY_EVIDENCE), is_literal=False, graph_id=g),
            make_triples(keyed, "ev_id", F.lit(HAS_SUPPORTING_REF), F.lit(AEOLUS_PMID), is_literal=False, graph_id=g),
            make_triples(keyed, "ev_id", F.lit(T.SOURCE), F.lit(DRYAD_SOURCE), is_literal=False, graph_id=g),
        ]
        agent = drugs.sparkSession.createDataFrame(
            [
                (base_iri, "Monarch Initiative", ORGANIZATION),
                (AEOLUS_PMID, None, PUBLICATION),
                (DRYAD_SOURCE, DRYAD_LABEL, DATA_SET),
            ],
            "node string, label string, ntype string",
        )
        parts.append(individual_triples(agent, "node", F.col("ntype"), label_col="label", graph_id=g))
        for col, ind_type, bnode in measurements:
            parts += [
                make_triples(keyed, bnode, F.lit(T.TYPE), F.lit(ind_type), is_literal=False, graph_id=g),
                make_triples(keyed, "ev_id", F.lit(HAS_EVIDENCE_ITEM), bnode, is_literal=False, graph_id=g),
                make_triples(
                    keyed.filter(F.col(col).isNotNull()),
                    bnode, F.lit(HAS_VALUE), F.col(col).cast("string"), is_literal=True, graph_id=g,
                ),
            ]
        return union_graphs(*parts).dropDuplicates(["subject", "predicate", "object"])
