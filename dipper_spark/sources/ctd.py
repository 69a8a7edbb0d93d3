"""CTD chemical→disease pipeline.

Reference: dipper/sources/CTD.py — ``_process_interactions`` (CTD.py:273-311,
chem/disease rows), evidence filter ``^therapeutic|marker/mechanism$``
(CTD.py:294), MESH prefixing, localtt resolve (translationtable/ctd.yaml:3-4 →
RO:0002606/RO:0002607), reified association + per-pub evidence/source
(``_make_association`` CTD.py:425-462), pubmed splitting
(``_process_pubmed_ids`` CTD.py:464-480).  This is the reference's first
golden test (tests/test_ctd.py:18-63) — the M1 correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import TranslationTable, make_triples, union_graphs
from dipper_spark.models import class_triples, g2p_association_triples
from dipper_spark.models.assoc import with_assoc_id
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

CTD_TT = TranslationTable(
    globaltt={
        "is substance that treats": "RO:0002606",
        "is marker for": "RO:0002607",
    },
    localtt={
        "therapeutic": "is substance that treats",
        "marker/mechanism": "is marker for",
    },
)

JOURNAL_ARTICLE = "IAO:0000013"
TAS_EVIDENCE = "ECO:0000033"  # globaltt['traceable author statement']


@register
class CtdPipeline(SourcePipeline):
    name = "ctd"
    files = {
        "chemical_disease": FileContract(
            file="CTD_chemicals_diseases.tsv.gz",
            url="http://ctdbase.org/reports/CTD_chemicals_diseases.tsv.gz",
            # reference contract: CTD.py:62-77
            columns=[
                "ChemicalName", "ChemicalID", "CasRN", "DiseaseName", "DiseaseID",
                "DirectEvidence", "InferenceGeneSymbol", "InferenceScore",
                "OmimIDs", "PubMedIDs",
            ],
        ),
    }
    test_ids = ["MESH:D009538", "OMIM:188890", "MESH:D004827"]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        from dipper_spark.io import read_delim

        g = self.name
        cols = self.files["chemical_disease"].columns
        df = read_delim(
            spark, self.path(raw_dir, "chemical_disease"), cols,
            header=False, comment="#", src_key=self.name, limit=limit,
        )

        rows = (
            # evidence-class filter (P3): CTD.py:294-296
            df.filter(F.col("DirectEvidence").rlike(r"^therapeutic|marker/mechanism$"))
            .select(
                F.concat(F.lit("MESH:"), F.col("ChemicalID")).alias("chem_id"),
                F.col("ChemicalName").alias("chem_name"),
                F.col("DiseaseID").alias("disease_id"),
                CTD_TT.resolve("DirectEvidence").alias("predicate"),
                F.col("PubMedIDs").alias("pubmed_ids"),
            )
        )
        rows = self.test_filter(rows, "disease_id", test_mode)

        # definedby is the SOURCE name in the id digest (reference passes
        # self.name, giving the golden's MONARCH:b6c289df... id)
        assoc = g2p_association_triples(
            rows, "chem_id", "disease_id", "predicate", definedby=g, graph_id=g,
        )
        keyed = with_assoc_id(rows, "chem_id", "predicate", "disease_id", definedby=g)

        # PMID explode (CTD.py:464-480) → evidence + source + ref typing per
        # pub (CTD.py:448-461)
        pubs = (
            keyed.filter(F.col("pubmed_ids").isNotNull() & (F.col("pubmed_ids") != ""))
            .select("assoc_id", F.explode(F.split("pubmed_ids", r"\|")).alias("pmid"))
            .withColumn("pmid", F.concat(F.lit("PMID:"), F.col("pmid")))
        )
        pub_triples = union_graphs(
            make_triples(pubs, "assoc_id", F.lit(T.SOURCE), "pmid", is_literal=False, graph_id=g),
            make_triples(pubs, "assoc_id", F.lit(T.HAS_EVIDENCE), F.lit(TAS_EVIDENCE), graph_id=g),
            make_triples(pubs, "pmid", F.lit(T.TYPE), F.lit(JOURNAL_ARTICLE), graph_id=g),
        )

        classes = union_graphs(
            class_triples(
                rows.select(F.col("chem_id").alias("id"), F.col("chem_name").alias("label")),
                "id", "label", graph_id=g,
            ),
            class_triples(rows.select(F.col("disease_id").alias("id")), "id", graph_id=g),
        )

        return union_graphs(assoc, pub_triples, classes).dropDuplicates(
            ["subject", "predicate", "object"]
        )
