"""Bgee gene→anatomy expression pipeline (M3): top-k per group window.

Reference: dipper/sources/Bgee.py — anat_entity scan 181-210 (pandas
``sort_values('rank score', desc).groupby(gene).head(limit)``, default 20 at
199-200), association emission 215-231 (``expressed in`` RO:0002206 +
has_quantifier xsd:float rank; thousands-separator scrub at 225).

Spark shape: the pandas sort+group+head is the classic W1 window —
``row_number() over (partition by gene order by rank desc) <= k``.  At scale
the window shuffles once on gene_id; no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models.assoc import association_triples, with_assoc_id
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

GENE = "SO:0000704"
EXPRESSED_IN = "RO:0002206"
HAS_QUANTIFIER = ":has_quantifier"

ANAT_COLUMNS = [
    "Ensembl gene ID", "gene name", "anatomical entity ID",
    "anatomical entity name", "rank score", "XRefs to BTO",
]


@register
class BgeePipeline(SourcePipeline):
    name = "bgee"
    files = {
        "anat_entity": FileContract(
            file="*_anat_entity_all_data.tsv.gz",
            url="ftp://ftp.bgee.org/current/download/ranks/anat_entity/",
            columns=ANAT_COLUMNS,
        ),
    }
    top_k = 20  # Bgee.py:199-200 default limit; Jenkins runs --limit 20

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        from dipper_spark.io import read_delim

        g = self.name
        k = limit or self.top_k
        df = read_delim(
            spark, self.path(raw_dir, "anat_entity"), ANAT_COLUMNS, src_key=self.name
        )

        ranked = (
            df.select(
                F.concat(F.lit("ENSEMBL:"), F.trim(F.col("Ensembl gene ID"))).alias("gene_id"),
                F.trim(F.col("anatomical entity ID")).alias("anatomy_id"),
                # ',' thousands separators scrubbed (Bgee.py:225)
                F.regexp_replace(F.col("rank score"), ",", "").cast("float").alias("rank"),
            )
            .withColumn(
                "rn",
                F.row_number().over(Window.partitionBy("gene_id").orderBy(F.desc("rank"))),
            )
            .filter(F.col("rn") <= k)
            .withColumn("predicate", F.lit(EXPRESSED_IN))
        )

        # definedby is the SOURCE name in the id digest (Assoc(self.graph,
        # self.name), Bgee.py:220)
        assoc = association_triples(
            ranked, "gene_id", "predicate", "anatomy_id", definedby=g, graph_id=g
        )
        keyed = with_assoc_id(ranked, "gene_id", "predicate", "anatomy_id", definedby=g)
        quantifier = make_triples(
            keyed, "assoc_id", F.lit(HAS_QUANTIFIER), F.col("rank").cast("string"),
            is_literal=True, datatype="xsd:float", graph_id=g,
        )
        gene_type = make_triples(ranked, "gene_id", F.lit(T.TYPE), F.lit(GENE), graph_id=g)

        return union_graphs(assoc, quantifier, gene_type).dropDuplicates(
            ["subject", "predicate", "object"]
        )
