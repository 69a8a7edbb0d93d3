"""MPD (Mouse Phenome Database) strain-means pipeline: z-score thresholding.

Reference: dipper/sources/MPD.py — strainmeans scan + per-(measure,sex) mean
collection (``_process_strainmeans_file`` 326-388, A6), |zscore| >= 2
threshold deciding 'abnormal' phenotype associations
(``_fill_provenance_graph`` 390-455, threshold at 416-418, P4), effect
direction from the z sign.

Spark shape: the reference collects all means into dicts then thresholds;
since the published zscore column already encodes the deviation, the whole
A6 pass is a filter — and the recomputed z (for audit) is one window over
(measnum, sex): ``(mean - avg(mean)) / stddev(mean)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models.assoc import association_triples, with_assoc_id
from dipper_spark.sources.base import FileContract, SourcePipeline, register

HAS_PHENOTYPE = "RO:0002200"
SCORE = "SIO:000300"

MPD_COLUMNS = [
    "measnum", "varname", "strain", "strainid", "sex", "mean", "nmice", "sd",
    "sem", "cv", "minval", "maxval", "zscore",
]


@register
class MpdPipeline(SourcePipeline):
    name = "mpd"
    files = {
        "strainmeans": FileContract(
            file="strainmeans.csv.gz",
            url="https://phenome.jax.org/download/strainmeans.csv.gz",
            columns=MPD_COLUMNS,
        ),
    }
    z_threshold = 2.0  # MPD.py:416-418

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        from dipper_spark.io import read_delim

        g = self.name
        df = read_delim(
            spark, self.path(raw_dir, "strainmeans"), MPD_COLUMNS, sep=",",
            src_key=self.name, limit=limit,
        )
        rows = (
            df.select(
                F.concat(F.lit("MPD-strain:"), F.col("strainid")).alias("strain_id"),
                F.col("strain").alias("strain_label"),
                F.concat(F.lit("MPD-assay:"), F.col("measnum")).alias("assay_id"),
                F.col("sex"),
                F.col("mean").cast("double").alias("mean"),
                F.col("zscore").cast("double").alias("zscore"),
            )
            .filter(F.col("zscore").isNotNull())
            .filter(F.abs(F.col("zscore")) >= self.z_threshold)
            .withColumn("predicate", F.lit(HAS_PHENOTYPE))
        )

        assoc = association_triples(rows, "strain_id", "predicate", "assay_id", graph_id=g)
        keyed = with_assoc_id(rows, "strain_id", "predicate", "assay_id")
        scores = make_triples(
            keyed, "assoc_id", F.lit(SCORE), F.col("zscore").cast("string"),
            is_literal=True, datatype="xsd:float", graph_id=g,
        )
        labels = make_triples(
            rows, "strain_id", F.lit("rdfs:label"), "strain_label", is_literal=True, graph_id=g
        )
        return union_graphs(assoc, scores, labels).dropDuplicates(
            ["subject", "predicate", "object"]
        )

    def recomputed_zscores(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """Audit variant of A6: z recomputed from the group mean/stddev over
        (measnum, sex) — one window, no collect."""
        from dipper_spark.io import read_delim

        df = read_delim(
            spark, self.path(raw_dir, "strainmeans"), MPD_COLUMNS, sep=",", src_key=self.name
        )
        w = Window.partitionBy("measnum", "sex")
        m = F.col("mean").cast("double")
        return df.select(
            "measnum", "sex", "strainid", m.alias("mean"),
            ((m - F.avg(m).over(w)) / F.stddev_samp(m).over(w)).alias("z_recomputed"),
            F.col("zscore").cast("double").alias("z_published"),
        )
