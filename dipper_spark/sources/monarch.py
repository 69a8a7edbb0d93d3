"""Monarch curation pipeline: OMIA disease→phenotype annotation files.

Reference behavior: dipper/sources/Monarch.py:95-202
(``process_omia_phenotypes``): every ``*.txt`` under
``raw/OMIA-disease-phenotype/`` is a tab file of curated D2P rows; disease
id = zero-padded OMIA number, species-qualified when a species id is
present; pubmed ids split on [,;] with non-digits scrubbed become sources,
else the OMIA web url + species; per-assoc descriptions (pub desc, breed
'[observed in]', assay '[assay]') and curator-note comments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.curie import CurieMap
from dipper_spark.models import d2p_association_triples
from dipper_spark.models import terms as T
from dipper_spark.models.assoc import with_assoc_id
from dipper_spark.sources.base import FileContract, SourcePipeline, register

HAS_PHENOTYPE = "RO:0002200"

OMIA_D2P_COLUMNS = [
    "Disease ID", "Species ID", "Breed Name", "Variant", "Inheritance",
    "Phenotype ID", "Phenotype Name", "Entity ID", "Entity Name",
    "Quality ID", "Quality Name", "Related Entity ID", "Related Entity Name",
    "Abnormal ID", "Abnormal Name", "Phenotype Desc", "Assay", "Frequency",
    "Pubmed ID", "Pub Desc", "Curator Notes", "Date Created",
]


@register
class MonarchPipeline(SourcePipeline):
    name = "monarch"
    files = {
        "omia_d2p": FileContract(
            file="OMIA-disease-phenotype", url=None, columns=OMIA_D2P_COLUMNS,
        ),
    }
    test_ids = ["OMIA:000060"]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        from dipper_spark.io.readers import read_delim

        g = self.name
        omia_base = CurieMap().mapping["OMIA"]
        rows = read_delim(
            spark, f"{self.path(raw_dir, 'omia_d2p')}/*.txt", OMIA_D2P_COLUMNS,
            header=True, src_key="omia_d2p", limit=limit,
        ).select(
            F.lpad(F.trim(F.col("Disease ID")), 6, "0").alias("disease_num"),
            F.trim(F.col("Species ID")).alias("species_id"),
            F.trim(F.col("Phenotype ID")).alias("phenotype_id"),
            F.trim(F.col("Pubmed ID")).alias("pubmed_ids"),
            F.trim(F.col("Pub Desc")).alias("pub_desc"),
            F.trim(F.col("Breed Name")).alias("breed_name"),
            F.trim(F.col("Assay")).alias("assay"),
            F.trim(F.col("Curator Notes")).alias("curator_notes"),
        ).filter(F.col("phenotype_id") != "")
        rows = rows.withColumn(
            "disease_id",
            F.when(
                F.col("species_id") != "",
                F.concat(F.lit("OMIA:"), "disease_num", F.lit("-"), "species_id"),
            ).otherwise(F.concat(F.lit("OMIA:"), "disease_num")),
        )
        rows = self.test_filter(
            rows.withColumn("omia_curie", F.concat(F.lit("OMIA:"), "disease_num")),
            "omia_curie", test_mode,
        )
        # sources: scrubbed pmids, else the OMIA page url + species
        rows = rows.withColumn(
            "source",
            F.when(
                F.col("pubmed_ids") != "",
                F.filter(
                    F.transform(
                        F.split("pubmed_ids", "[,;]"),
                        lambda x: F.concat(F.lit("PMID:"), F.regexp_replace(x, "[^0-9]", "")),
                    ),
                    lambda x: x != "PMID:",
                ),
            ).otherwise(
                F.array(
                    F.concat_ws("/", F.concat(F.lit(omia_base), "disease_num"), "species_id")
                )
            ),
        ).withColumn("_pred", F.lit(HAS_PHENOTYPE))

        assoc = d2p_association_triples(
            rows, "disease_id", "phenotype_id", F.lit(HAS_PHENOTYPE),
            source_col="source", definedby=g, graph_id=g,
        )
        keyed = with_assoc_id(rows, "disease_id", "_pred", "phenotype_id", definedby=g)
        annotations = [
            (F.col("pub_desc"), F.col("pub_desc"), T.DESCRIPTION),
            (
                F.col("breed_name"),
                F.concat("breed_name", F.lit(" [observed in]")),
                T.DESCRIPTION,
            ),
            (F.col("assay"), F.concat("assay", F.lit(" [assay]")), T.DESCRIPTION),
            (F.col("curator_notes"), F.col("curator_notes"), T.COMMENT),
        ]
        extras = [
            make_triples(
                keyed.filter(guard != "").withColumn("_v", value),
                "assoc_id", F.lit(pred), "_v", is_literal=True, graph_id=g,
            )
            for guard, value, pred in annotations
        ]
        return union_graphs(assoc, *extras).dropDuplicates(["subject", "predicate", "object"])
