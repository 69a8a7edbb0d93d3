"""ZFIN fish-phenotype pipeline: EQ-octuple → ZP id via composite-key join.

Reference behavior: dipper/sources/ZFIN.py — ``_load_zp_mappings`` 2774-2817
(zp-mapping file: iri + 7-part hyphen-joined EQ id, implicit 'abnormal'
modifier), ``_make_zpkey`` 2818-2826 (empty parts → '0', sha1 key),
``_map_octuple_to_phenotype`` 2721-2773 (modifier resolved to PATO first),
``_process_g2p`` 1396-1520 (fish→ZP associations with stage/environment
qualifiers, ECO:0000059 evidence, ZFIN pub sources; 'normal' rows become a
comment instead of an association).

Spark-first: the reference's zp_map dict probe is a **broadcast join on a
computed composite key** (J6, operators.composite_key) — the key is the same
``'b'+sha1[1:20]`` digest so unmapped-octuple misses are observable as an
anti-join (A8 metric), not a silent None.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.ids import make_id
from dipper_spark.models import g2p_association_triples
from dipper_spark.models import terms as T
from dipper_spark.operators import composite_key
from dipper_spark.sources.base import FileContract, SourcePipeline, register

ABNORMAL = "PATO:0000460"
EXPERIMENTAL_PHENOTYPIC_EVIDENCE = "ECO:0000059"
HAS_PHENOTYPE = "RO:0002200"

#: Phenotype Tag → PATO (zfin localtt ∘ globaltt); the zp map itself is
#: built only for 'abnormal' (ZFIN.py:2800)
MODIFIER_ID = {"abnormal": ABNORMAL, "absent": "PATO:0000462", "normal": "PATO:0000461"}

OCTUPLE = [
    "subterm1_id", "postcomp1_rel_id", "superterm1_id", "quality_id",
    "subterm2_id", "postcomp2_rel_id", "superterm2_id", "mod_id",
]

PHENO_COLUMNS = [
    "Fish ID", "Fish Name", "Start Stage ID", "Start Stage Name",
    "End Stage ID", "End Stage Name",
    "Affected Structure or Process 1 subterm ID",
    "Affected Structure or Process 1 subterm Name",
    "Post-composed Relationship ID", "Post-composed Relationship Name",
    "Affected Structure or Process 1 superterm ID",
    "Affected Structure or Process 1 superterm Name",
    "Phenotype Keyword ID", "Phenotype Keyword Name", "Phenotype Tag",
    "Affected Structure or Process 2 subterm ID",
    "Affected Structure or Process 2 subterm name",
    "Post-composed Relationship (rel) ID",
    "Post-composed Relationship (rel) Name",
    "Affected Structure or Process 2 superterm ID",
    "Affected Structure or Process 2 superterm name",
    "Publication ID", "Environment ID",
]


def zp_key(cols: list[str]) -> Column:
    """_make_zpkey (ZFIN.py:2818-2826): empty → '0', '_'-join, sha1 digest."""
    padded = [F.when(F.coalesce(F.col(c), F.lit("")) == "", F.lit("0")).otherwise(F.col(c)) for c in cols]
    return make_id(composite_key(padded, sep="_"))


@register
class ZfinPipeline(SourcePipeline):
    name = "zfin"
    files = {
        "pheno": FileContract(
            file="phenotype_fish.txt",
            url="https://zfin.org/downloads/phenotype_fish.txt",
            columns=PHENO_COLUMNS,
        ),
        "zpmap": FileContract(
            file="id_map_zfin.tsv",
            url="https://raw.githubusercontent.com/obophenotype/zebrafish-phenotype-ontology/master/src/curation/id_map_zfin.tsv",
            columns=["iri", "id"],
        ),
    }
    test_ids = ["ZDB-FISH-150901-29105"]

    def zp_map(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """zp-mapping dim: composite key → zp_id (ZFIN.py:2774-2817).  The
        'id' column is 7 '-'-separated parts; 'abnormal' is appended as the
        implicit 8th."""
        zp = (
            spark.read.option("sep", "\t").option("header", True)
            .schema("iri string, id string")
            .csv(self.path(raw_dir, "zpmap"))
        )
        parts = F.split("id", "-")
        staged = zp.select(
            F.col("iri").alias("zp_id"),
            *[F.get(parts, i).alias(c) for i, c in enumerate(OCTUPLE[:7])],
            F.lit(ABNORMAL).alias("mod_id"),
        )
        return staged.select("zp_id", zp_key(OCTUPLE).alias("_zpkey"))

    def _staged_rows(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        cols = PHENO_COLUMNS
        schema = " ".join(f"`{c}` string," for c in cols).rstrip(",")
        raw = spark.read.option("sep", "\t").schema(schema).csv(self.path(raw_dir, "pheno"))
        raw = self.test_filter(raw, "Fish ID", test_mode)
        if limit:
            raw = raw.limit(limit)

        return raw.select(
            F.concat(F.lit("ZFIN:"), F.trim(F.col("Fish ID"))).alias("fish_curie"),
            F.trim(F.col("Phenotype Tag")).alias("modifier"),
            F.coalesce(F.col("Affected Structure or Process 1 subterm ID"), F.lit("")).alias("subterm1_id"),
            F.coalesce(F.col("Post-composed Relationship ID"), F.lit("")).alias("postcomp1_rel_id"),
            F.coalesce(F.col("Affected Structure or Process 1 superterm ID"), F.lit("")).alias("superterm1_id"),
            F.coalesce(F.col("Phenotype Keyword ID"), F.lit("")).alias("quality_id"),
            F.coalesce(F.col("Affected Structure or Process 2 subterm ID"), F.lit("")).alias("subterm2_id"),
            F.coalesce(F.col("Post-composed Relationship (rel) ID"), F.lit("")).alias("postcomp2_rel_id"),
            F.coalesce(F.col("Affected Structure or Process 2 superterm ID"), F.lit("")).alias("superterm2_id"),
            F.concat_ws(
                "+",
                F.col("Affected Structure or Process 1 superterm Name"),
                F.col("Affected Structure or Process 1 subterm Name"),
                F.col("Phenotype Keyword Name"),
            ).alias("eq_names"),
            F.when(F.trim(F.col("Start Stage ID")) != "", F.concat(F.lit("ZFIN:"), F.trim(F.col("Start Stage ID")))).alias("start_stage"),
            F.when(F.trim(F.col("End Stage ID")) != "", F.concat(F.lit("ZFIN:"), F.trim(F.col("End Stage ID")))).alias("end_stage"),
            F.when(F.trim(F.col("Publication ID")) != "", F.concat(F.lit("ZFIN:"), F.trim(F.col("Publication ID")))).alias("pub_id"),
        ).withColumn(
            "mod_id",
            F.coalesce(
                F.element_at(F.create_map(*[F.lit(x) for kv in MODIFIER_ID.items() for x in kv]), F.col("modifier")),
                F.col("modifier"),
            ),
        ).withColumn("_zpkey", zp_key(OCTUPLE))

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        rows = self._staged_rows(spark, raw_dir, limit=limit, test_mode=test_mode)
        zp = F.broadcast(self.zp_map(spark, raw_dir))
        mapped = rows.join(zp, "_zpkey", "left")

        abnormal = (
            mapped.filter(~F.col("modifier").startswith("normal"))
            .filter(F.col("zp_id").isNotNull())  # unmapped octuples dropped (logged as miss in ref)
            .withColumn("predicate", F.lit(HAS_PHENOTYPE))
            .withColumn("evidence", F.array(F.lit(EXPERIMENTAL_PHENOTYPIC_EVIDENCE)))
            .withColumn("source", F.when(F.col("pub_id").isNotNull(), F.array("pub_id")))
        )
        assoc = g2p_association_triples(
            abnormal, "fish_curie", "zp_id", "predicate",
            stage_col="start_stage", evidence_col="evidence", source_col="source",
            definedby=self.name, graph_id=g,
        )

        # 'normal' rows: comment on the fish, no association (ZFIN.py:1497-1516)
        normal = mapped.filter(F.col("modifier").startswith("normal")).withColumn(
            "comment",
            F.concat_ws(
                " ", F.lit("Normal phenotype observed:"), "eq_names",
                F.concat(F.lit("("), F.coalesce("pub_id", F.lit("")), F.lit(")")),
            ),
        )
        normal_triples = make_triples(
            normal, "fish_curie", F.lit(T.COMMENT), "comment", is_literal=True, graph_id=g
        )

        return union_graphs(assoc, normal_triples).dropDuplicates(
            ["subject", "predicate", "object"]
        )

    def unmapped_octuples(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """A8 miss metric: abnormal rows whose EQ octuple has no ZP mapping —
        the reference logs each miss (ZFIN.py:2755-2768); here it's an
        anti-join you can count or inspect."""
        rows = self._staged_rows(spark, raw_dir).filter(~F.col("modifier").startswith("normal"))
        return rows.join(F.broadcast(self.zp_map(spark, raw_dir)), "_zpkey", "left_anti")
