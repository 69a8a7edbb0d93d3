"""RGD pipeline: rat gene → mammalian phenotype GAF.

Reference behavior: dipper/sources/RGD.py:86-145 — GAF 2.1 scan (via
ontobio's GafParser there; a declarative GAF scan here), per-record
``make_association``: gene has-phenotype MP term, references with the
RGD→RGDRef prefix rewrite (except PMIDs), first reference becomes the
source + a typed publication node and the rest collapse onto it via
owl:sameAs, date + localtt-resolved ECO evidence on the association.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import union_graphs
from dipper_spark.core.vocab import TranslationTable
from dipper_spark.models import (
    association_triples,
    pairwise_triples,
    reference_triples,
)
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

HAS_PHENOTYPE = "RO:0002200"
PUBLICATION = "IAO:0000311"

_TT = TranslationTable.for_source("rgd")
#: GAF evidence symbol → ECO (translationtable/rgd.yaml ∘ GLOBAL_TERMS)
RGD_ECO = {
    code: _TT.globaltt[label]
    for code, label in _TT.localtt.items()
    if label in _TT.globaltt
}


def _map_lit(mapping: dict[str, str], key: Column) -> Column:
    return F.element_at(F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]), key)


@register
class RgdPipeline(SourcePipeline):
    name = "rgd"
    files = {
        "rat_gene2mammalian_phenotype": FileContract(
            file="rattus_genes_mp",
            url="ftp://ftp.rgd.mcw.edu/pub/data_release/annotated_rgd_objects_by_ontology/rattus_genes_mp",
        ),
    }
    test_ids = ["RGD:61958", "RGD:70891"]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        from dipper_spark.io.readers import read_gaf

        g = self.name
        gaf = read_gaf(
            spark, self.path(raw_dir, "rat_gene2mammalian_phenotype"), limit=limit
        )
        rows = (
            gaf.filter(F.col("Qualifier") != "NOT")
            .select(
                F.concat_ws(":", "DB", "DB_Object_ID").alias("gene_id"),
                F.col("GO_ID").alias("phenotype_id"),
                F.col("Date").alias("date"),
                _map_lit(RGD_ECO, F.trim("Evidence_Code")).alias("eco_id"),
                # RGD refs route through the RGDRef prefix; PMIDs stay
                # (RGD.py:120-122)
                F.filter(
                    F.transform(
                        "refs",
                        lambda x: F.when(
                            x.contains("PMID"), x
                        ).otherwise(F.regexp_replace(x, "^RGD", "RGDRef")),
                    ),
                    lambda x: x != "",
                ).alias("references"),
            )
            .withColumn("evidence", F.when(F.col("eco_id").isNotNull(), F.array("eco_id")))
            # F.get (0-based) is null-safe on empty arrays under ANSI mode
            .withColumn("first_ref", F.get("references", 0))
            .withColumn("source", F.when(F.col("first_ref").isNotNull(), F.array("first_ref")))
            .withColumn("_pred", F.lit(HAS_PHENOTYPE))
        )
        rows = self.test_filter(rows, "gene_id", test_mode)
        other_refs = rows.select(
            "first_ref", F.explode("references").alias("ref")
        ).filter(F.col("ref") != F.col("first_ref"))
        return union_graphs(
            association_triples(
                rows, "gene_id", "_pred", "phenotype_id",
                definedby=g, evidence_col="evidence", source_col="source",
                date_col="date", graph_id=g,
            ),
            reference_triples(
                rows.filter(F.col("first_ref").isNotNull())
                .select("first_ref").distinct(),
                "first_ref", type_col=PUBLICATION, graph_id=g,
            ),
            # later refs in the list collapse onto the first (RGD.py:133-138)
            pairwise_triples(other_refs, "first_ref", "ref", T.SAME_AS, graph_id=g),
        ).dropDuplicates(["subject", "predicate", "object"])
