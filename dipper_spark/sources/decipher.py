"""DECIPHER/DDG2P pipeline: gene-symbol→OMIM disease models with
consequence-typed anonymous alleles.

Reference behavior: dipper/sources/Decipher.py:105-298 — the ddg2p.txt
zip scan (gencode gene symbol, inheritance mode, DDD category, consequence,
disease, omim, ddg2p id, ';'-split pubmed ids, hpo codes) resolved through
an HGNC symbol→id map; ``make_allele_by_consequence`` (240-293): localtt-
resolved consequence SO type (default sequence_variant), digest bnode over
``gene_id + type_id`` with label '<consequence> allele in <symbol>', typed
individual + allele-of-gene edge; G2D assoc with journal-article PMIDs.

NOTE the reference's row loop is DEAD CODE as shipped: the HGNC symbol map
it needs was never implemented, so an unconditional ``continue``
(Decipher.py:170-176) skips every row.  This pipeline implements the
documented intent, with the symbol map taken from a staged HGNC
``hgnc_complete_set.txt`` (the hgnc pipeline's own input).
"""

from __future__ import annotations

import io
import os
import zipfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.ids import make_id
from dipper_spark.core.vocab import TranslationTable
from dipper_spark.models import (
    association_triples,
    class_triples,
    individual_triples,
    reference_triples,
)
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

SEQUENCE_VARIANT = "SO:0001060"
IS_ALLELE_OF = "GENO:0000408"
HAS_PHENOTYPE = "RO:0002200"
JOURNAL_ARTICLE = "IAO:0000013"

_TT = TranslationTable.for_source("decipher")
#: consequence label → SO type (translationtable/decipher.yaml ∘ global)
CONSEQUENCE_TYPES = {
    k: _TT.globaltt[v] for k, v in _TT.localtt.items() if v in _TT.globaltt
}

DDG2P_COLUMNS = [
    "gencode_gene_name", "mode", "category", "consequence",
    "disease", "omim", "ddg2p_id", "pubmed_ids", "hpo_codes",
]


def _map_lit(mapping: dict[str, str], key: Column) -> Column:
    return F.element_at(F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]), key)


@register
class DecipherPipeline(SourcePipeline):
    name = "decipher"
    files = {
        "annot": FileContract(
            file="ddg2p.zip",
            url="https://decipher.sanger.ac.uk/files/downloads/ddg2p.zip",
            columns=DDG2P_COLUMNS,
        ),
        "hgnc": FileContract(
            file="hgnc_complete_set.txt",
            url="http://ftp.ebi.ac.uk/pub/databases/genenames/hgnc/tsv/hgnc_complete_set.txt",
        ),
    }
    test_ids = ["OMIM:300494"]

    def _staged_ddg2p(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """ddg2p.txt out of the zip (Decipher.py:142-147); the zip member is
        extracted to a sibling text file once, driver-side, then scanned
        distributed (zip is not a splittable container)."""
        zpath = self.path(raw_dir, "annot")
        tpath = f"{raw_dir.rstrip('/')}/ddg2p.txt"
        if not os.path.exists(tpath) and os.path.exists(zpath):
            with zipfile.ZipFile(zpath) as zf, zf.open("ddg2p.txt") as member:
                with open(tpath, "wb") as out:
                    out.write(member.read())
        from dipper_spark.io.readers import read_delim

        return read_delim(
            spark, tpath, DDG2P_COLUMNS, header=False, comment="#", src_key="annot"
        )

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        rows = self._staged_ddg2p(spark, raw_dir)
        if limit:
            rows = rows.limit(limit)
        # HGNC symbol → id map (the map Decipher.py:155-157 wished for)
        hgnc = (
            spark.read.option("sep", "\t").option("header", True)
            .csv(self.path(raw_dir, "hgnc"))
            .select(
                F.col("hgnc_id").alias("gene_id"),
                F.col("symbol").alias("gencode_gene_name"),
            )
        )
        rows = (
            rows.withColumn("gencode_gene_name", F.trim("gencode_gene_name"))
            .join(F.broadcast(hgnc), "gencode_gene_name")
            .filter(F.trim(F.coalesce("omim", F.lit(""))) != "")
            .withColumn("omim_id", F.concat(F.lit("OMIM:"), F.trim("omim")))
            .withColumn(
                "type_id",
                F.coalesce(
                    _map_lit(CONSEQUENCE_TYPES, F.col("consequence")),
                    F.lit(SEQUENCE_VARIANT),
                ),
            )
            # allele bnode digests gene+type with ':' scrubbed (Decipher.py:283-287)
            .withColumn(
                "allele_id",
                make_id(
                    F.regexp_replace(F.concat("gene_id", "type_id"), ":", ""),
                    prefix="_",
                ),
            )
            .withColumn(
                "allele_label",
                F.concat_ws(" ", "consequence", F.lit("allele in"), "gencode_gene_name"),
            )
            .withColumn(
                "source",
                F.when(
                    F.trim(F.coalesce("pubmed_ids", F.lit(""))) != "",
                    F.filter(
                        F.transform(
                            F.split("pubmed_ids", ";"),
                            lambda x: F.when(F.trim(x) != "", F.concat(F.lit("PMID:"), F.trim(x))),
                        ),
                        lambda x: x.isNotNull(),
                    ),
                ),
            )
            .withColumn("_pred", F.lit(HAS_PHENOTYPE))
        )
        rows = self.test_filter(rows, "omim_id", test_mode)
        pmids = rows.select(F.explode(F.coalesce("source", F.array())).alias("pmid")).distinct()
        return union_graphs(
            class_triples(rows.select("gene_id", "gencode_gene_name"), "gene_id",
                          label_col="gencode_gene_name", graph_id=g),
            class_triples(rows.select("omim_id"), "omim_id", graph_id=g),
            individual_triples(rows, "allele_id", F.col("type_id"), label_col="allele_label", graph_id=g),
            make_triples(rows, "allele_id", F.lit(IS_ALLELE_OF), "gene_id", is_literal=False, graph_id=g),
            reference_triples(pmids, "pmid", type_col=JOURNAL_ARTICLE, graph_id=g),
            association_triples(
                rows, "allele_id", "_pred", "omim_id",
                definedby=g, source_col="source", graph_id=g,
            ),
        ).dropDuplicates(["subject", "predicate", "object"])
