"""OMIM pipeline: mimTitles typing/replacement + morbidmap G2D associations.

Reference behavior: dipper/sources/OMIMSource.py:160-236 (mimTitles prefix →
entry type, Caret → obsolete + MOVED-TO replacement extraction with the two
malformed-id repairs) and dipper/sources/OMIM.py:513-708
(``_process_morbidmap``: disorder-string regex split, [ ] / { } / ?
relationship dispatch, phene-key → ECO evidence, anonymous features for
unmapped genomic loci, reified G2D associations).

The reference builds omim_type/omim_replaced as driver dicts consumed by
every other source; here both are plain DataFrames (joinable dims — at scale
other pipelines broadcast them instead of re-deriving).  The API-backed rich
entries (OMIM.py:144-267) are a staged-landing-zone concern; morbidmap +
mimTitles carry the graph semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import association_triples, class_triples, deprecation_triples
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

GENE = "SO:0000704"
OBSOLETE = "HP:0031859"
SUSPECTED = "NCIT:C71458"
PHENOTYPE = "UPHENO:0001001"
HERITABLE_MARKER = "SO:0001500"
HAS_AFFECTED_FEATURE = "GENO:0000418"
CAUSES_CONDITION = "RO:0003303"
IS_MARKER_FOR = "RO:0002607"
CONTRIBUTES_TO = "RO:0002326"

#: Prefix → type curie (OMIMSource.py:192-232 dispatch)
PREFIX_TYPE = {
    "Asterisk": GENE,
    "NULL": SUSPECTED,
    "": SUSPECTED,
    "Number Sign": PHENOTYPE,
    "Percent": HERITABLE_MARKER,
    "Plus": HAS_AFFECTED_FEATURE,
    "Caret": OBSOLETE,
}
#: phene key → ECO (translationtable/omim.yaml ∘ GLOBAL_TERMS.yaml)
PHENE_ECO = {
    "1": "ECO:0000306",
    "2": "ECO:0000177",
    "3": "ECO:0000220",
    "4": "ECO:0000220",
}

DISORDER_RE = r"(.*), (\d{6})\s*(?:\((\d+)\))?"  # OMIM.py:115
NOGENE_RE = r"(.*)\s+\((\d+)\)"                   # OMIM.py:116


def _map_lit(mapping: dict[str, str], key: Column) -> Column:
    return F.element_at(F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]), key)


@register
class OmimPipeline(SourcePipeline):
    name = "omim"
    files = {
        "mimtitles": FileContract(
            file="mimTitles.txt",
            url="https://omim.org/static/omim/data/mimTitles.txt",
            columns=["Prefix", "MIM Number", "Preferred Title; symbol",
                     "Alternative Title(s); symbol(s)", "Included Title(s); symbols"],
        ),
        "morbidmap": FileContract(
            file="morbidmap.txt",
            url="https://data.omim.org/downloads/morbidmap.txt",
            columns=["# Phenotype", "Gene Symbols", "MIM Number", "Cyto Location"],
        ),
    }
    test_ids = ["104000", "273750", "609577"]

    def _read(self, spark: SparkSession, raw_dir: str, key: str) -> DataFrame:
        cols = self.files[key].columns
        schema = " ".join(f"`{c}` string," for c in cols).rstrip(",")
        df = spark.read.option("sep", "\t").schema(schema).csv(self.path(raw_dir, key))
        # copyright/date/header preamble + trailing comments all start '#'
        first = cols[0]
        return df.filter(~F.coalesce(F.col(first), F.lit("#")).startswith("#") | (F.lit(first) == "# Phenotype"))

    def mim_types(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """omim_num → (type curie, label, replacements[]) — the relational
        form of OMIMSource's omim_type/omim_replaced dicts."""
        t = self._read(spark, raw_dir, "mimtitles").filter(
            ~F.coalesce(F.col("Prefix"), F.lit("")).startswith("#")
        )
        moved = F.col("Preferred Title; symbol").startswith("MOVED TO ")
        # F.get (not getItem): ANSI mode raises on out-of-bounds indexes
        rep1 = F.get(F.split(F.col("Preferred Title; symbol"), " "), 2)
        # malformed-replacement repairs (OMIMSource.py:205-214):
        # '{123456}' → '123456'; '123456,' → '123456'
        rep1 = F.regexp_replace(rep1, r"^\{(\d{6})\}$", "$1")
        rep1 = F.regexp_replace(rep1, r"^(\d{6}),$", "$1")
        rep2 = F.get(F.split(F.col("Preferred Title; symbol"), " "), 4)
        return t.select(
            F.trim(F.col("MIM Number")).alias("omim_num"),
            F.coalesce(_map_lit(PREFIX_TYPE, F.trim("Prefix")), F.lit(SUSPECTED)).alias("omim_type"),
            F.col("Preferred Title; symbol").alias("pref_label"),
            F.when(
                (F.trim("Prefix") == "Caret") & moved,
                F.filter(F.array(rep1, rep2), lambda x: x.isNotNull() & x.rlike("^[0-9]{6}$")),
            ).alias("replaced_by"),
        )

    def _title_triples(self, types: DataFrame, g: str) -> list[DataFrame]:
        live = types.filter(F.col("omim_type") != OBSOLETE).withColumn(
            "omim_curie", F.concat(F.lit("OMIM:"), F.col("omim_num"))
        )
        # abbrev after ';' becomes the node label for genes (OMIM.py:339-372)
        live = live.withColumn(
            "abbrev", F.when(F.col("pref_label").contains(";"), F.trim(F.split("pref_label", ";").getItem(1)))
        ).withColumn(
            "label",
            F.when((F.col("omim_type") == GENE) & F.col("abbrev").isNotNull(), F.col("abbrev"))
            .otherwise(F.trim(F.split("pref_label", ";").getItem(0))),
        )
        dead = (
            types.filter(F.col("omim_type") == OBSOLETE)
            .withColumn("omim_curie", F.concat(F.lit("OMIM:"), F.col("omim_num")))
            .withColumn(
                "rep",
                F.when(
                    F.size(F.coalesce("replaced_by", F.array())) > 0,
                    F.transform("replaced_by", lambda x: F.concat(F.lit("OMIM:"), x)),
                ),
            )
            # F.get (0-based) returns NULL out-of-bounds; element_at raises
            # under ANSI mode when the replaced-by list is empty
            .withColumn("rep1", F.get(F.coalesce("rep", F.array()), F.lit(0)))
        )
        return [
            class_triples(live, "omim_curie", "label", graph_id=g),
            # genes get SO typing; the full title is kept as an exact synonym
            make_triples(
                live.filter(F.col("omim_type").isin(GENE, HAS_AFFECTED_FEATURE)),
                "omim_curie", F.lit(T.TYPE), F.lit(GENE), graph_id=g,
            ),
            make_triples(live, "omim_curie", F.lit(T.HAS_EXACT_SYNONYM), "pref_label", is_literal=True, graph_id=g),
            deprecation_triples(dead, "omim_curie", replaced_by_col="rep1", graph_id=g),
        ]

    def _morbidmap_triples(self, spark: SparkSession, raw_dir: str, g: str, test_mode: bool) -> list[DataFrame]:
        mm = self._read(spark, raw_dir, "morbidmap").filter(F.col("# Phenotype").isNotNull())
        mm = mm.filter(F.col("# Phenotype") != "# Phenotype")  # header row
        rows = (
            mm.select(
                F.col("# Phenotype").alias("disorder"),
                F.trim(F.col("MIM Number")).alias("gene_num"),
            )
            .withColumn("d_label", F.regexp_extract("disorder", DISORDER_RE, 1))
            .withColumn("d_num", F.regexp_extract("disorder", DISORDER_RE, 2))
            .withColumn("d_key", F.regexp_extract("disorder", DISORDER_RE, 3))
            # rows without an embedded disorder MIM: the gene column IS the
            # disorder; an anonymous feature houses the locus (OMIM.py:594-620)
            .withColumn("ng_label", F.regexp_extract("disorder", NOGENE_RE, 1))
            .withColumn("ng_key", F.regexp_extract("disorder", NOGENE_RE, 2))
        )
        matched = rows.filter(F.col("d_num") != "").select(
            F.concat(F.lit("OMIM:"), F.col("gene_num")).alias("gene_id"),
            F.col("d_num").alias("disorder_num"),
            F.col("d_label").alias("disorder_label"),
            F.col("d_key").alias("phene_key"),
        )
        nogene = rows.filter((F.col("d_num") == "") & (F.col("ng_label") != "")).select(
            F.concat(F.lit("_:feature"), F.col("gene_num")).alias("gene_id"),
            F.col("gene_num").alias("disorder_num"),
            F.col("ng_label").alias("disorder_label"),
            F.col("ng_key").alias("phene_key"),
        )
        assoc_rows = (
            matched.unionByName(nogene)
            .withColumn("disorder_id", F.concat(F.lit("OMIM:"), F.col("disorder_num")))
            # [ ]=nondisease marker, { }=susceptibility, ?=provisional
            # (OMIM.py:680-689)
            .withColumn(
                "predicate",
                F.when(F.col("disorder_label").startswith("["), F.lit(IS_MARKER_FOR))
                .when(F.col("disorder_label").startswith("{"), F.lit(CONTRIBUTES_TO))
                .when(F.col("disorder_label").startswith("?"), F.lit(CONTRIBUTES_TO))
                .otherwise(F.lit(CAUSES_CONDITION)),
            )
            .withColumn("eco", _map_lit(PHENE_ECO, F.col("phene_key")))
            .withColumn("evidence", F.when(F.col("eco").isNotNull(), F.array("eco")))
        )
        if test_mode:
            assoc_rows = assoc_rows.filter(
                F.col("disorder_num").isin(list(self.test_ids))
                | F.regexp_replace("gene_id", "OMIM:", "").isin(list(self.test_ids))
            )
        return [
            association_triples(
                assoc_rows, "gene_id", "predicate", "disorder_id",
                evidence_col="evidence", definedby=self.name, graph_id=g,
            ),
        ]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        types = self.mim_types(spark, raw_dir)
        if test_mode:
            types = types.filter(F.col("omim_num").isin(list(self.test_ids)))
        if limit:
            types = types.limit(limit)
        parts = self._title_triples(types, g) + self._morbidmap_triples(
            spark, raw_dir, g, test_mode
        )
        return union_graphs(*parts).dropDuplicates(["subject", "predicate", "object"])
