"""MGI multi-table star-join pipeline (M4).

Reference: dipper/sources/MGI.py — 19 staged Postgres exports
(MGI.py:52-133), five "build" passes populating ``idhash`` dims
(internal int key → public MGI id; build order MGI.parse 401-446, whose
comment says it outright: *"this allows us to do the 'joining' on the fly"*,
MGI.py:308-313), then probe passes that join facts against those dims:
genotype backgrounds (545-560), alleles→markers (720-850, is_allele_of
GENO:0000408 at 841-846), allele pairs w/ zygosity (960-1030), G2P/disease
annotations (1190-1260), marker locations (mrk_location_cache).

Spark shape (J1): each idhash is a dim DataFrame broadcast into the probe
joins — the literal star-join DAG the reference hand-schedules.  Build order
disappears: Catalyst resolves the DAG; at 100 TB the dims stay broadcast
(bounded by entity counts) and only facts shuffle — here they don't even do
that, since every join is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import class_triples, feature_triples, g2p_association_triples
from dipper_spark.models.assoc import association_triples, with_assoc_id
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

INTRINSIC_GENOTYPE = "GENO:0000000"
GENOMIC_BACKGROUND = "GENO:0000611"
HAS_REFERENCE_PART = "GENO:0000385"
HAS_VARIANT_PART = "GENO:0000382"
HAS_ZYGOSITY = "GENO:0000608"
IS_ALLELE_OF = "GENO:0000408"
VARIANT_LOCUS = "GENO:0000002"
IS_MODEL_OF = "RO:0003301"
ALLELE = "GENO:0000512"

#: allelestate → zygosity (MGI.py:985-1010 elif chain)
ZYGOSITY = {
    "Homozygous": "GENO:0000136",
    "Heterozygous": "GENO:0000135",
    "Hemizygous": "GENO:0000134",
    "Hemizygous Insertion": "GENO:0000134",
    "Hemizygous X-linked": "GENO:0000134",
    "Hemizygous Y-linked": "GENO:0000134",
    "Indeterminate": "GENO:0000137",
}
#: MGI evidence codes → ECO (translationtable/mgi.yaml:3-20 composed with
#: GLOBAL_TERMS — the reference-exact table; notably EXP → ECO:0000006
#: 'experimental evidence', not the GO-style ECO:0000269)
EVIDENCE_ECO = {
    "EXP": "ECO:0000006", "IBA": "ECO:0000318", "IC": "ECO:0000001",
    "IDA": "ECO:0000314", "IEA": "ECO:0000501", "IEP": "ECO:0000008",
    "IGI": "ECO:0000316", "IKR": "ECO:0000320", "IMP": "ECO:0000315",
    "IPI": "ECO:0000353", "ISA": "ECO:0000200", "ISM": "ECO:0000202",
    "ISO": "ECO:0000201", "ISS": "ECO:0000250", "NAS": "ECO:0000303",
    "ND": "ECO:0000035", "RCA": "ECO:0000245", "TAS": "ECO:0000304",
}
#: MP-Sex-Specificity qualifier values (mgi.yaml:22-23 ∘ GLOBAL_TERMS)
SEX_SPECIFICITY = {"M": "PATO:0000384", "F": "PATO:0000383"}
#: Model._addSexSpecificity's bespoke predicate (GLOBAL_TERMS.yaml:18)
HAS_SEX_SPECIFICITY = ":has_sex_specificity"
DOCUMENT = "IAO:0000310"  # Reference.addRefToGraph default ref type
DO_NOT_QUALIFIER_KEY = "1614157"  # MGI.py:1234-1236 'skip NOT annotations'


def _contract(file: str, columns: list[str]) -> FileContract:
    return FileContract(file=file, url="jdbc:postgresql://mgi-adhoc.jax.org/mgd", columns=columns)


@register
class MgiPipeline(SourcePipeline):
    """Star-join over the staged MGI table exports (TSVs with headers, the
    shape PostgreSQLSource lands, dipper/sources/PostgreSQLSource.py:49-104)."""

    name = "mgi"
    files = {
        "gxd_genotype_summary_view": _contract(
            "gxd_genotype_summary_view.tsv",
            ["_object_key", "preferred", "mgiid", "subtype", "short_description"],
        ),
        "all_summary_view": _contract(
            "all_summary_view.tsv",
            ["_object_key", "preferred", "mgiid", "description", "short_description"],
        ),
        "mrk_acc_view": _contract(
            "mrk_acc_view.tsv",
            ["accid", "prefixpart", "_logicaldb_key", "_object_key", "preferred", "_organism_key"],
        ),
        "prb_strain_acc_view": _contract(
            "prb_strain_acc_view.tsv",
            ["accid", "prefixpart", "_logicaldb_key", "_object_key", "preferred"],
        ),
        "bib_acc_view": _contract(
            "bib_acc_view.tsv",
            ["accid", "prefixpart", "numericpart", "_object_key", "logicaldb", "_logicaldb_key"],
        ),
        "gxd_genotype_view": _contract(
            "gxd_genotype_view.tsv",
            ["_genotype_key", "_strain_key", "strain", "mgiid"],
        ),
        "all_allele_view": _contract(
            "all_allele_view.tsv",
            ["_allele_key", "_marker_key", "_strain_key", "symbol", "name", "iswildtype"],
        ),
        "gxd_allelepair_view": _contract(
            "gxd_allelepair_view.tsv",
            ["_allelepair_key", "_genotype_key", "_allele_key_1", "_allele_key_2",
             "allele1", "allele2", "allelestate"],
        ),
        "voc_annot_view": _contract(
            "voc_annot_view.tsv",
            ["_annot_key", "annottype", "_object_key", "_term_key", "_qualifier_key",
             "qualifier", "term", "accid"],
        ),
        "evidence_view": _contract(
            "evidence_view.tsv",
            ["_annotevidence_key", "_annot_key", "evidencecode", "jnumid", "term",
             "value", "annottype"],
        ),
        "mrk_location_cache": _contract(
            "mrk_location_cache.tsv",
            ["_marker_key", "_organism_key", "chromosome", "startcoordinate",
             "endcoordinate", "strand", "version"],
        ),
    }

    #: opt-in skew guard for the star probes (round-11 verdict item #5):
    #: False = the plain broadcast joins (dims are dict-sized, the correct
    #: default); True = every probe runs the q_key_skew straggler
    #: prediction and switches to the salted skew_join only when a fact
    #: key (a hub genotype/marker, the MGI.py:308-313 probe-dict shape)
    #: trips the threshold.  Output identical either way (pytest-pinned).
    guard_skew: bool = False

    def _read(self, spark: SparkSession, raw_dir: str, key: str) -> DataFrame:
        from dipper_spark.io import read_delim

        return read_delim(spark, self.path(raw_dir, key), self.files[key].columns, src_key=key)

    def _probe(self, fact: DataFrame, dim: DataFrame, on: str, how: str = "inner") -> DataFrame:
        """One star probe: broadcast dict-lookup by default, guarded salted
        join when ``guard_skew`` is set (see broadcast_lookup)."""
        from dipper_spark.operators.joins import broadcast_lookup

        return broadcast_lookup(fact, dim, on, how, guard=self.guard_skew)

    # ---- build passes: idhash dims (MGI.parse 401-446) -------------------

    def genotype_dim(self, spark, raw_dir) -> DataFrame:
        return (
            self._read(spark, raw_dir, "gxd_genotype_summary_view")
            .filter(F.col("preferred") == "1")
            .select(F.col("_object_key").alias("_genotype_key"), F.col("mgiid").alias("genotype_id"))
        )

    def allele_dim(self, spark, raw_dir) -> DataFrame:
        return (
            self._read(spark, raw_dir, "all_summary_view")
            .filter(F.col("preferred") == "1")
            .select(F.col("_object_key").alias("_allele_key"), F.col("mgiid").alias("allele_id"))
        )

    def marker_dim(self, spark, raw_dir) -> DataFrame:
        return (
            self._read(spark, raw_dir, "mrk_acc_view")
            .filter(
                (F.col("preferred") == "1")
                & (F.col("prefixpart") == "MGI:")
                & (F.col("_logicaldb_key") == "1")
            )
            .select(F.col("_object_key").alias("_marker_key"), F.col("accid").alias("marker_id"))
        )

    def strain_dim(self, spark, raw_dir) -> DataFrame:
        return (
            self._read(spark, raw_dir, "prb_strain_acc_view")
            .filter((F.col("preferred") == "1") & (F.col("_logicaldb_key") == "1"))
            .select(F.col("_object_key").alias("_strain_key"), F.col("accid").alias("strain_id"))
        )

    def pub_dim(self, spark, raw_dir) -> DataFrame:
        return (
            self._read(spark, raw_dir, "bib_acc_view")
            .filter(F.col("prefixpart") == "J:")
            .select(
                F.col("_object_key").alias("_refs_key"),
                F.concat(F.lit("MGI:"), F.col("accid")).alias("pub_id"),
            )
        )

    def evidence_view_triples(
        self, spark: SparkSession, raw_dir: str, annot_assoc: DataFrame
    ) -> DataFrame:
        """``_process_evidence_view`` standalone (MGI.py:1288-1370): given
        the annot-key→association-id mapping (the reference's
        ``idhash['annot']``), each evidence row emits

        - assoc RO:0002558 <ECO id>          (has evidence)
        - assoc dc:source  <J number>        (raw jnumid, reference-exact)
        - <J number> rdf:type IAO:0000310    (Reference.addRefToGraph)
        - assoc :has_sex_specificity PATO:0000384|383 when the
          MP-Sex-Specificity qualifier is M/F (Model._addSexSpecificity)
        """
        g = self.name
        eco = F.coalesce(
            *[F.when(F.col("evidencecode") == k, F.lit(v)) for k, v in EVIDENCE_ECO.items()]
        )
        rows = (
            self._read(spark, raw_dir, "evidence_view")
            .join(broadcast(annot_assoc), "_annot_key", "inner")
            .withColumn("eco_id", eco)
        )
        sex = rows.filter(
            (F.col("term") == "MP-Sex-Specificity") & F.col("value").isin("M", "F")
        ).withColumn(
            "sex", F.when(F.col("value") == "M", F.lit(SEX_SPECIFICITY["M"]))
            .otherwise(F.lit(SEX_SPECIFICITY["F"]))
        )
        return union_graphs(
            make_triples(
                rows.filter(F.col("eco_id").isNotNull()),
                "assoc_id", F.lit(T.HAS_EVIDENCE), "eco_id", graph_id=g,
            ),
            make_triples(rows, "assoc_id", F.lit(T.SOURCE), "jnumid", graph_id=g),
            make_triples(rows, "jnumid", F.lit(T.TYPE), F.lit(DOCUMENT), graph_id=g),
            make_triples(sex, "assoc_id", F.lit(HAS_SEX_SPECIFICITY), "sex", graph_id=g),
        )

    # ---- probe passes ----------------------------------------------------

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        genotype = self.genotype_dim(spark, raw_dir)
        allele = self.allele_dim(spark, raw_dir)
        marker = self.marker_dim(spark, raw_dir)
        strain = self.strain_dim(spark, raw_dir)

        # genotype → genomic background (MGI.py:545-560)
        geno_rows = self._probe(
            self._probe(
                self._read(spark, raw_dir, "gxd_genotype_view"),
                genotype, "_genotype_key", "inner",
            ),
            strain, "_strain_key", "left",
        )
        geno_triples = union_graphs(
            make_triples(geno_rows, "genotype_id", F.lit(T.TYPE), F.lit(INTRINSIC_GENOTYPE), graph_id=g),
            make_triples(
                geno_rows.filter(F.col("strain_id").isNotNull()),
                "genotype_id", F.lit(HAS_REFERENCE_PART), "strain_id", graph_id=g,
            ),
            make_triples(
                geno_rows.filter(F.col("strain_id").isNotNull()),
                "strain_id", F.lit(T.TYPE), F.lit(GENOMIC_BACKGROUND), graph_id=g,
            ),
            make_triples(
                geno_rows.filter(F.col("strain").isNotNull()),
                "strain_id", F.lit(T.LABEL), "strain", is_literal=True, graph_id=g,
            ),
        )

        # alleles → markers (MGI.py:720-850)
        allele_rows = self._probe(
            self._probe(
                self._read(spark, raw_dir, "all_allele_view"),
                allele, "_allele_key", "inner",
            ),
            marker, "_marker_key", "left",
        )
        allele_triples = union_graphs(
            make_triples(allele_rows, "allele_id", F.lit(T.LABEL), "symbol", is_literal=True, graph_id=g),
            make_triples(
                allele_rows.filter(F.col("marker_id").isNotNull()),
                "allele_id", F.lit(IS_ALLELE_OF), "marker_id", graph_id=g,
            ),
            make_triples(
                allele_rows.filter(F.col("iswildtype") == "0"),
                "allele_id", F.lit(T.TYPE), F.lit(VARIANT_LOCUS), graph_id=g,
            ),
        )

        # allele pairs: genotype has_variant_part alleles + zygosity
        # (MGI.py:960-1030)
        zyg = F.lit(None).cast("string")
        for k, v in ZYGOSITY.items():
            zyg = F.when(F.col("allelestate") == k, F.lit(v)).otherwise(zyg)
        pair_rows = self._probe(
            self._probe(
                self._probe(
                    self._read(spark, raw_dir, "gxd_allelepair_view"),
                    genotype, "_genotype_key", "inner",
                ),
                allele.withColumnRenamed("_allele_key", "_allele_key_1")
                .withColumnRenamed("allele_id", "allele1_id"),
                "_allele_key_1", "left",
            ),
            allele.withColumnRenamed("_allele_key", "_allele_key_2")
            .withColumnRenamed("allele_id", "allele2_id"),
            "_allele_key_2", "left",
        ).withColumn("zygosity", zyg)
        pair_triples = union_graphs(
            make_triples(
                pair_rows.filter(F.col("allele1_id").isNotNull()),
                "genotype_id", F.lit(HAS_VARIANT_PART), "allele1_id", graph_id=g,
            ),
            make_triples(
                pair_rows.filter(F.col("allele2_id").isNotNull()),
                "genotype_id", F.lit(HAS_VARIANT_PART), "allele2_id", graph_id=g,
            ),
            make_triples(
                pair_rows.filter(F.col("zygosity").isNotNull()),
                "genotype_id", F.lit(HAS_ZYGOSITY), "zygosity", graph_id=g,
            ),
        )

        # annotations + evidence (MGI.py:1190-1260): G2P for MP/Genotype,
        # is-model-of for DO/Genotype; 'norm' qualifier skipped; DO NOT-
        # qualifier skipped; evidence_view supplies ECO + J: pubs
        # J-number pubs resolve through the bib_acc_view dim (MGI:J:... ids)
        pubs = broadcast(self.pub_dim(spark, raw_dir))
        ev = (
            self._read(spark, raw_dir, "evidence_view")
            .withColumn(
                "eco_id",
                F.coalesce(
                    *[F.when(F.col("evidencecode") == k, F.lit(v)) for k, v in EVIDENCE_ECO.items()]
                ),
            )
            .join(pubs.select(F.col("pub_id"), F.regexp_replace("pub_id", "^MGI:", "").alias("jnumid")),
                  "jnumid", "left")
            .groupBy("_annot_key")
            .agg(
                F.collect_set("eco_id").alias("evidence"),
                F.collect_set("pub_id").alias("jnums"),
            )
        )
        annots = (
            self._read(spark, raw_dir, "voc_annot_view")
            .filter(F.col("qualifier").isNull() | (F.col("qualifier") != "norm"))
            .transform(lambda d: self._probe(
                d, genotype.withColumnRenamed("_genotype_key", "_object_key"),
                "_object_key", "inner"))
            .join(ev, "_annot_key", "left")
            .withColumn("sources", F.col("jnums"))
        )
        mp = annots.filter(F.col("annottype") == "Mammalian Phenotype/Genotype").withColumn(
            "predicate", F.lit("RO:0002200")
        )
        do = annots.filter(
            (F.col("annottype") == "DO/Genotype")
            & (F.col("_qualifier_key") != DO_NOT_QUALIFIER_KEY)
        ).withColumn("predicate", F.lit(IS_MODEL_OF))
        # MP-Sex-Specificity qualifiers decorate the computed assoc node
        # (MGI.py:1365-1367) — same digest as g2p_association_triples
        sex_per_annot = (
            self._read(spark, raw_dir, "evidence_view")
            .filter((F.col("term") == "MP-Sex-Specificity") & F.col("value").isin("M", "F"))
            .groupBy("_annot_key")
            .agg(F.max("value").alias("_sexval"))
            .withColumn(
                "sex",
                F.when(F.col("_sexval") == "M", F.lit(SEX_SPECIFICITY["M"]))
                .otherwise(F.lit(SEX_SPECIFICITY["F"])),
            )
        )
        # definedby is the SOURCE name in the id digest (G2PAssoc(graph,
        # self.name, ...), MGI.py:1229,1242,1273)
        mp_sex = with_assoc_id(
            mp.join(broadcast(sex_per_annot), "_annot_key", "inner"),
            "genotype_id", "predicate", "accid", definedby=g,
        )
        annot_triples = union_graphs(
            g2p_association_triples(
                mp, "genotype_id", "accid", "predicate",
                evidence_col="evidence", source_col="sources", definedby=g, graph_id=g,
            ),
            class_triples(mp.select(F.col("accid").alias("id")), "id", graph_id=g),
            association_triples(
                do, "genotype_id", "predicate", "accid",
                evidence_col="evidence", source_col="sources", definedby=g, graph_id=g,
            ),
            make_triples(
                mp_sex, "assoc_id", F.lit(HAS_SEX_SPECIFICITY), "sex", graph_id=g
            ),
        )

        # marker genomic locations → FALDO features (mrk_location_cache)
        loc_rows = (
            self._probe(self._read(spark, raw_dir, "mrk_location_cache"),
                        marker, "_marker_key", "inner")
            .filter(F.col("startcoordinate").isNotNull())
            .select(
                F.col("marker_id").alias("feature_id"),
                F.concat(F.lit("MGI:chr"), F.col("chromosome")).alias("chrom"),
                F.col("startcoordinate").cast("double").cast("long").alias("start"),
                F.col("endcoordinate").cast("double").cast("long").alias("stop"),
                F.col("strand"),
            )
        )
        loc_triples = feature_triples(
            loc_rows, "feature_id", chrom_col="chrom", start_col="start",
            stop_col="stop", strand_col="strand", graph_id=g,
        )

        return union_graphs(
            geno_triples, allele_triples, pair_triples, annot_triples, loc_triples
        ).dropDuplicates(["subject", "predicate", "object"])
