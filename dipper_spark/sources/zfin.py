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

Genotype labels (``_process_genotype_features`` ZFIN.py:769-1190 +
``_process_genotype_backgrounds`` 1192-1266): the reference's two-pass
geno_hash/gvc_hash driver loops become two groupBy stages — per-(genotype,
locus) allele aggregation with zygosity-implied second alleles, then a
per-genotype rollup of sorted VSLC labels joined to the backgrounds dim.
Deliberate divergences from the reference, documented here:
- allele order within a locus is deterministic (descending sort puts real
  allele ids before the '?'/'0' sentinels) instead of file order — the
  reference's parts[0]/parts[1] depend on row order, which a parallel scan
  does not guarantee;
- the background label comes from the backgrounds file's own
  'Background Name' column rather than the reference's driver-global
  id_label_map (populated from a separate wildtypes pass) — same observable
  value, one fewer pass.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.ids import digest_id, make_id
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

GENO_COLUMNS = [
    "Genotype ID", "Genotype Name", "Genotye Unique Name", "Allele ID",
    "Allele Name", "Allele Abbreviation", "Allele Type", "Allele Display Type",
    "Gene or Construct Symbol", "Corresponding ZFIN Gene ID/Construct ID",
    "Allele Zygosity", "Construct Name", "Construct ZdbId",
]

BACKGROUND_COLUMNS = ["Genotype ID", "Genotype Name", "Background", "Background Name"]

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
        "geno": FileContract(
            file="genotype_features.txt",
            url="https://zfin.org/downloads/genotype_features.txt",
            columns=GENO_COLUMNS,
        ),
        "backgrounds": FileContract(
            file="genotype_backgrounds.txt",
            url="https://zfin.org/downloads/genotype_backgrounds.txt",
            columns=BACKGROUND_COLUMNS,
        ),
    }
    test_ids = ["ZDB-FISH-150901-29105"]

    #: opt-in skew guard for the star probes (round-12 verdict item #7 —
    #: the MGI posture generalized): False = plain broadcast joins (the
    #: zp map and background dims are dict-sized, the correct default);
    #: True = each probe runs the q_key_skew straggler prediction and
    #: switches to the salted skew_join only when a fact key (a hub
    #: phenotype octuple shared by most fish rows, or a hub genotype)
    #: trips the threshold.  Output identical either way (pytest-pinned).
    guard_skew: bool = False

    def _probe(self, fact: DataFrame, dim: DataFrame, on: str, how: str = "inner") -> DataFrame:
        """One star probe: broadcast dict-lookup by default, guarded salted
        join when ``guard_skew`` is set (see broadcast_lookup)."""
        from dipper_spark.operators.joins import broadcast_lookup

        return broadcast_lookup(fact, dim, on, how, guard=self.guard_skew)

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
        mapped = self._probe(rows, self.zp_map(spark, raw_dir), "_zpkey", "left")

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

        parts = [assoc, normal_triples]
        # genotype-features files are an optional second surface (the
        # reference parses them in the same run; fixtures that only exercise
        # the g2p path omit them)
        if os.path.exists(self.path(raw_dir, "geno")):
            parts.append(
                self.genotype_label_triples(spark, raw_dir, test_mode=test_mode)
            )
        return union_graphs(*parts).dropDuplicates(
            ["subject", "predicate", "object"]
        )

    def _read_headerless(self, spark: SparkSession, raw_dir: str, key: str) -> DataFrame:
        cols = self.files[key].columns
        schema = " ".join(f"`{c}` string," for c in cols).rstrip(",")
        return spark.read.option("sep", "\t").schema(schema).csv(self.path(raw_dir, key))

    def genotype_labels(
        self, spark: SparkSession, raw_dir: str, *, test_mode: bool = False,
    ) -> DataFrame:
        """Monarch-style genotype labels (ZFIN.py:769-1190, 1192-1266).

        Two aggregation stages replace the reference's geno_hash/gvc_hash
        driver loops:

        1. per-(genotype, locus): collect each row's allele plus the
           zygosity-implied second allele (``_get_other_allele_by_zygosity``
           ZFIN.py:2822-2850: homozygous → same id, hemizygous/complex → '0',
           unknown → '?', heterozygous → none → wild-type '+'), classify
           zygosity from the resulting pair, and render the VSLC label
           (``Genotype.make_vslc_label`` Genotype.py:665-687:
           ``gene<al1>/gene<al2>``; empty gene label for unlocated alleles).
           The VSLC bnode id is the reference's digest
           (``make_id(re.sub(r'(ZFIN)?:','', gene-al1-al2), '_')``,
           ZFIN.py:1066-1068) so ids are bit-compatible.
        2. per-genotype: the GVC label is the sorted '; '-join of VSLC labels
           (ZFIN.py:1105-1125); a left join to the backgrounds dim supplies
           the background label ('unspecified background' when absent,
           ZFIN.py:1146-1166); the display label is
           ``zfin_name (background)`` and the Monarch synonym
           ``gvc_label [background]`` (ZFIN.py:1171-1177).

        Returns one row per genotype: genotype_curie, zfin_name,
        genotype_label, monarch_synonym, background_curie, vslc_ids,
        vslc_labels, zygosities.
        """
        rows = self._read_headerless(spark, raw_dir, "geno")
        if test_mode:
            rows = rows.filter(F.col("Genotype ID").isin(list(self.test_ids)))
        staged = rows.select(
            F.concat(F.lit("ZFIN:"), F.trim("Genotype ID")).alias("genotype_curie"),
            F.col("Genotype Name").alias("zfin_name"),
            F.concat(F.lit("ZFIN:"), F.trim("Allele ID")).alias("allele_id"),
            F.col("Allele Name").alias("allele_name"),
            F.when(
                F.coalesce(F.trim("Corresponding ZFIN Gene ID/Construct ID"), F.lit("")) != "",
                F.concat(F.lit("ZFIN:"), F.trim("Corresponding ZFIN Gene ID/Construct ID")),
            ).alias("gene_id"),
            F.col("Gene or Construct Symbol").alias("gene_symbol"),
            F.trim("Allele Zygosity").alias("zygosity"),
        )
        other = (
            F.when(F.col("zygosity") == "homozygous", F.col("allele_id"))
            .when(F.col("zygosity").isin("hemizygous", "complex"), F.lit("0"))
            .when(F.col("zygosity") == "unknown", F.lit("?"))
        )  # heterozygous: no implied partner → wild-type '+' downstream
        contrib = staged.withColumn(
            "parts", F.array_compact(F.array("allele_id", other))
        ).withColumn("locus", F.coalesce("gene_id", "allele_id"))

        per_locus = contrib.groupBy("genotype_curie", "locus").agg(
            F.first("zfin_name").alias("zfin_name"),
            F.max("gene_id").alias("gene_id"),
            F.max_by("gene_symbol", "gene_id").alias("gene_symbol"),
            # descending sort: real allele ids before the '?'/'0' sentinels
            F.reverse(F.array_sort(F.flatten(F.collect_list("parts")))).alias("alleles"),
            # reverse-sorted (id, name) entries; first entry per id = max name,
            # so duplicate ids with divergent spellings can't raise
            # DUPLICATE_MAP_KEY when folded to a map below
            F.reverse(
                F.array_sort(F.collect_set(F.struct("allele_id", "allele_name")))
            ).alias("_label_entries"),
        )
        per_locus = per_locus.withColumn(
            "allele_label",
            F.map_from_entries(
                F.filter(
                    "_label_entries",
                    lambda e, i: (i == 0)
                    | (F.get(F.col("_label_entries"), i - 1)["allele_id"] != e["allele_id"]),
                )
            ),
        ).drop("_label_entries")
        # F.get: 0-based, NULL out-of-bounds — a 1-element array (simple het)
        # must yield NULL, not the ANSI INVALID_ARRAY_INDEX error element_at
        # raises (pyspark 4 defaults ANSI on)
        a1 = F.get("alleles", F.lit(0))
        a2 = F.get("alleles", F.lit(1))  # null when simple het
        classified = per_locus.select(
            "genotype_curie", "zfin_name", "gene_id", "gene_symbol",
            a1.alias("allele1"),
            # id sentinels per ZFIN.py:988-1000: simple het → 'WT',
            # indeterminate '?' → 'UN', hemizygous keeps '0'
            F.when(a2.isNull(), F.lit("WT")).when(a2 == "?", F.lit("UN")).otherwise(a2).alias("allele2"),
            F.when(a2.isNull(), F.lit(T.SIMPLE_HETEROZYGOUS))
            .when(a2 == "?", F.lit(T.INDETERMINATE))
            .when(a2 == "0", F.lit(T.HEMIZYGOUS))
            .when(a1 == a2, F.lit(T.HOMOZYGOUS))
            .otherwise(F.lit(T.COMPOUND_HETEROZYGOUS))
            .alias("zygosity_id"),
            F.element_at("allele_label", a1).alias("allele1_label"),
            F.when(a2.isNull(), F.lit("+"))
            .when(a2.isin("0", "?"), a2)
            .otherwise(F.element_at("allele_label", a2))
            .alias("allele2_label"),
        )
        gene_label = F.when(F.col("gene_id").isNotNull(), F.trim("gene_symbol")).otherwise(F.lit(""))
        vslc = classified.select(
            "genotype_curie", "zfin_name", "zygosity_id",
            F.concat(
                gene_label, F.lit("<"), F.trim("allele1_label"), F.lit(">"),
                F.lit("/"),
                gene_label, F.lit("<"), F.trim("allele2_label"), F.lit(">"),
            ).alias("vslc_label"),
            # reference vslc id: digest of 'gene-al1-al2' with curie prefixes
            # stripped, as a bnode (ZFIN.py:1066-1068; 'UN' when unlocated,
            # 'WT' wild-type partner)
            F.concat(
                F.lit("_:"),
                digest_id(
                    F.regexp_replace(
                        F.concat_ws("-", F.coalesce("gene_id", F.lit("UN")), "allele1", "allele2"),
                        r"(ZFIN)?:", "",
                    )
                ),
            ).alias("vslc_id"),
        )
        per_genotype = vslc.groupBy("genotype_curie").agg(
            F.first("zfin_name").alias("zfin_name"),
            F.array_join(F.array_sort(F.collect_list("vslc_label")), "; ").alias("gvc_label"),
            F.array_sort(F.collect_list("vslc_id")).alias("vslc_ids"),
            F.array_sort(F.collect_list("vslc_label")).alias("vslc_labels"),
            F.collect_set("zygosity_id").alias("zygosities"),
        )

        backgrounds = self._read_headerless(spark, raw_dir, "backgrounds").select(
            F.concat(F.lit("ZFIN:"), F.trim("Genotype ID")).alias("genotype_curie"),
            F.concat(F.lit("ZFIN:"), F.trim("Background")).alias("background_curie"),
            F.trim("Background Name").alias("background_label"),
        )
        bg_label = F.coalesce("background_label", F.lit("unspecified background"))
        return self._probe(per_genotype, backgrounds, "genotype_curie", "left").select(
            "genotype_curie", "zfin_name", "background_curie",
            "vslc_ids", "vslc_labels", "zygosities",
            F.concat("zfin_name", F.lit(" ("), bg_label, F.lit(")")).alias("genotype_label"),
            F.concat("gvc_label", F.lit(" ["), bg_label, F.lit("]")).alias("monarch_synonym"),
        )

    def genotype_label_triples(
        self, spark: SparkSession, raw_dir: str, *, test_mode: bool = False,
    ) -> DataFrame:
        """The genotype labeling stanza as triples: intrinsic-genotype typing
        + display label (geno.addGenotype, ZFIN.py:1171), ZFIN-name and
        Monarch-style synonyms (model.addSynonym, ZFIN.py:845-849, 1175),
        background has_reference_part + genomic_background typing
        (ZFIN.py:1192-1266), and VSLC membership edges (ZFIN.py:1181)."""
        g = self.name
        labeled = self.genotype_labels(spark, raw_dir, test_mode=test_mode).cache()
        parts = [
            make_triples(labeled, "genotype_curie", F.lit(T.TYPE), F.lit(T.INTRINSIC_GENOTYPE), graph_id=g),
            make_triples(labeled, "genotype_curie", F.lit(T.LABEL), "genotype_label", is_literal=True, graph_id=g),
            make_triples(labeled, "genotype_curie", F.lit(T.HAS_EXACT_SYNONYM), "zfin_name", is_literal=True, graph_id=g),
            make_triples(labeled, "genotype_curie", F.lit(T.HAS_EXACT_SYNONYM), "monarch_synonym", is_literal=True, graph_id=g),
        ]
        with_bg = labeled.filter(F.col("background_curie").isNotNull())
        parts.append(
            make_triples(with_bg, "genotype_curie", F.lit(T.HAS_REFERENCE_PART), "background_curie", graph_id=g)
        )
        parts.append(
            make_triples(with_bg, "background_curie", F.lit(T.TYPE), F.lit(T.GENOMIC_BACKGROUND), graph_id=g)
        )
        vslcs = labeled.select("genotype_curie", F.explode("vslc_ids").alias("vslc_id"))
        parts.append(
            make_triples(vslcs, "genotype_curie", F.lit(T.HAS_VARIANT_PART), "vslc_id", graph_id=g)
        )
        parts.append(
            make_triples(vslcs, "vslc_id", F.lit(T.TYPE), F.lit(T.VSLC), graph_id=g)
        )
        return union_graphs(*parts)

    def unmapped_octuples(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """A8 miss metric: abnormal rows whose EQ octuple has no ZP mapping —
        the reference logs each miss (ZFIN.py:2755-2768); here it's an
        anti-join you can count or inspect."""
        rows = self._staged_rows(spark, raw_dir).filter(~F.col("modifier").startswith("normal"))
        return rows.join(F.broadcast(self.zp_map(spark, raw_dir)), "_zpkey", "left_anti")
