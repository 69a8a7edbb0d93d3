"""UDP (Undiagnosed Diseases Program) patient phenotype/variant pipeline.

Reference: dipper/sources/UDP.py —
``_convert_variant_file_to_dict`` (447-595: 22-column headerless export,
chr/build/base normalization, junk-allele scrub, line-number fallback ids,
per-(patient, variant) gene accumulation), ``_parse_patient_variants``
(242-328: per-patient intrinsic-genotype bnode + per-variant sequence-
alteration bnode with HGVS-style labels and dbSNP sameAs),
``_build_variant_label`` (690-720), ``_add_variant_gene_relationship``
(330-446: single-gene → has_affected_feature via the HGNC symbol lookup;
multi-gene up/downstream → coordinate disambiguation),
``_parse_patient_phenotypes`` (597-627: FOAF person + affected-status +
present-phenotype edges), ``_parse_rs_map_file``/``_get_rs_id`` (649-830:
coordinate-keyed dbSNP candidates, unambiguous-match-only).

Spark shape: the variant export is scanned once with deterministic
line numbers (zipWithIndex — the reference's ``reader.line_num`` fallback
id), grouped to one row per (patient, variant), and every downstream
relationship is a column expression or broadcast-dim join:

- the HGNC symbol lookup (the reference's live
  ``DipperUtil.get_hgnc_id_from_symbol`` REST call) is a broadcast file dim;
- the dbSNP rs map probe is a broadcast join on the (chr, position) key
  with the snp/in-del candidate filters as aggregation conditions;
- the multi-gene coordinate disambiguation is the J5 point-in-interval
  range join (operators/joins.range_join shape).

Documented divergences: the reference's multi-gene disambiguation branch
(UDP.py:366-445) reads ``gene_id`` leaked from the previous loop iteration,
so its coordinate probe can never match and every multi-gene variant falls
through to causally-influences; here the lookup is per-gene (the evident
intent), so genes whose resolved id has coordinates containing the variant
DO classify as affected loci.  With the reference's own NCBIGene-keyed
coordinate map and HGNC-id symbol dim the observable output is identical
(nothing matches, exactly as in the reference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.ids import digest_id
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

HAS_AFFECTED_FEATURE = "GENO:0000418"
CAUSALLY_INFLUENCES = "RO:0002566"
SEQUENCE_ALTERATION = "SO:0001059"
INTRINSIC_GENOTYPE = "GENO:0000719"  # globaltt['intrinsic genotype']
HAS_GENOTYPE = "GENO:0000222"
HAS_VARIANT_PART = "GENO:0000382"
HAS_PHENOTYPE = "RO:0002200"
DISEASE_OR_DISORDER = "MONDO:0000001"
PERSON = "foaf:Person"
SAME_AS = "owl:sameAs"
HUMAN = "NCBITaxon:9606"

#: the reference's 22-name column list (UDP.py:506-512); data rows may carry
#: trailing extra fields — positional reads below mirror col.index()
VARIANT_COLUMNS = [
    "patient", "family", "chromosome", "build", "position", "reference_allele",
    "variant_allele", "parent_of_origin", "allele_type", "mutation_type",
    "gene_symbol", "transcript", "reference_aa", "variant_aa, aa_change",
    "segregates_with", "locus", "exon", "inheritance_model", "zygosity",
    "dbsnp_id", "frequency", "num_of_alleles",
]


def _bnode(col: Column) -> Column:
    return F.concat(F.lit("_:"), digest_id(col))


def _variant_label(
    build: Column, chrom: Column, position: Column, ref: Column, var: Column,
    gene: Column,
) -> Column:
    """_build_variant_label (UDP.py:690-720): HGVS-ish ``build chr (gene)
    :g.pos ref>alt`` with ins/del forms; ``gene`` NULL → no gene in the
    prefix."""
    prefix = F.when(
        gene.isNotNull() & (gene != ""),
        F.concat(build, chrom, F.lit("("), gene, F.lit(")")),
    ).otherwise(F.concat(build, chrom))
    return (
        F.when(ref == "-", F.concat(prefix, F.lit(":g."), position, F.lit("ins"), var))
        .when(var == "-", F.concat(prefix, F.lit(":g."), position, F.lit("del"), ref))
        .otherwise(F.concat(prefix, F.lit(":g."), position, ref, F.lit(">"), var))
    )


@register
class UdpPipeline(SourcePipeline):
    name = "udp"
    files = {
        "variants": FileContract(
            file="udp_variants.tsv",
            url="https://udplims-collab.nhgri.nih.gov/api",  # staged export
        ),
        "phenotypes": FileContract(
            file="udp_phenotypes.tsv",
            url="https://udplims-collab.nhgri.nih.gov/api",
        ),
        # curated resource maps (reference resources/udp/*)
        "dbsnp_map": FileContract(file="udp_chr_rs.tsv"),
        "gene_coord_map": FileContract(file="gene_coordinates.tsv"),
        # symbol→id dim replacing DipperUtil.get_hgnc_id_from_symbol REST
        "hgnc_map": FileContract(file="hgnc_symbol_map.tsv"),
    }
    test_ids = ["P0001"]

    # ---- staged reads ----------------------------------------------------

    def _variant_rows(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """The headerless variant export with 1-based line numbers (the
        reference's ``reader.line_num`` id fallback) — zipWithIndex is
        deterministic over the single staged file."""
        import os

        path = self.path(raw_dir, "variants")
        if not os.path.exists(path):
            return None
        lines = (
            spark.read.text(path).rdd.zipWithIndex()
            .map(lambda pair: (pair[1] + 1, pair[0].value))
        )
        df = spark.createDataFrame(lines, "line_num long, value string")
        parts = F.split("value", "\t")
        gv = lambda i: F.coalesce(F.get(parts, i), F.lit(""))  # noqa: E731
        cols = {
            "patient": gv(0), "chromosome": gv(2), "build": gv(3),
            "position": gv(4), "reference_allele": gv(5), "variant_allele": gv(6),
            "mutation_type": gv(9), "gene_symbol": gv(10),
            "dbsnp_id": gv(VARIANT_COLUMNS.index("dbsnp_id")),
        }
        df = df.select("line_num", *[c.alias(n) for n, c in cols.items()])
        # normalization (UDP.py:546-575): bare chrom number/X/Y → chrNN;
        # CHR prefix folded to chr; HG build → hg; bases uppercased with the
        # junk-value scrub; rs id extracted only when well-formed
        bare = F.col("chromosome").rlike(r"^(?i)([XY]|[0-9]{1,2})$")
        fchr = F.when(
            bare, F.concat(F.lit("chr"), F.upper("chromosome"))
        ).otherwise(F.regexp_replace("chromosome", r"^(?i)CHR", "chr"))
        junk = r"LEFT FLANK|NM_|EXON"
        clean = lambda c: F.when(  # noqa: E731
            F.upper(c).rlike(junk), F.lit("")
        ).otherwise(F.upper(c))
        return df.select(
            "line_num", "patient", "position", "mutation_type", "gene_symbol",
            fchr.alias("chromosome"),
            F.regexp_replace("build", r"^(?i)HG", "hg").alias("build"),
            clean(F.col("reference_allele")).alias("reference_allele"),
            clean(F.col("variant_allele")).alias("variant_allele"),
            F.regexp_extract("dbsnp_id", r"^(rs\d+)", 1).alias("rs_id"),
        )

    def variant_map(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """One row per (patient, variant_id) with the gene-of-interest list
        (_convert_variant_file_to_dict, UDP.py:447-595)."""
        rows = self._variant_rows(spark, raw_dir)
        info = F.array("chromosome", "build", "position", "reference_allele", "variant_allele")
        rows = rows.withColumn(
            "variant_id",
            F.when(
                ~F.array_contains(info, ""), F.array_join(info, "-")
            ).otherwise(
                F.concat_ws(
                    "-", F.col("line_num"),
                    F.array_join(F.filter(info, lambda x: x != ""), "-"),
                )
            ),
        )
        first = lambda c: F.min_by(c, "line_num")  # noqa: E731
        return (
            rows.groupBy("patient", "variant_id")
            .agg(
                *[
                    first(c).alias(c)
                    for c in ("build", "chromosome", "position",
                              "reference_allele", "variant_allele",
                              "mutation_type", "rs_id")
                ],
                # reference list semantics: every row appends its symbol,
                # duplicates included (UDP.py:588-595)
                F.array_sort(
                    F.collect_list(F.struct("line_num", "gene_symbol"))
                ).alias("_genes"),
            )
            .withColumn("genes", F.transform("_genes", lambda s: s["gene_symbol"]))
            .drop("_genes")
            .withColumn("variant_bnode", _bnode(F.col("variant_id")))
            .withColumn("n_genes", F.size("genes"))
            .withColumn("gene0", F.get("genes", 0))
        )

    def _dim(self, spark, raw_dir, key, names):
        import os

        path = self.path(raw_dir, key)
        if not os.path.exists(path):
            return None
        parts = F.split("value", "\t")
        return spark.read.text(path).select(
            *[F.get(parts, i).alias(n) for i, n in enumerate(names)]
        )

    # ---- triple emitters -------------------------------------------------

    def patient_phenotype_triples(
        self, spark: SparkSession, raw_dir: str, *, test_mode: bool = False,
    ) -> DataFrame:
        """_parse_patient_phenotypes (UDP.py:597-627): FOAF person, the
        affected-status edge on EVERY row, and the phenotype edge only when
        present == 'yes'."""
        g = self.name
        rows = self._dim(spark, raw_dir, "phenotypes", ["patient_id", "hpo_id", "present"])
        if rows is None:
            return None
        rows = rows.filter(F.col("patient_id") != "Patient")  # header analog
        rows = self.test_filter(rows, "patient_id", test_mode)
        rows = rows.withColumn("patient", F.concat(F.lit("MONARCH:"), "patient_id"))
        return union_graphs(
            make_triples(rows, "patient", F.lit(T.TYPE), F.lit(PERSON), graph_id=g),
            make_triples(rows, "patient", F.lit(T.LABEL), "patient_id", is_literal=True, graph_id=g),
            make_triples(
                rows, "patient", F.lit(HAS_PHENOTYPE), F.lit(DISEASE_OR_DISORDER), graph_id=g
            ),
            make_triples(
                rows.filter(F.col("present") == "yes"),
                "patient", F.lit(HAS_PHENOTYPE), "hpo_id", graph_id=g,
            ),
        )

    def patient_variant_triples(
        self, spark: SparkSession, raw_dir: str, *, test_mode: bool = False,
    ) -> DataFrame:
        """_parse_patient_variants + _add_variant_gene_relationship +
        _add_variant_sameas_relationships (UDP.py:242-446, 736-775)."""
        g = self.name
        vm = self.variant_map(spark, raw_dir)
        vm = self.test_filter(vm, "patient", test_mode).localCheckpoint(eager=False)

        # per-patient intrinsic genotype (UDP.py:259-270)
        patients = vm.select("patient").distinct().select(
            "patient",
            F.concat(F.lit("MONARCH:"), "patient").alias("patient_curie"),
            _bnode(F.concat("patient", F.lit("-intrinsic-genotype"))).alias("geno_bnode"),
            F.concat("patient", F.lit(" genotype")).alias("geno_label"),
        )
        parts = [
            make_triples(patients, "geno_bnode", F.lit(T.TYPE), F.lit(INTRINSIC_GENOTYPE), graph_id=g),
            make_triples(patients, "geno_bnode", F.lit(T.LABEL), "geno_label", is_literal=True, graph_id=g),
            make_triples(patients, "patient_curie", F.lit(HAS_GENOTYPE), "geno_bnode", graph_id=g),
        ]
        linked = vm.withColumn(
            "geno_bnode", _bnode(F.concat("patient", F.lit("-intrinsic-genotype")))
        )
        parts.append(
            make_triples(linked, "geno_bnode", F.lit(HAS_VARIANT_PART), "variant_bnode", graph_id=g)
        )
        parts.append(
            make_triples(vm, "variant_bnode", F.lit(T.TYPE), F.lit(SEQUENCE_ALTERATION), graph_id=g)
        )
        parts.append(
            make_triples(vm, "variant_bnode", F.lit(T.IN_TAXON), F.lit(HUMAN), graph_id=g)
        )
        # dbsnp id straight from the export column (UDP.py:324-327)
        parts.append(
            make_triples(
                vm.filter(F.col("rs_id") != "").withColumn(
                    "dbsnp", F.concat(F.lit("dbSNP:"), "rs_id")
                ),
                "variant_bnode", F.lit(SAME_AS), "dbsnp", graph_id=g,
            )
        )

        # ---- gene relationships (UDP.py:330-446) -------------------------
        hgnc = self._dim(spark, raw_dir, "hgnc_map", ["hgnc_id", "symbol"])
        genes = vm.select(
            "variant_bnode", "n_genes", "build", "chromosome", "position",
            "reference_allele", "variant_allele", "mutation_type",
            F.explode(F.array_distinct("genes")).alias("symbol"),
        ).filter(F.col("symbol") != "")
        if hgnc is not None:
            genes = genes.join(F.broadcast(hgnc), "symbol", "left")
        else:
            genes = genes.withColumn("hgnc_id", F.lit(None).cast("string"))
        single = genes.filter(F.col("n_genes") == 1)
        with_id = single.filter(F.col("hgnc_id").isNotNull())
        parts.append(
            make_triples(with_id, "variant_bnode", F.lit(HAS_AFFECTED_FEATURE), "hgnc_id", graph_id=g)
        )
        # unmapped symbol → labeled gene bnode (UDP.py:727-734)
        no_id = single.filter(F.col("hgnc_id").isNull()).withColumn(
            "gene_bnode", _bnode(F.col("symbol"))
        )
        parts.append(
            make_triples(no_id, "variant_bnode", F.lit(HAS_AFFECTED_FEATURE), "gene_bnode", graph_id=g)
        )
        parts.append(
            make_triples(no_id, "gene_bnode", F.lit(T.LABEL), "symbol", is_literal=True, graph_id=g)
        )
        # multi-gene up/down-stream disambiguation: J5 interval containment
        # over the curated coordinate map (see module docstring divergence)
        coords = self._dim(
            spark, raw_dir, "gene_coord_map",
            ["gene_curie", "start", "end", "strand", "cbuild"],
        )
        multi = genes.filter(
            (F.col("n_genes") > 1) & F.col("mutation_type").rlike(r"(?i)upstream|downstream")
        )
        if coords is not None:
            multi = multi.join(
                F.broadcast(coords), multi["hgnc_id"] == coords["gene_curie"], "left"
            )
        else:
            multi = multi.withColumn("start", F.lit(None)).withColumn("end", F.lit(None))
        contained = (
            F.col("start").cast("long") <= F.col("position").cast("long")
        ) & (F.col("position").cast("long") <= F.col("end").cast("long"))
        multi = multi.withColumn("in_ref", F.coalesce(contained, F.lit(False)))
        from pyspark.sql import Window

        n_ref = F.count(F.when(F.col("in_ref"), 1)).over(
            Window.partitionBy("variant_bnode")
        )
        multi = multi.withColumn("n_ref", n_ref).withColumn(
            "relation",
            F.when(F.col("in_ref") & (F.col("n_ref") == 1), F.lit(HAS_AFFECTED_FEATURE))
            .otherwise(F.lit(CAUSALLY_INFLUENCES)),
        ).withColumn("gene_obj", F.coalesce("hgnc_id", _bnode(F.col("symbol"))))
        parts.append(
            make_triples(multi, "variant_bnode", F.col("relation"), "gene_obj", graph_id=g)
        )
        # resolved single-ref-gene variants relabel with the gene prefix
        hack_label = multi.filter(F.col("in_ref") & (F.col("n_ref") == 1)).select(
            "variant_bnode",
            _variant_label(
                F.col("build"), F.col("chromosome"), F.col("position"),
                F.col("reference_allele"), F.col("variant_allele"), F.col("symbol"),
            ).alias("variant_label"),
        )
        parts.append(
            make_triples(hack_label, "variant_bnode", F.lit(T.LABEL), "variant_label", is_literal=True, graph_id=g)
        )

        # ---- default labels (UDP.py:277-299), skipped where the hack
        # already labeled the bnode
        has_core = (
            (F.col("position") != "") & (F.col("reference_allele") != "")
            & (F.col("variant_allele") != "")
        )
        lbl_gene = F.when(F.col("n_genes") == 1, F.col("gene0"))
        label = (
            F.when(
                has_core,
                _variant_label(
                    F.col("build"), F.col("chromosome"), F.col("position"),
                    F.col("reference_allele"), F.col("variant_allele"), lbl_gene,
                ),
            )
            .when(
                (F.col("position") == "") & (F.col("reference_allele") != "")
                & (F.col("variant_allele") != "") & (F.col("n_genes") == 1),
                _variant_label(
                    F.col("build"), F.col("chromosome"), F.col("position"),
                    F.col("reference_allele"), F.col("variant_allele"), F.col("gene0"),
                ),
            )
            .when(
                (F.col("position") != "") & (F.col("n_genes") == 1),
                F.concat(
                    "build", "chromosome", F.lit("("), "gene0", F.lit("):g."), "position"
                ),
            )
            .when(
                F.col("n_genes") == 1,
                F.concat(
                    F.lit("variant of interest in "), "gene0",
                    F.lit(" gene of patient "), "patient",
                ),
            )
            .otherwise(F.concat(F.lit("variant of interest in patient "), "patient"))
        )
        defaults = vm.withColumn("variant_label", label).join(
            hack_label.select("variant_bnode").distinct(), "variant_bnode", "left_anti"
        )
        parts.append(
            make_triples(defaults, "variant_bnode", F.lit(T.LABEL), "variant_label", is_literal=True, graph_id=g)
        )

        # ---- dbSNP rs-map sameAs (UDP.py:736-830) ------------------------
        rs = self._dim(
            spark, raw_dir, "dbsnp_map",
            ["m_chrom", "m_pos", "m_rs", "m_type", "m_alleles"],
        )
        if rs is not None:
            keyed = vm.filter(
                (F.col("build") != "") & (F.col("chromosome") != "")
                & (F.col("position") != "") & (F.col("reference_allele") != "")
                & (F.col("variant_allele") != "")
            )
            is_snp = F.col("reference_allele").rlike(r"^[ATCG]$") & F.col(
                "variant_allele"
            ).rlike(r"^[ATCG]$")
            joined = keyed.join(
                F.broadcast(rs),
                (keyed["chromosome"] == F.concat(F.lit("chr"), rs["m_chrom"]))
                & (keyed["position"] == rs["m_pos"]),
                "inner",
            )
            cand = F.when(
                is_snp, F.col("m_type") == "snp"
            ).otherwise(
                (F.col("m_type") == "in-del")
                & F.array_contains(F.split("m_alleles", "/"), F.col("reference_allele"))
                & F.array_contains(F.split("m_alleles", "/"), F.col("variant_allele"))
            )
            matched = (
                joined.filter(cand)
                .groupBy("variant_bnode")
                .agg(F.count(F.lit(1)).alias("n"), F.first("m_rs").alias("m_rs"))
                .filter(F.col("n") == 1)  # unambiguous match only
                .withColumn("dbsnp", F.concat(F.lit("dbSNP:rs"), "m_rs"))
            )
            parts.append(
                make_triples(matched, "variant_bnode", F.lit(SAME_AS), "dbsnp", graph_id=g)
            )
        return union_graphs(*parts)

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        import os

        g_parts = []
        if os.path.exists(self.path(raw_dir, "phenotypes")):
            g_parts.append(
                self.patient_phenotype_triples(spark, raw_dir, test_mode=test_mode)
            )
        if os.path.exists(self.path(raw_dir, "variants")):
            g_parts.append(
                self.patient_variant_triples(spark, raw_dir, test_mode=test_mode)
            )
        out = union_graphs(*[p for p in g_parts if p is not None])
        if limit:
            out = out.limit(limit)
        return out.dropDuplicates(["subject", "predicate", "object"])
