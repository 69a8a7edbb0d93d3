"""GWAS Catalog pipeline: variant-id classification dispatch, SNP/haplotype
genomic-feature stanzas, and variant→trait associations.

Reference: dipper/sources/GWASCatalog.py —
- 38-col ontology-annotated TSV contract (42-96);
- variant id classification ``_get_curie_and_type_from_id`` 578-624 (P10:
  rs→dbSNP, kgp→GWAS, chr...→bnode, ';'-lists→haplotype bnode,
  ' x '/','→unparseable), space/'-' scrubs 593-597 (P8);
- SNP stanza ``_add_snp_to_graph`` 395-448: FALDO feature on
  CHR:GRCh38chr<N>, risk-allele-frequency description, taxon, context→SO
  typing; a SNP with no location is typed region SO:0000001
  (GenomicFeature.py:210-212);
- deprecation ``_add_deprecated_snp`` 450-476: merged=1 → deprecated +
  replaced-by current rs id, clique leader on the survivor;
- gene relations ``_add_snp_gene_relation`` 477-506: SNP_GENE_IDS →
  affected-locus, up/downstream gene ids → RO:0002528/RO:0002529;
- haplotype stanza ``_process_haplotype`` 300-394: haplotype individual
  SO:0001024 with has_variant_part members, member SNP stanzas from the
  ';'-zipped chrom/pos/context lists, affected-locus via HGNC symbol;
- associations ``_add_variant_trait_association`` 508-558: per MAPPED_TRAIT_URI,
  G2P assoc with contributes-to-condition RO:0003304, ECO:0000213 evidence,
  PMID source, study description ``_make_description`` 563-576; EFO traits
  not xref'd in mondo.json get a phenotype class stanza.

Deliberate divergences, documented:
- the reference resolves gene symbols to HGNC ids with a live REST call
  (DipperUtil.get_hgnc_id_from_symbol) and checks contexts against a SPARQL
  query over the SO ontology; here both are broadcast dims — an optional
  hgnc_complete_set.txt file join (J10 as a file-dim join) and a static
  gene-variant context set (the SO subclass closure is curation data, not
  runtime state);
- the reference's chr-id mangling (``re.sub(r'-?', '-N', ...)`` — its own
  comment calls the output a "monstrocity") is simplified to ':'→'-'
  normalization before digesting; the ids stay deterministic bnodes.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_id, make_triples, union_graphs
from dipper_spark.core.vocab import TranslationTable
from dipper_spark.models import terms as T
from dipper_spark.models.assoc import association_triples, with_assoc_id
from dipper_spark.models.feature import feature_triples
from dipper_spark.models.model import class_triples, deprecation_triples
from dipper_spark.sources.base import FileContract, SourcePipeline, register

CONTRIBUTES_TO_CONDITION = "RO:0003304"
COMBINATORIAL_EVIDENCE = "ECO:0000213"
SNP_CLASS = "SO:0000694"
HAPLOTYPE_CLASS = "SO:0001024"
JOURNAL_ARTICLE = "IAO:0000013"
PHENOTYPE_PARENT = "UPHENO:0001001"  # globaltt['phenotype']
HUMAN = "NCBITaxon:9606"
AFFECTED_LOCUS = "GENO:0000418"
UPSTREAM_OF = "RO:0002528"    # is upstream of sequence of
DOWNSTREAM_OF = "RO:0002529"  # is downstream of sequence of
ASSEMBLY = "GRCh38"           # localtt 'reference assembly'

#: SO gene_variant (SO:0001564) subclass contexts — the reference checks this
#: with a SPARQL subClassOf+ query over the live SO ontology
#: (GWASCatalog.py:368-377); the closure is stable curation data, baked here.
#: upstream/downstream_gene_variant are handled as directional relations
#: before this set is consulted.
GENE_VARIANT_CONTEXTS = {
    "intron_variant", "missense_variant", "synonymous_variant",
    "stop_gained", "stop_lost", "frameshift_variant", "coding_sequence_variant",
    "5_prime_UTR_variant", "3_prime_UTR_variant", "splice_region_variant",
    "splice_donor_variant", "splice_acceptor_variant", "start_lost",
    "inframe_deletion", "inframe_insertion", "protein_altering_variant",
    "non_coding_transcript_exon_variant", "stop_retained_variant",
}

GWAS_COLUMNS = [
    "DATE ADDED TO CATALOG", "PUBMEDID", "FIRST AUTHOR", "DATE", "JOURNAL", "LINK",
    "STUDY", "DISEASE/TRAIT", "INITIAL SAMPLE SIZE", "REPLICATION SAMPLE SIZE",
    "REGION", "CHR_ID", "CHR_POS", "REPORTED GENE(S)", "MAPPED_GENE",
    "UPSTREAM_GENE_ID", "DOWNSTREAM_GENE_ID", "SNP_GENE_IDS",
    "UPSTREAM_GENE_DISTANCE", "DOWNSTREAM_GENE_DISTANCE",
    "STRONGEST SNP-RISK ALLELE", "SNPS", "MERGED", "SNP_ID_CURRENT", "CONTEXT",
    "INTERGENIC", "RISK ALLELE FREQUENCY", "P-VALUE", "PVALUE_MLOG",
    "P-VALUE (TEXT)", "OR or BETA", "95% CI (TEXT)", "PLATFORM [SNPS PASSING QC]",
    "CNV", "MAPPED_TRAIT", "MAPPED_TRAIT_URI", "STUDY ACCESSION",
    "GENOTYPING TECHNOLOGY",
]


def classify_variant(col: Column | str) -> tuple[Column, Column]:
    """``_get_curie_and_type_from_id`` (GWASCatalog.py:578-624) as a pair of
    column expressions (curie, type); both NULL for unparseable ids."""
    v = F.col(col) if isinstance(col, str) else col
    v = F.trim(F.regexp_replace(v, " -", "-"))
    unparseable = v.rlike(" x ") | v.rlike(",") | (v == "")
    is_haplo = v.rlike(";")
    is_rs = v.startswith("rs")
    is_kgp = v.startswith("kgp")
    is_chr = v.startswith("chr")
    curie = (
        F.when(unparseable, F.lit(None).cast("string"))
        # deliberate-404 bare-prefix curie, hash_id ('b'+sha1[1:20]) of the
        # FULL ';'-list label (GWASCatalog.py:598-600)
        .when(is_haplo, F.concat(F.lit(":haplotype_b"), F.substring(F.sha1(v), 2, 19)))
        .when(is_rs, F.concat(F.lit("dbSNP:"), F.regexp_replace(F.split(v, "-").getItem(0), " ", "")))
        .when(is_kgp, F.concat(F.lit("GWAS:"), F.split(v, "-").getItem(0)))
        .when(
            is_chr,
            make_id(
                F.concat(F.lit("gwas-"), F.regexp_replace(F.regexp_replace(v, ":", "-"), " ", "")),
                prefix="_",
            ),
        )
    )
    vtype = (
        F.when(unparseable, F.lit(None).cast("string"))
        .when(is_haplo, F.lit("haplotype"))
        .when(is_rs | is_kgp | is_chr, F.lit("snp"))
    )
    return curie, vtype


def _chrom_curie(chrom: Column) -> Column:
    """makeChromID(chrom, 'GRCh38', 'CHR') → CHR:GRCh38chr<N>."""
    return F.concat(F.lit(f"CHR:{ASSEMBLY}chr"), chrom)


@register
class GwasCatalogPipeline(SourcePipeline):
    name = "gwascatalog"
    files = {
        "catalog": FileContract(
            file="gwas-catalog-associations_ontology-annotated.tsv",
            url="ftp://ftp.ebi.ac.uk/pub/databases/gwas/releases/latest/",
            columns=GWAS_COLUMNS,
        ),
        # trait-in-mondo check (GWASCatalog.py:164-167, DipperUtil.is_id_in_mondo)
        "mondo": FileContract(file="mondo.json", url="http://purl.obolibrary.org/obo/mondo.json"),
        # optional symbol→HGNC dim replacing the reference's REST lookup
        "hgnc_map": FileContract(
            file="hgnc_complete_set.txt",
            url="http://ftp.ebi.ac.uk/pub/databases/genenames/new/tsv/hgnc_complete_set.txt",
            columns=["hgnc_id", "symbol"],
        ),
    }

    # ---- dims ---------------------------------------------------------------

    def _mondo_xrefs(self, spark: SparkSession, raw_dir: str) -> DataFrame | None:
        """mondo.json xref vals as a one-column dim (graphs[].nodes[].meta
        .xrefs[].val — the shape DipperUtil.is_id_in_mondo walks)."""
        path = self.path(raw_dir, "mondo")
        if not os.path.exists(path):
            return None
        nodes = spark.read.option("multiLine", True).json(path).select(
            F.explode("graphs").alias("g")
        ).select(F.explode("g.nodes").alias("n"))
        return (
            nodes.select(F.explode_outer("n.meta.xrefs").alias("x"))
            .select(F.col("x.val").alias("xref"))
            .filter(F.col("xref").isNotNull())
            .distinct()
        )

    def _hgnc_map(self, spark: SparkSession, raw_dir: str) -> DataFrame | None:
        path = self.path(raw_dir, "hgnc_map")
        if not os.path.exists(path):
            return None
        return (
            spark.read.option("sep", "\t").option("header", True).csv(path)
            .select(F.col("symbol").alias("gene_symbol"), F.col("hgnc_id"))
            .filter(F.col("hgnc_id").isNotNull())
        )

    # ---- snp stanza ---------------------------------------------------------

    def _snp_stanza(self, snps: DataFrame, tt: TranslationTable, g: str) -> DataFrame:
        """_add_snp_to_graph (395-448): FALDO feature (or region-typed when
        unlocated), label, risk-allele-freq description, taxon, context→SO
        typing.  Expects columns snp_id, snp_label, chrom, pos, context,
        raf (nullable)."""
        staged = snps.withColumn(
            "_chrom",
            F.when((F.col("chrom") != "") & (F.col("pos") != ""), _chrom_curie(F.col("chrom"))),
        ).withColumn(
            "_pos",
            F.when((F.col("chrom") != "") & (F.col("pos") != ""), F.col("pos").cast("long")),
        )
        parts = [
            feature_triples(
                staged, "snp_id",
                type_col=None, label_col=None,
                chrom_col="_chrom", start_col="_pos", stop_col="_pos",
                graph_id=g,
            ),
            make_triples(staged, "snp_id", F.lit(T.TYPE), F.lit(SNP_CLASS), graph_id=g),
            make_triples(
                staged.filter(F.trim("snp_label") != ""),
                "snp_id", F.lit(T.LABEL), F.trim("snp_label"), is_literal=True, graph_id=g,
            ),
            make_triples(staged, "snp_id", F.lit(T.IN_TAXON), F.lit(HUMAN), graph_id=g),
        ]
        desc = staged.filter(
            F.col("raf").isNotNull() & ~F.col("raf").isin("", "NR")
        ).withColumn("_desc", F.concat("raf", F.lit(" [risk allele frequency]")))
        parts.append(
            make_triples(desc, "snp_id", F.lit(T.DESCRIPTION), "_desc", is_literal=True, graph_id=g)
        )
        # context → SO typing when the term resolves (GWASCatalog.py:443-448)
        ctx = (
            staged.select("snp_id", F.explode(F.split("context", r";\s?")).alias("ctx"))
            .withColumn("ctx", F.trim("ctx"))
            .filter(F.col("ctx") != "")
            .withColumn("so_id", tt.resolve("ctx"))
            .filter(F.col("so_id") != F.col("ctx"))
        )
        parts.append(make_triples(ctx, "snp_id", F.lit(T.TYPE), "so_id", graph_id=g))
        return union_graphs(*parts)

    # ---- transform ----------------------------------------------------------

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        from dipper_spark.io import read_delim

        g = self.name
        tt = TranslationTable.for_source(self.name)
        df = read_delim(
            spark, self.path(raw_dir, "catalog"), GWAS_COLUMNS, src_key=self.name,
            limit=limit, encoding="ISO-8859-1",
        )
        curie, vtype = classify_variant("STRONGEST SNP-RISK ALLELE")
        rows = (
            df.select(
                # stripped-but-unscrubbed value (GWASCatalog.py:204-205) —
                # the ' -'→'-' scrub happens only on a copy inside
                # _get_curie_and_type_from_id (GWASCatalog.py:593-595); labels
                # use the raw string. classify_variant scrubs internally.
                F.trim("STRONGEST SNP-RISK ALLELE").alias("strongest"),
                curie.alias("variant_id"),
                vtype.alias("variant_type"),
                F.trim("CHR_ID").alias("chrom"),
                F.trim("CHR_POS").alias("pos"),
                F.trim("CONTEXT").alias("context"),
                F.trim("RISK ALLELE FREQUENCY").alias("raf"),
                F.trim("MAPPED_GENE").alias("mapped_gene"),
                F.trim("SNP_GENE_IDS").alias("snp_gene_ids"),
                F.trim("UPSTREAM_GENE_ID").alias("upstream_gene"),
                F.trim("DOWNSTREAM_GENE_ID").alias("downstream_gene"),
                F.trim("MERGED").alias("merged"),
                F.split(F.trim("SNP_ID_CURRENT"), " ").getItem(0).alias("snp_current"),
                F.trim("DISEASE/TRAIT").alias("disease_trait"),
                F.trim("INITIAL SAMPLE SIZE").alias("initial_sample"),
                F.trim("REPLICATION SAMPLE SIZE").alias("replicate_sample"),
                F.trim("PLATFORM [SNPS PASSING QC]").alias("platform"),
                F.trim("P-VALUE").alias("pvalue"),
                F.trim("MAPPED_TRAIT").alias("mapped_trait"),
                F.trim("MAPPED_TRAIT_URI").alias("trait_uris"),
                F.concat(F.lit("PMID:"), F.trim("PUBMEDID")).alias("pmid"),
            )
            .filter(F.col("variant_id").isNotNull())
        )

        parts: list[DataFrame] = []

        # ---- plain SNP rows -------------------------------------------------
        snps = rows.filter(F.col("variant_type") == "snp")
        parts.append(
            self._snp_stanza(
                snps.select(
                    F.col("variant_id").alias("snp_id"),
                    F.col("strongest").alias("snp_label"),
                    "chrom", "pos", "context", "raf",
                ),
                tt, g,
            )
        )
        # deprecation / clique leader (_add_deprecated_snp 450-476);
        # empty csv fields arrive as NULL — fold to '' before comparing
        is_merged = (F.coalesce("merged", F.lit("")) == "1") & (
            F.coalesce("snp_current", F.lit("")) != ""
        )
        merged = snps.filter(is_merged).withColumn(
            "current_rs", F.concat(F.lit("dbSNP:rs"), "snp_current")
        )
        parts.append(
            deprecation_triples(merged, "variant_id", replaced_by_col="current_rs", graph_id=g)
        )
        parts.append(
            make_triples(
                merged, "current_rs", F.lit(T.CLIQUE_LEADER), F.lit("true"),
                is_literal=True, datatype="xsd:boolean", graph_id=g,
            )
        )
        unmerged = snps.filter(~is_merged)
        parts.append(
            make_triples(
                unmerged, "variant_id", F.lit(T.CLIQUE_LEADER), F.lit("true"),
                is_literal=True, datatype="xsd:boolean", graph_id=g,
            )
        )
        # gene relations (_add_snp_gene_relation 477-506)
        in_gene = (
            snps.filter(F.col("snp_gene_ids") != "")
            .select("variant_id", F.explode(F.split("snp_gene_ids", ",")).alias("gid"))
            .withColumn("gid", F.trim("gid"))
            .filter(F.col("gid") != "")
            .withColumn("gene_id", F.concat(F.lit("ENSEMBL:"), "gid"))
        )
        parts.append(make_triples(in_gene, "variant_id", F.lit(AFFECTED_LOCUS), "gene_id", graph_id=g))
        down = snps.filter(F.col("downstream_gene") != "").withColumn(
            "gene_id", F.concat(F.lit("ENSEMBL:"), "downstream_gene")
        )
        parts.append(make_triples(down, "variant_id", F.lit(UPSTREAM_OF), "gene_id", graph_id=g))
        up = snps.filter(F.col("upstream_gene") != "").withColumn(
            "gene_id", F.concat(F.lit("ENSEMBL:"), "upstream_gene")
        )
        parts.append(make_triples(up, "variant_id", F.lit(DOWNSTREAM_OF), "gene_id", graph_id=g))

        # ---- haplotype rows (_process_haplotype 300-394) --------------------
        haps = rows.filter(F.col("variant_type") == "haplotype")
        parts.append(
            make_triples(haps, "variant_id", F.lit(T.TYPE), F.lit(HAPLOTYPE_CLASS), graph_id=g)
        )
        parts.append(
            make_triples(
                haps, "variant_id", F.lit(T.LABEL), F.trim("strongest"), is_literal=True, graph_id=g
            )
        )
        hap_desc = haps.filter(~F.col("raf").isin("", "NR")).withColumn(
            "_desc", F.concat("raf", F.lit(" [risk allele frequency]"))
        )
        parts.append(
            make_triples(hap_desc, "variant_id", F.lit(T.DESCRIPTION), "_desc", is_literal=True, graph_id=g)
        )
        parts.append(make_triples(haps, "variant_id", F.lit(T.IN_TAXON), F.lit(HUMAN), graph_id=g))

        split_cols = haps.select(
            "variant_id",
            F.split("strongest", r";\s?").alias("snp_labels"),
            F.split("chrom", r";\s?").alias("chroms"),
            F.split("pos", r";\s?").alias("poss"),
            F.split("context", r";\s?").alias("contexts"),
            F.split("mapped_gene", r";\s?").alias("genes"),
        )
        members = split_cols.select(
            "variant_id", "chroms", "poss", "contexts", "genes",
            F.size("snp_labels").alias("n"),
            F.posexplode("snp_labels").alias("idx", "snp_label"),
        )
        m_curie, m_type = classify_variant("snp_label")
        members = members.withColumn(
            "snp_id",
            # unclassifiable member → labeled digest bnode (GWASCatalog.py:333-339)
            # digest over the RAW split member (make_id(snp, '_'), no strip)
            F.coalesce(m_curie, make_id(F.col("snp_label"), prefix="_")),
        ).withColumn("_mtype", m_type)
        parts.append(
            make_triples(members, "variant_id", F.lit(T.HAS_VARIANT_PART), "snp_id", graph_id=g)
        )
        # bnode members carry their raw label (addLabel(snp_curie, snp) —
        # GWASCatalog.py:338-339,384 — no strip)
        bnode_members = members.filter(F.col("_mtype").isNull() | F.col("snp_id").startswith("_"))
        parts.append(
            make_triples(
                bnode_members, "snp_id", F.lit(T.LABEL), F.col("snp_label"),
                is_literal=True, graph_id=g,
            )
        )
        # member snp details only when the ';'-lists zip congruently (322-351)
        congruent = members.filter(
            (F.size("chroms") == F.col("n")) & (F.size("poss") == F.col("n"))
            & (F.size("contexts") == F.col("n"))
        )
        member_snps = congruent.select(
            "variant_id",
            "snp_id",
            "snp_label",
            F.trim(F.col("chroms")[F.col("idx")]).alias("chrom"),
            F.trim(F.col("poss")[F.col("idx")]).alias("pos"),
            F.trim(F.col("contexts")[F.col("idx")]).alias("context"),
            F.when(F.size("genes") == F.col("n"), F.trim(F.col("genes")[F.col("idx")])).alias("gene_symbol"),
        )
        parts.append(
            self._snp_stanza(
                member_snps.withColumn("raf", F.lit(None).cast("string")), tt, g
            )
        )
        # member affected-locus / directional gene relations via the HGNC dim
        hgnc = self._hgnc_map(spark, raw_dir)
        if hgnc is not None:
            linked = (
                member_snps.filter(F.col("gene_symbol").isNotNull() & (F.col("gene_symbol") != ""))
                .join(F.broadcast(hgnc), "gene_symbol")
            )
            directional = linked.filter(
                F.col("context").isin("upstream_gene_variant", "downstream_gene_variant")
            ).withColumn("rel", tt.resolve("context"))
            parts.append(make_triples(directional, "snp_id", F.col("rel"), "hgnc_id", graph_id=g))
            in_gene_m = linked.filter(F.col("context").isin(list(GENE_VARIANT_CONTEXTS)))
            parts.append(
                make_triples(in_gene_m, "snp_id", F.lit(AFFECTED_LOCUS), "hgnc_id", graph_id=g)
            )
            # hap-level affected locus when every member hit the same gene
            hap_gene = (
                in_gene_m.groupBy("variant_id", "hgnc_id")
                .agg(F.count("*").alias("hits"), F.first("snp_id").alias("_any"))
                .join(
                    members.groupBy("variant_id").agg(F.max("n").alias("n_members")),
                    "variant_id",
                )
                .filter(F.col("hits") == F.col("n_members"))
            )
            parts.append(
                make_triples(hap_gene, "variant_id", F.lit(AFFECTED_LOCUS), "hgnc_id", graph_id=g)
            )

        # ---- variant→trait associations (508-558) ---------------------------
        traits = (
            rows.filter((F.col("trait_uris") != "") & (F.col("trait_uris").isNotNull()))
            .select(
                "variant_id", "pmid", "disease_trait", "initial_sample",
                "replicate_sample", "platform", "pvalue",
                F.split("trait_uris", r",\s*").alias("_uris"),
                F.split(F.coalesce("mapped_trait", F.lit("")), r",\s*").alias("_labels"),
            )
            .select(
                "variant_id", "pmid", "disease_trait", "initial_sample",
                "replicate_sample", "platform", "pvalue", "_labels",
                F.posexplode("_uris").alias("idx", "trait_iri"),
            )
            .select(
                "variant_id", "pmid", "disease_trait", "initial_sample",
                "replicate_sample", "platform", "pvalue",
                F.trim("trait_iri").alias("trait_iri"),
                # F.get: NULL (not ANSI INVALID_ARRAY_INDEX) when MAPPED_TRAIT
                # splits into fewer entries than MAPPED_TRAIT_URI
                F.trim(F.coalesce(F.get("_labels", F.col("idx")), F.lit(""))).alias("trait_label"),
            )
            .filter(F.col("trait_iri") != "")
            .withColumn(
                "trait_id",
                F.regexp_replace("trait_iri", r"^http://www\.ebi\.ac\.uk/efo/EFO_", "EFO:"),
            )
        )
        # study description (_make_description 563-576); null-fold the
        # optional fields so one empty column can't null the whole string
        nn = lambda c: F.coalesce(F.col(c), F.lit(""))  # noqa: E731
        desc = F.concat(F.lit("A study of "), nn("disease_trait"), F.lit(" in "), nn("initial_sample"))
        desc = F.when(
            nn("replicate_sample") != "",
            F.concat(desc, F.lit(" with "), F.col("replicate_sample")),
        ).otherwise(desc)
        desc = F.when(
            nn("platform") != "",
            F.concat(desc, F.lit(" on platform "), F.col("platform")),
        ).otherwise(desc)
        traits = traits.withColumn(
            "description", F.concat(desc, F.lit(" (p="), nn("pvalue"), F.lit(")"))
        ).withColumn("_pred", F.lit(CONTRIBUTES_TO_CONDITION)).withColumn(
            "evidence", F.array(F.lit(COMBINATORIAL_EVIDENCE))
        ).withColumn("sources", F.array("pmid"))

        parts.append(
            association_triples(
                traits, "variant_id", "_pred", "trait_id",
                definedby=self.name, evidence_col="evidence", source_col="sources",
                graph_id=g,
            )
        )
        keyed = with_assoc_id(traits, "variant_id", "_pred", "trait_id", definedby=self.name)
        parts.append(
            make_triples(
                keyed, "assoc_id", F.lit(T.DESCRIPTION), "description",
                is_literal=True, graph_id=g,
            )
        )
        # PMID typed journal article (Reference.addRefToGraph)
        parts.append(
            make_triples(traits, "pmid", F.lit(T.TYPE), F.lit(JOURNAL_ARTICLE), graph_id=g)
        )
        # EFO traits not xref'd in mondo → phenotype class stanza (529-535)
        efo = traits.filter(F.col("trait_id").startswith("EFO:")).select(
            "trait_id", "trait_label"
        ).distinct()
        mondo = self._mondo_xrefs(spark, raw_dir)
        if mondo is not None:
            efo = efo.join(
                F.broadcast(mondo), efo["trait_id"] == mondo["xref"], "left_anti"
            )
        parts.append(
            class_triples(
                efo.withColumn("_parent", F.lit(PHENOTYPE_PARENT)),
                "trait_id", label_col="trait_label", subclass_of_col="_parent",
                graph_id=g,
            )
        )

        return union_graphs(*parts).dropDuplicates(["subject", "predicate", "object"])
