"""MMRRC pipeline: mutant-mouse strain catalog → allele phenotypes +
unspecified-background genotype partonomy.

Reference behavior: dipper/sources/MMRRC.py:109-426
(``_process_phenotype_data``): per catalog row — holding-center suffix
stripped from strain ids; MG:→MGI: allele-id repair; GeneID:→NCBIGene: and
NULL-scrub on gene ids; ``[MP:nnnnnnn]``-bracketed phenotype ids; strain
individuals typed mouse (or stem-cell when state ES) with research-area
descriptions + clique-leader; allele→MP G2P assocs with PMID sources;
then the per-strain genotype build (311-412): variant loci (digest
``<gene>-VL`` bnodes when only genes are known), indeterminate-zygosity
VSLCs (digest of the colon-scrubbed variant + 'U'), a GVC when several
VSLCs (double digest of the sorted vslc-list repr), an unspecified genomic
background (digest of ``GENO0000649-<strain>``), and the assembled
genotype with ``<gvc>-<bkgd-key>`` id, '<label> [n.s.]', linked from the
strain via has_genotype.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.ids import make_id
from dipper_spark.models import (
    class_triples,
    g2p_association_triples,
    individual_triples,
    reference_triples,
)
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

MOUSE = "NCBITaxon:10090"
STEM_CELL = "CL:0000034"
VARIANT_LOCUS = "GENO:0000002"
ALLELE = "GENO:0000512"
IS_ALLELE_OF = "GENO:0000408"
VSLC = "GENO:0000030"
GVC = "GENO:0000009"
INDETERMINATE = "GENO:0000137"
UNSPECIFIED_BACKGROUND = "GENO:0000649"
INTRINSIC_GENOTYPE = "GENO:0000719"  # globaltt['intrinsic genotype']
HAS_GENOTYPE = "GENO:0000222"
JOURNAL_ARTICLE = "IAO:0000013"

CATALOG_COLUMNS = [
    "STRAIN/STOCK_ID", "STRAIN/STOCK_DESIGNATION", "STRAIN_TYPE", "STATE",
    "MGI_ALLELE_ACCESSION_ID", "ALLELE_SYMBOL", "ALLELE_NAME",
    "MUTATION_TYPE", "CHROMOSOME", "MGI_GENE_ACCESSION_ID", "GENE_SYMBOL",
    "GENE_NAME", "SDS_URL", "ACCEPTED_DATE", "MPT_IDS", "PUBMED_IDS",
    "RESEARCH_AREAS",
]


@register
class MmrrcPipeline(SourcePipeline):
    name = "mmrrc"
    files = {
        "catalog": FileContract(
            file="mmrrc_catalog_data.csv",
            url="https://www.mmrrc.org/about/mmrrc_catalog_data.csv",
            columns=CATALOG_COLUMNS,
        ),
    }
    test_ids = ["MMRRC:037507", "MMRRC:000255"]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        raw = (
            spark.read.option("header", True).option("quote", '"')
            .csv(self.path(raw_dir, "catalog"))
            .toDF(*CATALOG_COLUMNS)
        )
        if limit:
            raw = raw.limit(limit)
        rows = raw.select(
            # MMRRC:00001-UNC → MMRRC:00001 (MMRRC.py:181-184)
            F.regexp_replace(F.trim(F.col("STRAIN/STOCK_ID")), r"-\w+$", "").alias("strain_id"),
            F.col("STRAIN/STOCK_DESIGNATION").alias("strain_label"),
            F.col("STATE").alias("state"),
            # MG: typo repair; otherwise non-MGI ids are dropped (196-203)
            F.when(
                F.trim("MGI_ALLELE_ACCESSION_ID").startswith("MGI:"),
                F.trim("MGI_ALLELE_ACCESSION_ID"),
            ).when(
                F.trim("MGI_ALLELE_ACCESSION_ID").startswith("MG:"),
                F.concat(F.lit("MGI:"), F.expr("substring(trim(MGI_ALLELE_ACCESSION_ID), 4)")),
            ).alias("allele_id"),
            F.col("ALLELE_SYMBOL").alias("allele_symbol"),
            # space-scrub, NULL, GeneID:→NCBIGene: (217-223)
            F.when(
                F.regexp_replace(F.coalesce("MGI_GENE_ACCESSION_ID", F.lit("")), r"\s+", "") == "NULL",
                F.lit(None),
            ).otherwise(
                F.regexp_replace(
                    F.regexp_replace(F.coalesce("MGI_GENE_ACCESSION_ID", F.lit("")), r"\s+", ""),
                    "^GeneID:", "NCBIGene:",
                )
            ).alias("gene_id_raw"),
            F.trim(F.col("GENE_SYMBOL")).alias("gene_symbol"),
            F.col("GENE_NAME").alias("gene_name"),
            F.regexp_extract_all("MPT_IDS", F.lit(r"\[(MP:\d{7})\]"), 1).alias("mp_ids"),
            F.col("PUBMED_IDS").alias("pubmed_raw"),
            F.trim(F.coalesce("RESEARCH_AREAS", F.lit(""))).alias("research_areas"),
        ).filter(F.coalesce(F.col("gene_name"), F.lit("")) != "withdrawn")
        rows = self.test_filter(rows, "strain_id", test_mode)
        rows = rows.withColumn(
            "gene_id", F.when(F.col("gene_id_raw") != "", F.col("gene_id_raw"))
        ).withColumn(
            "pubmed_ids",
            F.when(
                F.trim(F.coalesce("pubmed_raw", F.lit(""))) != "",
                F.transform(F.split("pubmed_raw", ","), lambda x: F.regexp_replace(x, " ", "")),
            ),
        ).withColumn(
            "strain_type",
            F.when(F.col("state") == "ES", F.lit(STEM_CELL)).otherwise(F.lit(MOUSE)),
        ).withColumn(
            "descr",
            F.when(
                F.col("research_areas") != "",
                F.concat(F.lit("Research Areas: "), "research_areas"),
            ),
        )

        strains = rows.select("strain_id", "strain_label", "strain_type", "descr").distinct()
        pmids = rows.select(F.explode(F.coalesce("pubmed_ids", F.array())).alias("pmid")).distinct()
        # the MP class is declared for EVERY parsed phenotype id, even when
        # the row has no allele to hang the association on (MMRRC.py:282-299)
        all_mps = rows.select(F.explode("mp_ids").alias("mp_id")).distinct()
        phenos = (
            rows.filter(F.col("allele_id").isNotNull())
            .select("allele_id", "pubmed_ids", F.explode("mp_ids").alias("mp_id"))
            .withColumn("source", F.col("pubmed_ids"))
        )

        # ---- per-strain genotype partonomy (MMRRC.py:311-412) --------------
        sv = rows.filter(F.col("allele_id").isNotNull()).select(
            "strain_id", F.col("allele_id").alias("vl"), F.col("allele_symbol").alias("vl_symbol")
        ).distinct()
        sg = rows.filter(F.col("gene_id").isNotNull()).select(
            "strain_id", "gene_id", "gene_symbol"
        ).distinct()
        counts = (
            sv.groupBy("strain_id").agg(F.count(F.lit(1)).alias("n_var"))
            .join(sg.groupBy("strain_id").agg(F.count(F.lit(1)).alias("n_gene")), "strain_id", "outer")
            .fillna(0, ["n_var", "n_gene"])
        )
        with_vars = sv.join(F.broadcast(counts), "strain_id")
        one_to_one = (
            with_vars.filter((F.col("n_var") == 1) & (F.col("n_gene") == 1))
            .join(sg, "strain_id")
        )
        # strains with genes but no variants mint anonymous '<gene>-VL' loci
        no_vars = (
            sg.join(counts.filter(F.col("n_var") == 0).select("strain_id"), "strain_id")
            .withColumn(
                "vl",
                make_id(F.concat(F.regexp_replace("gene_id", ":", ""), F.lit("-VL")), prefix="_"),
            )
            .withColumn("vl_symbol", F.concat("gene_symbol", F.lit("<?>")))
        )
        vls = with_vars.select("strain_id", "vl", "vl_symbol").unionByName(
            no_vars.select("strain_id", "vl", "vl_symbol")
        )
        vslcs = vls.withColumn(
            "vslc_id",
            make_id(
                F.concat(
                    F.regexp_replace(F.regexp_replace("vl", "^_", ""), ":", ""),
                    F.lit("U"),
                ),
                prefix="_",
            ),
        ).withColumn("vslc_label", F.concat("vl_symbol", F.lit("/?")))

        grouped = vslcs.groupBy("strain_id").agg(
            F.sort_array(F.collect_list(F.struct("vl", "vslc_id", "vslc_label"))).alias("parts")
        )
        multi = grouped.filter(F.size("parts") > 1).withColumn(
            # double digest of the python-list repr of the vslc ids (389-392)
            "gvc_key",
            F.concat(
                F.lit("['"),
                F.array_join(F.transform("parts", lambda p: p["vslc_id"]), "', '"),
                F.lit("']"),
            ),
        ).withColumn(
            "gvc_id",
            make_id(F.regexp_replace(make_id("gvc_key", prefix="_"), "_|:", ""), prefix="_"),
        ).withColumn(
            "gvc_label",
            F.array_join(F.transform("parts", lambda p: p["vslc_label"]), "; "),
        )
        single = grouped.filter(F.size("parts") == 1).select(
            "strain_id",
            F.get("parts", 0)["vslc_id"].alias("gvc_id"),
            F.get("parts", 0)["vslc_label"].alias("gvc_label"),
            "parts",
        )
        gvcs = multi.select("strain_id", "gvc_id", "gvc_label", "parts").unionByName(single)
        genotypes = gvcs.withColumn(
            "bkgd_key",
            F.regexp_replace(
                F.concat_ws("-", F.lit(UNSPECIFIED_BACKGROUND), "strain_id"), ":", ""
            ),
        ).withColumn("genotype_id", F.concat_ws("-", "gvc_id", "bkgd_key")).withColumn(
            "bkgd_id", make_id("bkgd_key", prefix="_")
        ).withColumn("genotype_label", F.concat("gvc_label", F.lit(" [n.s.]"))).withColumn(
            "bkgd_label", F.concat(F.lit("unspecified ("), "strain_id", F.lit(")"))
        ).withColumn(
            "bkgd_descr",
            F.concat(
                F.lit("A placeholder for the unspecified genetic background for "),
                "strain_id",
            ),
        )

        return union_graphs(
            # strain individuals + leadership (MMRRC.py:267-279)
            individual_triples(strains, "strain_id", F.col("strain_type"),
                               label_col="strain_label", graph_id=g),
            make_triples(
                strains.filter(F.col("descr").isNotNull()),
                "strain_id", F.lit(T.DESCRIPTION), "descr", is_literal=True, graph_id=g,
            ),
            make_triples(
                strains, "strain_id", F.lit(T.CLIQUE_LEADER), F.lit("true"),
                is_literal=True, datatype="xsd:boolean", graph_id=g,
            ),
            reference_triples(pmids, "pmid", type_col=JOURNAL_ARTICLE, graph_id=g),
            class_triples(all_mps, "mp_id", graph_id=g),
            g2p_association_triples(
                phenos, "allele_id", "mp_id", F.lit("RO:0002200"),
                source_col="source", definedby=g, graph_id=g,
            ),
            # the mouse taxon class is (re)declared every row (MMRRC.py:265)
            class_triples(
                strains.select(F.lit(MOUSE).alias("taxon")).limit(1), "taxon", graph_id=g
            ),
            # variant loci (+ allele-of when the strain is 1 variant : 1 gene)
            individual_triples(vls, "vl", F.lit(VARIANT_LOCUS), label_col="vl_symbol", graph_id=g),
            make_triples(one_to_one, "vl", F.lit(IS_ALLELE_OF), "gene_id", is_literal=False, graph_id=g),
            # multi-locus strains re-add each variant with the DEFAULT
            # allele typing (the bare addAllele on the else branch,
            # MMRRC.py:328-329 → Genotype.py:73-77)
            make_triples(
                with_vars.filter(~((F.col("n_var") == 1) & (F.col("n_gene") == 1))),
                "vl", F.lit(T.TYPE), F.lit(ALLELE), is_literal=False, graph_id=g,
            ),
            # addGene: class + label + subClassOf gene (Genotype.py:80-88)
            class_triples(no_vars.select("gene_id", "gene_symbol").distinct(),
                          "gene_id", label_col="gene_symbol", graph_id=g),
            make_triples(
                no_vars.select("gene_id").distinct(),
                "gene_id", F.lit(T.SUBCLASS_OF), F.lit("SO:0000704"),
                is_literal=False, graph_id=g,
            ),
            make_triples(no_vars, "vl", F.lit(IS_ALLELE_OF), "gene_id", is_literal=False, graph_id=g),
            # indeterminate-zygosity VSLCs
            individual_triples(vslcs, "vslc_id", F.lit(VSLC), label_col="vslc_label", graph_id=g),
            make_triples(vslcs, "vslc_id", F.lit(T.HAS_VARIANT_PART), "vl", is_literal=False, graph_id=g),
            make_triples(vslcs, "vslc_id", F.lit(T.HAS_ZYGOSITY), F.lit(INDETERMINATE), is_literal=False, graph_id=g),
            # GVC for multi-locus strains
            individual_triples(multi, "gvc_id", F.lit(GVC), label_col="gvc_label", graph_id=g),
            make_triples(
                multi.select("gvc_id", F.explode("parts").alias("p"))
                .select("gvc_id", F.col("p.vslc_id").alias("vslc_id")),
                "gvc_id", F.lit(T.HAS_VARIANT_PART), "vslc_id", is_literal=False, graph_id=g,
            ),
            # genotype + unspecified background
            individual_triples(genotypes, "bkgd_id", F.lit(UNSPECIFIED_BACKGROUND),
                               label_col="bkgd_label", graph_id=g),
            make_triples(genotypes, "bkgd_id", F.lit(T.DESCRIPTION), "bkgd_descr", is_literal=True, graph_id=g),
            make_triples(genotypes, "bkgd_id", F.lit(T.IN_TAXON), F.lit(MOUSE), is_literal=False, graph_id=g),
            individual_triples(genotypes, "genotype_id", F.lit(INTRINSIC_GENOTYPE),
                               label_col="genotype_label", graph_id=g),
            make_triples(genotypes, "genotype_id", F.lit(T.HAS_REFERENCE_PART), "bkgd_id", is_literal=False, graph_id=g),
            make_triples(genotypes, "genotype_id", F.lit(T.HAS_VARIANT_PART), "gvc_id", is_literal=False, graph_id=g),
            make_triples(genotypes, "strain_id", F.lit(HAS_GENOTYPE), "genotype_id", is_literal=False, graph_id=g),
        ).dropDuplicates(["subject", "predicate", "object"])
