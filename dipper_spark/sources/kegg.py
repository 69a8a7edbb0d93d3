"""KEGG pipeline: pathways, diseases, human genes, orthology classes,
NCBI reconciliation, pathway annotations, OMIM reconciliation (1:1 gate).

Reference behavior: dipper/sources/KEGG.py — every pass the reference's
``parse()`` (KEGG.py:126-151) actually runs:
``_process_pathways`` 155-198 (pathway class + GO/PW typing + depiction),
``_process_genes_kegg2ncbi`` 636-688 (NCBIGene equivalence),
``_process_pathway_pubmed`` 689-721 (PMID is-about pathway),
``_process_pathway_disease`` 722-761 (causally-upstream-of-or-within),
``_process_diseases`` 200-244, ``_process_genes`` 245-340 (first symbol =
label, rest synonyms, long name = definition),
``_process_omim2disease`` 560-635 (keep only OMIM↔KEGG disease pairs that
are 1:1 IN BOTH DIRECTIONS), ``_process_pathway_ko`` 762-791 (ortholog →
pathway through a gene-product bnode), ``_process_ortholog_classes``
325-391 (gene-family classes w/ synonyms + EC xrefs).
``_process_omim2gene`` 466-560 is DISABLED in the reference's parse()
(commented at KEGG.py:147) but kept available here, matching its
equivalent/reverse/original link-type dispatch and
``_make_variant_locus_id`` 791-824 ('MONARCH:'-digest alt locus labeled
'some variant of X', annotated is_anonymous).

Spark-first: the reference's two direction-hashes + post-pass is the A9
1:1-ness check done relationally — ``groupBy(key).count() == 1`` on each
side, semi-joined back (J11); the label_hash probes are broadcast joins of
the disease/gene label dims; every pass is a narrow select over one
contract-checked scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.ids import make_id
from dipper_spark.models import class_triples, g2p_association_triples, individual_triples, pairwise_triples
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

GENE = "SO:0000704"
VARIANT_LOCUS = "GENO:0000002"
HAS_AFFECTED_LOCUS = "GENO:0000418"
IS_MARKER_FOR = "RO:0002607"
CELLULAR_PROCESS = "GO:0009987"       # globaltt['cellular_process']
PATHWAY = "PW:0000001"                # globaltt['pathway']
DEPICTION = "foaf:depiction"
IS_ABOUT = "IAO:0000136"
JOURNAL_ARTICLE = "IAO:0000013"
CAUSAL_UPSTREAM = "RO:0002418"        # causally upstream of or within
GENE_PRODUCT = "CHEBI:33695"
HAS_GENE_PRODUCT = "RO:0002205"
INVOLVED_IN = "RO:0002331"
GENE_FAMILY = "EDAM-DATA:3148"
IS_ANONYMOUS = "MONARCH:anonymous"


@register
class KeggPipeline(SourcePipeline):
    name = "kegg"
    files = {
        "disease": FileContract(
            file="disease", url="http://rest.genome.jp/list/disease",
            columns=["disease_id", "disease_name"],
        ),
        "hsa_genes": FileContract(
            file="hsa_genes", url="http://rest.genome.jp/list/hsa",
            columns=["gene_id", "gene_name"],
        ),
        "omim2gene": FileContract(
            file="omim2gene", url="http://rest.genome.jp/link/omim/hsa",
            columns=["kegg_gene_id", "omim_id", "link_type"],
        ),
        "omim": FileContract(
            file="omim2disease", url="http://rest.genome.jp/link/omim/ds",
            columns=["omim_disease_id", "kegg_disease_id", "link_type"],
        ),
        "pathway": FileContract(
            file="pathway", url="http://rest.genome.jp/list/pathway",
            columns=["pathway_id", "pathway_name"],
        ),
        "ortholog_classes": FileContract(
            file="ortholog_classes", url="http://rest.genome.jp/list/orthology",
            columns=["orthology_class_id", "orthology_class_name"],
        ),
        "ncbi": FileContract(
            file="ncbi", url="http://rest.genome.jp/conv/ncbi-geneid/hsa",
            columns=["kegg_gene_id", "ncbi_gene_id", "link_type"],
        ),
        "pubmed": FileContract(
            file="pubmed", url="http://rest.kegg.jp/link/pathway/pubmed",
            columns=["pubmed_id", "kegg_pathway_num"],
        ),
        "ds": FileContract(
            file="ds", url="http://rest.kegg.jp/link/pathway/ds",
            columns=["disease_id", "kegg_pathway_num"],
        ),
        "ko": FileContract(
            file="ko", url="http://rest.kegg.jp/link/pathway/ko",
            columns=["ko_id", "pathway_id"],
        ),
    }
    test_ids = ["KEGG-ds:H00021", "KEGG-hsa:100", "KEGG-path:map04130"]

    def _read(self, spark: SparkSession, raw_dir: str, key: str) -> DataFrame:
        cols = self.files[key].columns
        schema = " ".join(f"`{c}` string," for c in cols).rstrip(",")
        return (
            spark.read.option("sep", "\t").option("encoding", "ISO-8859-1")
            .schema(schema).csv(self.path(raw_dir, key))
        )

    def disease_labels(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        return self._read(spark, raw_dir, "disease").select(
            F.concat(F.lit("KEGG-"), F.trim("disease_id")).alias("disease_id"),
            F.col("disease_name").alias("disease_label"),
        )

    def gene_rows(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """First comma-symbol = label, rest = synonyms, ';'-part 2 =
        definition (KEGG.py:290-340)."""
        g = self._read(spark, raw_dir, "hsa_genes").select(
            F.concat(F.lit("KEGG-"), F.trim("gene_id")).alias("gene_id"),
            F.col("gene_name").alias("raw_name"),
        )
        parts = F.split("raw_name", ";")
        symbols = F.split(F.trim(F.get(parts, 0)), ",\\s*")
        return (
            g.withColumn("label", F.get(symbols, 0))
            .withColumn("synonyms", F.when(F.size(symbols) > 1, F.slice(symbols, 2, 1000)))
            .withColumn("definition", F.trim(F.get(parts, 1)))
        )

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        diseases = self.disease_labels(spark, raw_dir)
        genes = self.gene_rows(spark, raw_dir)
        if limit:
            diseases, genes = diseases.limit(limit), genes.limit(limit)

        parts = [
            class_triples(diseases, "disease_id", "disease_label", graph_id=g),
            class_triples(genes, "gene_id", "label", graph_id=g),
            make_triples(genes, "gene_id", F.lit(T.TYPE), F.lit(GENE), graph_id=g),
            make_triples(
                genes.filter(F.col("definition").isNotNull() & (F.col("definition") != "")),
                "gene_id", F.lit(T.DEFINITION), "definition", is_literal=True, graph_id=g,
            ),
        ]
        syn = genes.filter(F.col("synonyms").isNotNull()).select(
            "gene_id", F.explode("synonyms").alias("syn")
        ).filter(F.col("syn") != "")
        parts.append(
            make_triples(syn, "gene_id", F.lit(T.HAS_RELATED_SYNONYM), "syn", is_literal=True, graph_id=g)
        )

        # ---- omim2gene dispatch (KEGG.py:466-560) --------------------------
        o2g = self._read(spark, raw_dir, "omim2gene").select(
            F.concat(F.lit("KEGG-"), F.trim("kegg_gene_id")).alias("kegg_gene_id"),
            F.regexp_replace(F.trim("omim_id"), "omim", "OMIM").alias("omim_id"),
            F.trim("link_type").alias("link_type"),
        )
        equiv = o2g.filter(F.col("link_type") == "equivalent")
        parts += [
            class_triples(equiv, "omim_id", graph_id=g),
            pairwise_triples(equiv, "kegg_gene_id", "omim_id", T.EQUIVALENT_CLASS, graph_id=g),
        ]
        # reverse links: anonymous variant locus between gene and disease.
        # the alt locus id is a 'MONARCH:'-prefixed digest (reference
        # _make_variant_locus_id calls make_id with the DEFAULT prefix,
        # KEGG.py:806-808) and is annotated is_anonymous (Model.
        # addBlankNodeAnnotation, the reference's pseudo-bnode marker)
        rev = (
            o2g.filter(F.col("link_type") == "reverse")
            .join(
                F.broadcast(genes.select(F.col("gene_id").alias("kegg_gene_id"), "label")),
                "kegg_gene_id", "left",
            )
            .withColumn(
                "alt_locus_id",
                make_id(
                    F.concat_ws(
                        "-",
                        F.regexp_replace("kegg_gene_id", ":", ""),
                        F.regexp_replace("omim_id", ":", ""),
                        F.lit("VL"),
                    ),
                ),
            )
            .withColumn(
                "alt_label",
                F.when(
                    F.col("label").isNotNull(),
                    F.concat(F.lit("some variant of "), F.col("label")),
                ),
            )
            .withColumn("predicate", F.lit(IS_MARKER_FOR))
        )
        parts += [
            individual_triples(rev, "alt_locus_id", F.lit(VARIANT_LOCUS), label_col="alt_label", graph_id=g),
            make_triples(rev, "alt_locus_id", F.lit(HAS_AFFECTED_LOCUS), "kegg_gene_id", graph_id=g),
            make_triples(
                rev, "alt_locus_id", F.lit(IS_ANONYMOUS), F.lit("true"),
                is_literal=True, datatype="xsd:boolean", graph_id=g,
            ),
            g2p_association_triples(
                rev, "alt_locus_id", "omim_id", "predicate", definedby=self.name, graph_id=g
            ),
        ]
        # 'original' links skipped (KEGG.py:548-552)

        # ---- pathways (KEGG.py:155-198 + models/Pathway.addPathway) --------
        pw = self._read(spark, raw_dir, "pathway").select(
            F.concat(F.lit("KEGG-"), F.trim("pathway_id")).alias("pathway_id"),
            F.col("pathway_name").alias("pathway_label"),
        )
        pw = self.test_filter(pw, "pathway_id", test_mode)
        image_url = F.concat(
            F.lit("http://www.genome.jp/kegg/pathway/map/"),
            F.regexp_replace("pathway_id", "KEGG-path:", ""),
            F.lit(".png"),
        )
        parts += [
            class_triples(pw, "pathway_id", "pathway_label", graph_id=g),
            make_triples(pw, "pathway_id", F.lit(T.SUBCLASS_OF), F.lit(CELLULAR_PROCESS), graph_id=g),
            make_triples(pw, "pathway_id", F.lit(T.SUBCLASS_OF), F.lit(PATHWAY), graph_id=g),
            make_triples(pw, "pathway_id", F.lit(DEPICTION), image_url, graph_id=g),
        ]

        # ---- KEGG gene ↔ NCBI gene equivalence (KEGG.py:636-688) -----------
        ncbi = self._read(spark, raw_dir, "ncbi").select(
            F.concat(F.lit("KEGG-"), F.trim("kegg_gene_id")).alias("kegg_gene_id"),
            F.regexp_replace(F.trim("ncbi_gene_id"), "ncbi-geneid", "NCBIGene").alias("ncbi_gene_id"),
        )
        parts += [
            class_triples(ncbi, "kegg_gene_id", graph_id=g),
            class_triples(ncbi, "ncbi_gene_id", graph_id=g),
            pairwise_triples(ncbi, "kegg_gene_id", "ncbi_gene_id", T.EQUIVALENT_CLASS, graph_id=g),
        ]

        # ---- pathway ← pubmed (KEGG.py:689-721) ----------------------------
        pub = self._read(spark, raw_dir, "pubmed").select(
            F.upper(F.trim("pubmed_id")).alias("pmid"),
            F.concat(F.lit("KEGG-"), F.trim("kegg_pathway_num")).alias("pathway_id"),
        )
        parts += [
            make_triples(pub, "pmid", F.lit(T.TYPE), F.lit(JOURNAL_ARTICLE), graph_id=g),
            make_triples(pub, "pmid", F.lit(IS_ABOUT), "pathway_id", graph_id=g),
        ]

        # ---- pathway → disease (KEGG.py:722-761) ---------------------------
        pds = self._read(spark, raw_dir, "ds").select(
            F.concat(F.lit("KEGG-"), F.trim("disease_id")).alias("disease_id"),
            F.concat(F.lit("KEGG-"), F.trim("kegg_pathway_num")).alias("pathway_id"),
        )
        parts.append(
            make_triples(pds, "pathway_id", F.lit(CAUSAL_UPSTREAM), "disease_id", graph_id=g)
        )

        # ---- ortholog class → pathway via gene-product bnode ---------------
        # (KEGG.py:762-791 + Pathway.addGeneToPathway: the bnode digest is
        # sha1 of the colon-stripped gene id + 'product'; its rdfs:label
        # triple carries the PATHWAY ID as an IRI object — mirrored exactly)
        ko = self._read(spark, raw_dir, "ko").select(
            F.concat(F.lit("KEGG-"), F.trim("ko_id")).alias("ko_id"),
            F.concat(F.lit("KEGG-"), F.trim("pathway_id")).alias("pathway_id"),
        ).withColumn(
            "gene_product",
            make_id(
                F.concat(F.regexp_replace("ko_id", ":", ""), F.lit("product")),
                prefix="_",
            ),
        )
        parts += [
            make_triples(ko, "gene_product", F.lit(T.TYPE), F.lit(GENE_PRODUCT), graph_id=g),
            make_triples(ko, "gene_product", F.lit(T.LABEL), "pathway_id", is_literal=False, graph_id=g),
            make_triples(ko, "ko_id", F.lit(HAS_GENE_PRODUCT), "gene_product", graph_id=g),
            make_triples(ko, "gene_product", F.lit(INVOLVED_IN), "pathway_id", graph_id=g),
        ]

        # ---- ortholog classes (KEGG.py:325-391) ----------------------------
        oc = self._read(spark, raw_dir, "ortholog_classes").select(
            F.concat(F.lit("KEGG-"), F.trim("orthology_class_id")).alias("oc_id"),
            F.col("orthology_class_name").alias("oc_name"),
        )
        oc_parts = F.split("oc_name", "[;,]")
        oc = (
            oc.withColumn("oc_label", F.get(oc_parts, 0))
            .withColumn("_n", F.size(oc_parts))
            .withColumn("oc_desc", F.trim(F.element_at(oc_parts, -1)))
        )
        multi = oc.filter(F.col("_n") > 1)
        parts += [
            class_triples(oc, "oc_id", "oc_label", graph_id=g),
            make_triples(oc, "oc_id", F.lit(T.SUBCLASS_OF), F.lit(GENE_FAMILY), graph_id=g),
            # EVERY split part (including the label itself) becomes an exact
            # synonym when the name has >1 part (the reference's 'todo skip
            # the first' comment documents this as shipped behavior)
            make_triples(
                multi.select("oc_id", F.explode(oc_parts).alias("syn"))
                .withColumn("syn", F.trim("syn")).filter(F.col("syn") != ""),
                "oc_id", F.lit(T.HAS_EXACT_SYNONYM), "syn", is_literal=True, graph_id=g,
            ),
            make_triples(multi, "oc_id", F.lit(T.DESCRIPTION), "oc_desc", is_literal=True, graph_id=g),
            # embedded enzyme-commission numbers → xrefs (EC:1.10.3.-)
            make_triples(
                multi.select(
                    "oc_id",
                    F.explode(
                        F.regexp_extract_all("oc_desc", F.lit(r"((?:\d+|\.|-){5,7})"), F.lit(1))
                    ).alias("ec"),
                ),
                "oc_id", F.lit(T.HAS_DBXREF), F.concat(F.lit("EC:"), F.col("ec")), graph_id=g,
            ),
        ]

        # ---- omim2disease 1:1 reconciliation (KEGG.py:560-635) -------------
        o2d = self._read(spark, raw_dir, "omim").select(
            F.regexp_replace(F.trim("omim_disease_id"), "omim", "OMIM").alias("omim_disease_id"),
            F.concat(F.lit("KEGG-"), F.trim("kegg_disease_id")).alias("kegg_disease_id"),
        ).dropDuplicates()
        # 1:1 in BOTH directions: A9 as groupBy-count semi-joins
        uniq_omim = Window.partitionBy("omim_disease_id")
        uniq_kegg = Window.partitionBy("kegg_disease_id")
        one2one = (
            o2d.withColumn("_n_kegg", F.count(F.lit(1)).over(uniq_omim))
            .withColumn("_n_omim", F.count(F.lit(1)).over(uniq_kegg))
            .filter((F.col("_n_kegg") == 1) & (F.col("_n_omim") == 1))
        )
        parts += [
            class_triples(one2one, "kegg_disease_id", graph_id=g),
            class_triples(one2one, "omim_disease_id", graph_id=g),
            pairwise_triples(one2one, "kegg_disease_id", "omim_disease_id", T.EQUIVALENT_CLASS, graph_id=g),
        ]

        return union_graphs(*parts).dropDuplicates(["subject", "predicate", "object"])
