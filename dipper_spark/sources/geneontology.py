"""GeneOntology GAF pipeline (M3): multi-file union, UniProt 1:1 map join,
aspect dispatch, IMP→G2P derivation.

Reference: dipper/sources/GeneOntology.py — GAF scan 289-301, NOT filter
329-330, db localtt fixups + UniProt re-key 332-357, gene label/type/synonyms
360-381, taxon 383-388, aspect resolve via translationtable/go.yaml:3-5 +
contributes_to dispatch 412-425, ref prefix fixups 398-410, IMP-derived G2P
associations 436-492, 1:1 uniprot map build 503-570.

Spark shape: the idmap is a broadcast join (J3) with the 1:1 filter as a
pre-aggregation; per-taxon GAF files union at scan time (U2: one
``read.csv([paths])``); everything else is select/when/explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dipper_spark.core import make_id, make_triples, union_graphs
from dipper_spark.models import g2p_association_triples
from dipper_spark.models.assoc import association_triples, with_assoc_id
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

#: go-style → curie-map-style prefix fixups (translationtable/go.yaml:8-15)
PREFIX_TT = {
    "WB": "WormBase", "WB_REF": "WormBase", "FB": "FlyBase", "Reactome": "REACT",
    "Ensembl": "ENSEMBL", "GOC": "GO_REF", "MGI:MGI": "MGI",
}
#: aspect → relation (go.yaml:3-5 + GLOBAL_TERMS 513-515, BFO part_of)
ASPECT_REL = {"P": "RO:0002331", "F": "RO:0002327", "C": "BFO:0000050"}
CONTRIBUTES_TO = "RO:0002326"
#: GAF evidence-code → ECO (reference loads the GO eco mapping file at
#: GeneOntology.py:256-260; values are the published gaf-eco-mapping defaults)
GAF_ECO = {
    "EXP": "ECO:0000269", "IDA": "ECO:0000314", "IPI": "ECO:0000353",
    "IMP": "ECO:0000315", "IGI": "ECO:0000316", "IEP": "ECO:0000270",
    "ISS": "ECO:0000250", "ISO": "ECO:0000266", "ISA": "ECO:0000247",
    "ISM": "ECO:0000255", "IBA": "ECO:0000318", "IC": "ECO:0000305",
    "TAS": "ECO:0000304", "NAS": "ECO:0000303", "ND": "ECO:0000307",
    "IEA": "ECO:0000501", "HDA": "ECO:0007005", "HMP": "ECO:0007001",
}
GENE = "SO:0000704"
JOURNAL_ARTICLE = "IAO:0000013"
EXP_PHENO_EVIDENCE = "ECO:0000059"  # globaltt['experimental phenotypic evidence']
HAS_GENE_PRODUCT = "RO:0002205"


def _map_lookup(mapping: dict[str, str], col: Column, default: Column) -> Column:
    expr = default
    for k, v in mapping.items():
        expr = F.when(col == k, F.lit(v)).otherwise(expr)
    return expr


@register
class GeneOntologyPipeline(SourcePipeline):
    name = "go"
    files = {
        # per-taxon GAF files land as <raw>/go/*.gaf.gz (U2 multi-file union)
        "gaf": FileContract(file="*.gaf.gz", url="http://current.geneontology.org/annotations/"),
        # UniProtKB → entrez/ensembl idmapping subset (GeneOntology.py:503-570)
        "idmap": FileContract(file="idmapping.tsv.gz", url="ftp://ftp.uniprot.org/.../idmapping_selected.tab.gz"),
    }
    test_ids = ["NCBIGene:50883", "MGI:1915834"]

    def one_to_one_idmap(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """uniprot→gene map keeping only 1:1 mappings (A9; reference keeps ids
        with exactly one target, GeneOntology.py:540-562).  The 1:1-ness check
        is a groupBy count — a partial-agg, no full shuffle of the fact side."""
        m = (
            spark.read.option("sep", "\t").csv(self.path(raw_dir, "idmap"))
            .select(F.col("_c0").alias("uniprot"), F.col("_c1").alias("gene_curie"))
        )
        ones = m.groupBy("uniprot").agg(
            F.count("*").alias("n"), F.first("gene_curie").alias("gene_curie")
        ).filter(F.col("n") == 1).drop("n")
        return ones

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        from dipper_spark.io import read_gaf

        g = self.name
        gaf = read_gaf(spark, self.path(raw_dir, "gaf"), limit=limit)
        gaf = gaf.filter(~F.col("Qualifier").rlike("NOT"))  # GeneOntology.py:329-330

        db = _map_lookup(PREFIX_TT, F.col("DB"), F.col("DB"))
        staged = gaf.withColumn("dbase", db)

        # UniProtKB rows re-keyed through the 1:1 idmap (broadcast join J3);
        # misses DROP the row (GeneOntology.py:345-350) — an inner join on the
        # uniprot branch, union with the non-uniprot branch.
        idmap = broadcast(self.one_to_one_idmap(spark, raw_dir))
        uni = (
            staged.filter(F.col("dbase") == "UniProtKB")
            .join(idmap, F.col("DB_Object_ID") == F.col("uniprot"), "inner")
            .withColumn("gene_id", F.col("gene_curie"))
            .withColumn(
                "mapped_from",
                F.concat(F.lit("UniProtKB:"), F.col("DB_Object_ID")),
            )
            .drop("uniprot", "gene_curie")
        )
        non = (
            staged.filter(F.col("dbase") != "UniProtKB")
            .withColumn(
                "gene_id",
                F.concat_ws(":", F.col("dbase"), F.element_at(F.split("DB_Object_ID", ":"), -1)),
            )
            .withColumn("mapped_from", F.lit(None).cast("string"))
        )
        rows = uni.unionByName(non)
        rows = self.test_filter(rows, "gene_id", test_mode) if test_mode else rows

        rows = (
            rows.withColumn(
                "predicate",
                F.when(
                    (F.col("Aspect") == "F") & F.col("Qualifier").rlike("contributes_to"),
                    F.lit(CONTRIBUTES_TO),
                ).otherwise(_map_lookup(ASPECT_REL, F.col("Aspect"), F.lit(None).cast("string"))),
            )
            .filter(F.col("predicate").isNotNull())
            .withColumn("eco_id", _map_lookup(GAF_ECO, F.col("Evidence_Code"), F.lit(None).cast("string")))
            .withColumn("evidence", F.when(F.col("eco_id").isNotNull(), F.array("eco_id")))
            # ref prefix fixup: next-to-last ':' segment wins (sidesteps
            # 'MGI:MGI:'), localtt-rewritten (GeneOntology.py:398-405)
            .withColumn(
                "refs",
                F.transform(
                    F.filter("refs", lambda r: r != ""),
                    lambda r: F.concat_ws(
                        ":",
                        _map_lookup(
                            PREFIX_TT,
                            F.element_at(F.split(r, ":"), -2),
                            F.element_at(F.split(r, ":"), -2),
                        ),
                        F.element_at(F.split(r, ":"), -1),
                    ),
                ),
            )
        )

        # definedby is the SOURCE name in the id digest (Assoc(graph,
        # self.name), GeneOntology.py:387)
        assoc = association_triples(
            rows, "gene_id", "predicate", "GO_ID",
            evidence_col="evidence", source_col="refs", definedby=g, graph_id=g,
        )

        keyed = with_assoc_id(rows, "gene_id", "predicate", "GO_ID", definedby=g)
        mapped_desc = make_triples(
            keyed.filter(F.col("mapped_from").isNotNull()),
            "assoc_id", F.lit(T.DESCRIPTION),
            F.concat(F.lit("Mapped from "), F.col("mapped_from")),
            is_literal=True, graph_id=g,
        )

        pmids = rows.select(F.explode("refs").alias("ref")).filter(F.col("ref").startswith("PMID:"))
        ref_types = make_triples(pmids, "ref", F.lit(T.TYPE), F.lit(JOURNAL_ARTICLE), graph_id=g)

        gene_facts = union_graphs(
            make_triples(rows, "gene_id", F.lit(T.TYPE), F.lit(GENE), graph_id=g),
            make_triples(
                rows.filter(F.col("DB_Object_Symbol") != ""),
                "gene_id", F.lit(T.LABEL), "DB_Object_Symbol", is_literal=True, graph_id=g,
            ),
            make_triples(
                rows.filter(F.col("DB_Object_Name") != ""),
                "gene_id", F.lit(T.DESCRIPTION), "DB_Object_Name", is_literal=True, graph_id=g,
            ),
            make_triples(
                rows.filter(F.col("taxon") != ""),
                "gene_id", F.lit(T.IN_TAXON), "taxon", graph_id=g,
            ),
        )

        # synonyms: UniProtKB: entries become has-gene-product edges, the rest
        # literal synonyms (GeneOntology.py:366-381)
        syns = (
            rows.filter(F.col("synonyms").isNotNull())
            .select("gene_id", F.explode("synonyms").alias("syn"))
            .withColumn("syn", F.trim("syn"))
            .filter(F.col("syn") != "")
        )
        syn_triples = union_graphs(
            make_triples(
                syns.filter(F.col("syn").startswith("UniProtKB:")),
                "gene_id", F.lit(HAS_GENE_PRODUCT), "syn", is_literal=False, graph_id=g,
            ),
            make_triples(
                syns.filter(~F.col("syn").startswith("UniProtKB:")),
                "gene_id", F.lit(T.HAS_EXACT_SYNONYM), "syn", is_literal=True, graph_id=g,
            ),
        )

        # IMP → G2P derivation (GeneOntology.py:436-492): with/from items
        # (split on | OR , ) become entities with a <GO_ID>PHENOTYPE object;
        # reagent ids (MRPHLNO/CRISPR/TALEN/WBRNAi) become bnode
        # reagent-targeted genes (ZFIN.make_targeted_gene_id ZFIN.py:3085-3091:
        # '_' + sha1 digest of 'gene-reagent' with ZFIN:/: stripped).
        imp = (
            rows.filter((F.col("Evidence_Code") == "IMP") & (F.size(F.filter("with_from", lambda x: x != "")) > 0))
            .select(
                "gene_id", "GO_ID", "refs",
                F.explode(F.split(F.array_join("with_from", "|"), r"[|,]")).alias("itm"),
            )
            .filter(
                (F.col("itm") != "")
                & ~F.col("itm").rlike(r"^(UniProtKB|WBPhenotype|InterPro|HGNC)")
            )
            .withColumn(
                "itm",
                F.concat_ws(
                    ":",
                    _map_lookup(
                        PREFIX_TT,
                        F.element_at(F.split("itm", ":"), -2),
                        F.element_at(F.split("itm", ":"), -2),
                    ),
                    F.element_at(F.split("itm", ":"), -1),
                ),
            )
            .withColumn("phenotype_id", F.concat(F.col("GO_ID"), F.lit("PHENOTYPE")))
            .withColumn(
                "subject_id",
                F.when(
                    F.col("itm").rlike("MRPHLNO|CRISPR|TALEN|WBRNAi"),
                    make_id(
                        F.regexp_replace(F.concat_ws("-", "gene_id", "itm"), r"(ZFIN)?:", ""),
                        prefix="_",
                    ),
                ).otherwise(F.col("itm")),
            )
            .withColumn("evidence", F.array(F.lit(EXP_PHENO_EVIDENCE)))
        )
        imp_assoc = g2p_association_triples(
            imp, "subject_id", "phenotype_id", F.lit("RO:0002200"),
            evidence_col="evidence", source_col="refs", definedby=g, graph_id=g,
        )
        # reagent-targeted gene wiring (Genotype.addReagentTargetedGene):
        # targeted_gene GENO:0000418-affects gene; reagent targets gene
        reagents = imp.filter(F.col("subject_id").startswith("_"))
        reagent_triples = union_graphs(
            make_triples(reagents, "subject_id", F.lit(T.HAS_AFFECTED_FEATURE), "gene_id", graph_id=g),
            make_triples(reagents, "itm", F.lit("GENO:0000414"), "gene_id", graph_id=g),
        )

        return union_graphs(
            assoc, mapped_desc, ref_types, gene_facts, syn_triples, imp_assoc, reagent_triples
        ).dropDuplicates(["subject", "predicate", "object"])
