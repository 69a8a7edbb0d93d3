"""Orphanet disease→gene pipeline (en_product6 disorder XML).

Reference behavior: dipper/sources/Orphanet.py:76-260
(``_process_diseasegene``): streamed Disorder stanzas, per-association gene
clique with a preferred-representative choice (HGNC > ENSEMBL > SwissProt >
OMIM > first remaining), remaining clique members as equivalentClass xrefs,
gene synonyms, association-type → RO predicate and status → ECO via the
orphanet localtt, reified G2P associations.

Spark-first: the XML stanza scan (io.read_xml_stanzas, S4) produces one
nested row per Disorder with an ArrayType of association structs; everything
downstream — explode, preferred-gene coalesce over a MapType, clique
filtering — is column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import association_triples, class_triples, pairwise_triples
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

#: Source element → curie prefix (orphanet.yaml "matching curie_map case")
PREFIX_REWRITES = {"Ensembl": "ENSEMBL", "Reactome": "REACT"}
PREFERRED = ["HGNC", "ENSEMBL", "SwissProt", "OMIM"]

#: DisorderGeneAssociationType/Name → RO predicate (orphanet.yaml ∘ GLOBAL_TERMS)
REL_ID = {
    "Biomarker tested in": "RO:0002607",
    "Candidate gene tested in": "RO:0002607",
    "Disease-causing germline mutation(s) (gain of function) in": "RO:0004011",
    "Disease-causing germline mutation(s) in": "RO:0004013",
    "Disease-causing germline mutation(s) (loss of function) in": "RO:0004012",
    "Disease-causing somatic mutation(s) in": "RO:0004014",
    "Major susceptibility factor in": "RO:0004015",
    "Modifying germline mutation in": "RO:0004016",
    "Part of a fusion gene in": "RO:0003304",
    "Role in the phenotype of": "RO:0003304",
}
ECO_ID = {"Assessed": "ECO:0000322", "Not yet assessed": "ECO:0000323"}

ASSOC_SCHEMA = StructType(
    [
        StructField("gene_refs", MapType(StringType(), StringType())),
        StructField("synonyms", ArrayType(StringType())),
        StructField("dg_type", StringType()),
        StructField("status", StringType()),
    ]
)
DISORDER_SCHEMA = StructType(
    [
        StructField("orphanumber", StringType()),
        StructField("label", StringType()),
        StructField("assocs", ArrayType(ASSOC_SCHEMA)),
    ]
)


def _parse_disorder(elem) -> dict | None:
    """One <Disorder> stanza → nested row (Orphanet.py:91-226 field walk).
    Handles both release spellings of the disorder id element (OrphaCode in
    current product6, OrphaNumber in older releases / the reference's own
    test fixtures)."""
    orphanumber = elem.findtext("OrphaCode") or elem.findtext("OrphaNumber")
    if orphanumber is None:
        return None
    assocs = []
    assoc_list = elem.find("DisorderGeneAssociationList")
    for assoc in assoc_list.findall("DisorderGeneAssociation") if assoc_list is not None else []:
        gene = assoc.find("Gene")
        refs = {}
        for ref in gene.findall("./ExternalReferenceList/ExternalReference"):
            prefix = ref.findtext("Source")
            refs[PREFIX_REWRITES.get(prefix, prefix)] = ref.findtext("Reference")
        # the gene's own Orphanet number backstops the clique (the
        # reference goldens key fallback genes and equivalent-class edges
        # on it; tests/resources/orphanet/orph-germline*.xml)
        gene_orpha = gene.findtext("OrphaCode") or gene.findtext("OrphaNumber")
        if gene_orpha:
            refs.setdefault("ORPHA", gene_orpha)
        syns = [
            s.text
            for s in gene.findall("./SynonymList/Synonym")
            if s is not None and s.text
        ]
        assocs.append(
            {
                "gene_refs": refs,
                "synonyms": syns,
                "dg_type": assoc.findtext("./DisorderGeneAssociationType/Name"),
                "status": assoc.findtext("./DisorderGeneAssociationStatus/Name"),
            }
        )
    return {
        "orphanumber": orphanumber,
        "label": elem.findtext("Name"),
        "assocs": assocs,
    }


@register
class OrphanetPipeline(SourcePipeline):
    name = "orphanet"
    files = {
        "disease-gene": FileContract(
            file="en_product6.xml",
            url="http://www.orphadata.org/data/xml/en_product6.xml",
            columns=["orphanumber", "label", "assocs"],
        ),
    }
    test_ids = ["ORPHA:93400", "ORPHA:79474"]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        from dipper_spark.io.readers import read_xml_stanzas

        g = self.name
        stanzas = read_xml_stanzas(
            spark, [self.path(raw_dir, "disease-gene")], "Disorder",
            _parse_disorder, DISORDER_SCHEMA,
        ).filter(F.col("_corrupt_record").isNull())
        disorders = stanzas.withColumn(
            "disorder_curie", F.concat(F.lit("ORPHA:"), F.col("orphanumber"))
        )
        disorders = self.test_filter(disorders, "disorder_curie", test_mode)
        if limit:
            disorders = disorders.limit(limit)

        rows = (
            disorders.select("disorder_curie", F.explode("assocs").alias("a"))
            .select(
                "disorder_curie",
                F.col("a.gene_refs").alias("gene_refs"),
                F.col("a.synonyms").alias("synonyms"),
                F.col("a.dg_type").alias("dg_type"),
                F.col("a.status").alias("status"),
            )
            .filter(F.size("gene_refs") > 0)
            # preferred representative: first hit in the priority order, else
            # the gene's own ORPHA number, else whatever the map yields first
            # (Orphanet.py:151-166; only PREFERRED-chosen representatives are
            # typed owl:Class — the goldens leave fallback genes untyped)
            .withColumn(
                "preferred_curie",
                F.coalesce(
                    *[
                        F.when(
                            F.element_at("gene_refs", p).isNotNull(),
                            F.concat_ws(":", F.lit(p), F.element_at("gene_refs", p)),
                        )
                        for p in PREFERRED
                    ],
                ),
            )
            .withColumn(
                "gene_curie",
                F.coalesce(
                    "preferred_curie",
                    F.when(
                        F.element_at("gene_refs", "ORPHA").isNotNull(),
                        F.concat_ws(":", F.lit("ORPHA"), F.element_at("gene_refs", "ORPHA")),
                    ),
                    F.concat_ws(
                        ":",
                        F.element_at(F.map_keys("gene_refs"), 1),
                        F.element_at(F.map_values("gene_refs"), 1),
                    ),
                ),
            )
            .withColumn(
                "predicate",
                F.element_at(F.create_map(*[F.lit(x) for kv in REL_ID.items() for x in kv]), F.col("dg_type")),
            )
            .withColumn(
                "eco_id",
                F.element_at(F.create_map(*[F.lit(x) for kv in ECO_ID.items() for x in kv]), F.col("status")),
            )
            .withColumn("evidence", F.when(F.col("eco_id").isNotNull(), F.array("eco_id")))
            .filter(F.col("predicate").isNotNull())
        )

        # remaining clique members → equivalentClass on the representative
        xrefs = (
            rows.select("gene_curie", F.explode("gene_refs").alias("prefix", "lclid"))
            .withColumn("dbxref", F.concat_ws(":", "prefix", "lclid"))
            .filter(F.col("dbxref") != F.col("gene_curie"))
        )
        syns = rows.select("gene_curie", F.explode("synonyms").alias("syn"))

        return union_graphs(
            class_triples(
                disorders.select("disorder_curie", "label"), "disorder_curie", "label", graph_id=g
            ),
            class_triples(
                rows.filter(F.col("preferred_curie").isNotNull()), "gene_curie", graph_id=g
            ),
            class_triples(xrefs, "dbxref", graph_id=g),
            pairwise_triples(xrefs, "gene_curie", "dbxref", T.EQUIVALENT_CLASS, graph_id=g),
            make_triples(syns, "gene_curie", F.lit(T.HAS_EXACT_SYNONYM), "syn", is_literal=True, graph_id=g),
            association_triples(
                rows, "gene_curie", "predicate", "disorder_curie",
                evidence_col="evidence", definedby=self.name, graph_id=g,
            ),
        ).dropDuplicates(["subject", "predicate", "object"])
