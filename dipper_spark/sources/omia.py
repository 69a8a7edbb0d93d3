"""OMIA pipeline: the mysql-dump-XML table walker source.

Reference behavior: dipper/sources/OMIA.py —
three iterparse passes over ``omia.xml.gz`` routed through
``Source.process_xml_table`` (Source.py:497-529): species (OMIA.py:213-224),
classes (breeds/articles/genes/groups/phenes/omim-xrefs, OMIA.py:233-260),
associations (article-breed/article-phene/breed-phene/lida/phene-gene/
group-MPO, OMIA.py:266-290); control-character scrub OMIA.py:178-209;
OMIA→OMIM model-of links filtered to phenotype-typed OMIM entries
(clean_up_omim_genes, OMIA.py:719-760).

Spark-first: ONE streaming scan (io.read_mysqldump_xml) emits every table's
rows tagged by table name; the per-table frames are map-projections over the
cached long frame, and every reference driver-side dict (label_hash, id_hash,
omia_omim_map) becomes a broadcast-joined dimension.  The NCBI gene_group
orthology the reference bolts on here (OMIA.py:171-172) lives in the
ncbigene pipeline, where that file's scan already exists.

Known reference divergence: ``_process_article_phene_row`` (OMIA.py:563-570)
short-circuits on ``self.test_mode or omia_id not in self.test_ids`` — in
production mode that skips every row (the de-morganed guard the code comments
elsewhere warn about), so the reference never emits article→phene is_about
triples outside tests.  We implement the evident intent and emit them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.ids import make_id
from dipper_spark.core.vocab import TranslationTable
from dipper_spark.models import (
    association_triples,
    class_triples,
    d2p_association_triples,
    g2p_association_triples,
    individual_triples,
    pairwise_triples,
    reference_triples,
    restriction_triples,
    synonym_triples,
    xref_triples,
)
from dipper_spark.models import terms as T
from dipper_spark.models.assoc import with_assoc_id
from dipper_spark.sources.base import FileContract, SourcePipeline, register

IS_ABOUT = "IAO:0000136"
IS_MODEL_OF = "RO:0003301"
HAS_DISPOSITION = "RO:0000091"
HAS_PHENOTYPE = "RO:0002200"
JOURNAL_ARTICLE = "IAO:0000013"
PUBLICATION = "IAO:0000311"
ALLELE = "GENO:0000512"
IS_ALLELE_OF = "GENO:0000408"
DESCENDANT_EVIDENCE = "ECO:0000214"  # biological aspect of descendant evidence
ANONYMOUS = "MONARCH:anonymous"
DISEASE_DEFAULT = "MONDO:0000001"  # 'disease or disorder'
EMBRYONIC_LETHAL = "MP:0008762"
PHENOTYPE_TYPES = ("UPHENO:0001001", "GENO:0000418", "SO:0001500")

#: table → declared field contract (resources/omia/omia_xml.* field lists as
#: consumed by the per-table row processors, OMIA.py:292-716)
TABLES = {
    "Species_gb": ["gb_species_id", "sci_name", "com_name"],
    "Breed": ["breed_id", "breed_name", "gb_species_id"],
    "Articles": ["article_id", "title", "year", "journal", "pubmed_id"],
    "Genes_gb": ["gene_id", "symbol", "gb_species_id", "gene_type"],
    "OMIA_Group": ["omia_id", "group_name", "group_summary", "group_category"],
    "Phene": [
        "phene_id", "omia_id", "gb_species_id", "phene_name", "summary",
        "inherit", "characterised", "clin_feat", "history", "pathology",
        "mol_gen", "control",
    ],
    "Omim_Xref": ["omia_id", "omim_id"],
    "Article_Breed": ["article_id", "breed_id"],
    "Article_Phene": ["article_id", "phene_id"],
    "Breed_Phene": ["breed_id", "phene_id"],
    "Lida_Links": ["omia_id", "lidaurl"],
    "Phene_Gene": ["phene_id", "gene_id"],
    "Group_MPO": ["omia_id", "MPO_no"],
}

_TT = TranslationTable.for_source("omia")
#: inheritance code → GENO term (translationtable/omia.yaml ∘ GLOBAL_TERMS);
#: codes absent from the localtt are logged-and-skipped by the reference
#: (OMIA.py:409-412) — here they simply miss the map and filter out
INHERIT_MAP = {
    code: _TT.globaltt[label]
    for code, label in _TT.localtt.items()
    if not code.startswith("group_category:") and label in _TT.globaltt
    and code not in ("protein-coding", "pseudo", "unknown")
}
GENE_TYPE_MAP = {
    code: _TT.globaltt[_TT.localtt[code]]
    for code in ("protein-coding", "pseudo", "unknown")
}
GROUP_CATEGORY_MAP = {
    code.removeprefix("group_category:"): _TT.globaltt[label]
    for code, label in _TT.localtt.items()
    if code.startswith("group_category:") and label in _TT.globaltt
}


def _m(mapping: dict[str, str], key: Column | str) -> Column:
    key = F.col(key) if isinstance(key, str) else key
    return F.element_at(F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]), key)


def _nonempty(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNotNull() & (F.trim(c) != ""), c)


@register
class OmiaPipeline(SourcePipeline):
    name = "omia"
    files = {
        "data": FileContract(
            file="omia.xml.gz", url="https://omia.org/dumps/omia.xml.gz"
        ),
        # optional companion staged by the omim pipeline; enables the
        # phenotype-type filter on model-of links (OMIA.py:719-760)
        "mimtitles": FileContract(
            file="mimTitles.txt",
            url="https://omim.org/static/omim/data/mimTitles.txt",
            optional=True,
        ),
        # NCBI gene_group: the reference stages this via its embedded
        # NCBIGene instance (OMIA.py:124,133-135) and bolts vertebrate
        # orthology for phene-annotated genes onto its own graph
        # (OMIA.py:172).  Optional: absent file → no orthology stanzas.
        "gene_group": FileContract(
            file="gene_group.gz",
            url="https://ftp.ncbi.nih.gov/gene/DATA/gene_group.gz",
            columns=["tax_id", "GeneID", "relationship", "Other_tax_id", "Other_GeneID"],
            optional=True,
        ),
    }
    test_ids = [
        "OMIA:001702", "OMIA:001867", "OMIA:000478",
        "OMIA:000201", "OMIA:000810", "OMIA:001400",
    ]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        import os

        from dipper_spark.io.readers import dump_table, read_mysqldump_xml

        g = self.name
        path = self.path(raw_dir, "data")
        if not path.endswith(".gz") and not os.path.exists(path):
            path = path.removesuffix(".gz")
        dump = read_mysqldump_xml(spark, [path], TABLES)
        # ~10 table projections read this one scan; cache the long frame so
        # the gz is parsed once (the reference re-reads it three times)
        dump = dump.persist()

        def tab(name: str) -> DataFrame:
            out = dump_table(dump, name, TABLES[name])
            return out.limit(limit) if limit else out

        # ---- dimensions (the reference's label_hash / id_hash dicts) -------
        species = tab("Species_gb").select(
            F.concat(F.lit("NCBITaxon:"), "gb_species_id").alias("tax_curie"),
            F.col("gb_species_id").alias("tax_key"),
            _nonempty("com_name").alias("com_name"),
            F.coalesce(_nonempty("com_name"), F.col("sci_name")).alias("species_label"),
        )
        groups = tab("OMIA_Group").select(
            F.concat(F.lit("OMIA:"), "omia_id").alias("omia_curie"),
            _nonempty("group_name").alias("group_name"),
            _nonempty("group_summary").alias("group_summary"),
            F.coalesce(
                _m(GROUP_CATEGORY_MAP, F.coalesce(F.col("group_category"), F.lit("None"))),
                F.lit(DISEASE_DEFAULT),
            ).alias("disease_id"),
        )
        groups = self.test_filter(groups, "omia_curie", test_mode)

        phenes = (
            tab("Phene")
            .filter(_nonempty("gb_species_id").isNotNull() & F.col("omia_id").isNotNull())
            .select(
                F.col("phene_id").alias("phene_key"),
                F.concat(F.lit("OMIA:"), "omia_id").alias("omia_curie"),
                F.concat(F.lit("OMIA:"), "omia_id", F.lit("-"), "gb_species_id").alias("sp_phene_id"),
                F.concat(F.lit("NCBITaxon:"), "gb_species_id").alias("tax_curie"),
                _nonempty("phene_name").alias("phene_name"),
                _nonempty("summary").alias("summary"),
                _nonempty("inherit").alias("inherit"),
                "clin_feat", "history", "pathology", "mol_gen", "control",
            )
        )
        phenes = self.test_filter(phenes, "omia_curie", test_mode)
        # species-specific label fallback: '<group label> in <species label>'
        # (OMIA.py:383-390); requires both joins to hit
        phenes = (
            phenes.join(F.broadcast(species.select("tax_curie", "species_label")), "tax_curie", "left")
            .join(F.broadcast(groups.select("omia_curie", "group_name")), "omia_curie", "left")
            .withColumn(
                "sp_label",
                F.coalesce(
                    "phene_name",
                    F.when(
                        F.col("group_name").isNotNull() & F.col("species_label").isNotNull(),
                        F.concat_ws(" ", "group_name", F.lit("in"), "species_label"),
                    ),
                ),
            )
        )

        breeds = (
            tab("Breed")
            .select(
                F.col("breed_id").alias("breed_key"),
                F.concat(F.lit("OMIA-breed:"), "breed_id").alias("breed_curie"),
                F.col("breed_name"),
                F.concat(F.lit("NCBITaxon:"), "gb_species_id").alias("tax_curie"),
            )
            .join(F.broadcast(species.select("tax_curie", "species_label")), "tax_curie", "left")
            .withColumn(
                "breed_label",
                F.when(
                    F.col("species_label").isNotNull(),
                    F.concat("breed_name", F.lit(" ("), "species_label", F.lit(")")),
                ).otherwise(F.col("breed_name")),
            )
        )

        articles = tab("Articles").select(
            F.col("article_id").alias("article_key"),
            # internal bnode id shape '_:omiaarticlekeyN' (OMIA._make_internal_id)
            F.concat(F.lit("_:omiaarticlekey"), "article_id").alias("bnode_id"),
            F.when(
                _nonempty("pubmed_id").isNotNull(),
                F.concat(F.lit("PMID:"), F.trim("pubmed_id")),
            ).alias("pmid"),
            _nonempty("title").alias("title"),
            _nonempty("journal").alias("journal"),
        ).withColumn("ref_id", F.coalesce("pmid", "bnode_id"))

        genes = tab("Genes_gb").select(
            F.col("gene_id").alias("gene_key"),
            F.concat(F.lit("NCBIGene:"), "gene_id").alias("gene_curie"),
            F.col("symbol"),
            F.concat(F.lit("NCBITaxon:"), "gb_species_id").alias("tax_curie"),
            _m(GENE_TYPE_MAP, F.col("gene_type")).alias("gene_type_id"),
        )

        # ---- OMIA→OMIM map with the phenotype-type filter ------------------
        omim_xref = tab("Omim_Xref").select(
            F.concat(F.lit("OMIA:"), "omia_id").alias("omia_curie"),
            F.concat(F.lit("OMIM:"), "omim_id").alias("omim_curie"),
            F.col("omim_id").alias("omim_num"),
        )
        omia_omim = self._phenotype_filtered_map(spark, raw_dir, omim_xref)

        pg_graph, annotated_genes = self._phene_gene_triples(
            tab("Phene_Gene"), genes, phenes, g
        )

        parts: list[DataFrame] = [
            # species classes + common-name synonym (OMIA.py:297-311)
            class_triples(species, "tax_curie", graph_id=g),
            make_triples(
                species.filter(F.col("com_name").isNotNull()),
                "tax_curie", F.lit(T.HAS_EXACT_SYNONYM), "com_name",
                is_literal=True, graph_id=g,
            ),
            # breed individuals typed by taxon (OMIA.py:313-341)
            individual_triples(breeds, "breed_curie", "tax_curie", label_col="breed_label", graph_id=g),
            # group classes under their category disease parent (OMIA.py:473-512)
            class_triples(
                groups, "omia_curie", label_col="group_name",
                description_col="group_summary", subclass_of_col="disease_id", graph_id=g,
            ),
            class_triples(groups.select("disease_id").distinct(), "disease_id", graph_id=g),
            # embryonic-lethal groups double as D2P (OMIA.py:497-503)
            d2p_association_triples(
                groups.filter(F.col("disease_id") == EMBRYONIC_LETHAL)
                .select("omia_curie", F.lit(EMBRYONIC_LETHAL).alias("mp_id")),
                "omia_curie", "mp_id", F.lit(HAS_PHENOTYPE), definedby=g, graph_id=g,
            ),
            # species-specific phene classes (OMIA.py:343-427)
            class_triples(
                phenes, "sp_phene_id", label_col="sp_label",
                description_col="summary", subclass_of_col="omia_curie", graph_id=g,
            ),
            self._tagged_descriptions(phenes, g),
            restriction_triples(phenes, "sp_phene_id", T.IN_TAXON, "tax_curie", graph_id=g),
            d2p_association_triples(
                phenes.withColumn("inheritance_id", _m(INHERIT_MAP, "inherit"))
                .filter(F.col("inheritance_id").isNotNull()),
                "sp_phene_id", "inheritance_id", F.lit(HAS_DISPOSITION),
                definedby=g, graph_id=g,
            ),
            # gene classes + taxon (OMIA.py:514-529)
            class_triples(genes, "gene_curie", label_col="symbol", subclass_of_col="gene_type_id", graph_id=g),
            make_triples(genes, "gene_curie", F.lit(T.IN_TAXON), "tax_curie", is_literal=False, graph_id=g),
            # OMIA→OMIM xrefs (OMIA.py:681-694)
            xref_triples(omim_xref, "omia_curie", "omim_curie", graph_id=g),
            # LIDA external links (OMIA.py:637-650); %-encode like urllib.quote
            xref_triples(
                tab("Lida_Links").select(
                    F.concat(F.lit("OMIA:"), "omia_id").alias("omia_curie"),
                    F.regexp_replace(
                        F.regexp_replace("lidaurl", ":", "%3A"), " ", "%20"
                    ).alias("lida"),
                ),
                "omia_curie", "lida", graph_id=g,
            ),
            # group→MP associations (OMIA.py:696-707)
            d2p_association_triples(
                tab("Group_MPO").select(
                    F.concat(F.lit("OMIA:"), "omia_id").alias("omia_curie"),
                    F.concat(F.lit("MP:"), F.lpad("MPO_no", 7, "0")).alias("mp_id"),
                ),
                "omia_curie", "mp_id", F.lit(HAS_PHENOTYPE), definedby=g, graph_id=g,
            ),
            pg_graph,
            self._breed_phene_triples(tab("Breed_Phene"), breeds, phenes, omia_omim, g),
            make_triples(
                tab("Article_Phene")
                .withColumnRenamed("article_id", "article_key")
                .withColumnRenamed("phene_id", "phene_key")
                .join(F.broadcast(articles.select("article_key", "ref_id")), "article_key")
                .join(phenes.select("phene_key", "sp_phene_id"), "phene_key"),
                "ref_id", F.lit(IS_ABOUT), "sp_phene_id", is_literal=False, graph_id=g,
            ),
        ]
        if not test_mode:
            # articles + article→breed links are production-only in the
            # reference (OMIA.py:450-452, 535-539)
            parts += [
                reference_triples(
                    articles.withColumn(
                        "rtype",
                        F.when(F.col("journal").isNotNull(), F.lit(JOURNAL_ARTICLE))
                        .otherwise(F.lit(PUBLICATION)),
                    ),
                    "bnode_id", type_col=F.col("rtype"),
                    citation_col="title", title_col="title", graph_id=g,
                ),
                pairwise_triples(
                    articles.filter(F.col("pmid").isNotNull()),
                    "bnode_id", "pmid", T.SAME_AS, graph_id=g,
                ),
                make_triples(
                    articles.filter(F.col("pmid").isNotNull())
                    .withColumn("cmt", F.regexp_replace("bnode_id", "^_:", "")),
                    "pmid", F.lit(T.COMMENT), "cmt", is_literal=True, graph_id=g,
                ),
                make_triples(
                    tab("Article_Breed")
                    .withColumnRenamed("article_id", "article_key")
                    .withColumnRenamed("breed_id", "breed_key")
                    .join(F.broadcast(articles.select("article_key", "ref_id")), "article_key")
                    .join(F.broadcast(breeds.select("breed_key", "breed_curie")), "breed_key"),
                    "ref_id", F.lit(IS_ABOUT), "breed_curie", is_literal=False, graph_id=g,
                ),
            ]
        # vertebrate orthology for phene-annotated genes: the reference
        # delegates to its embedded NCBIGene instance and writes the result
        # into OMIA's OWN graph (OMIA.py:172 add_orthologs_by_gene_group);
        # here the ncbigene pipeline's distributed surface is composed over
        # the same staged gene_group file — optional, absent → degraded.
        if os.path.exists(self.path(raw_dir, "gene_group")):
            from dipper_spark.sources.ncbigene import NcbiGenePipeline

            parts.append(
                NcbiGenePipeline().ortholog_graph(
                    spark, raw_dir, annotated_genes, graph_id=g
                )
            )
        return union_graphs(*parts).dropDuplicates(["subject", "predicate", "object"])

    @staticmethod
    def _tagged_descriptions(phenes: DataFrame, g: str) -> DataFrame:
        """clin_feat/history/pathology/mol_gen/control → dc:description with
        a ``[tag]`` suffix (OMIA.py:417-424)."""
        tagged = phenes.select(
            "sp_phene_id",
            F.explode(
                F.array(*[
                    F.struct(F.lit(tag).alias("tag"), F.col(tag).alias("val"))
                    for tag in ("clin_feat", "history", "pathology", "mol_gen", "control")
                ])
            ).alias("d"),
        ).filter(F.col("d.val").isNotNull() & (F.trim("d.val") != ""))
        return make_triples(
            tagged.withColumn("desc", F.concat(F.col("d.val"), F.lit(" ["), F.col("d.tag"), F.lit("]"))),
            "sp_phene_id", F.lit(T.DESCRIPTION), "desc", is_literal=True, graph_id=g,
        )

    def _phenotype_filtered_map(
        self, spark: SparkSession, raw_dir: str, omim_xref: DataFrame
    ) -> DataFrame:
        """OMIA→OMIM model-of map: apply MOVED-TO replacements, drop obsolete
        entries, keep only phenotype-typed OMIM ids (clean_up_omim_genes,
        OMIA.py:719-760).  Without a staged mimTitles.txt the map passes
        through unfiltered (documented degradation, not silent)."""
        import os

        mim_path = self.path(raw_dir, "mimtitles")
        if not os.path.exists(mim_path):
            import logging

            logging.getLogger(__name__).warning(
                "omia: no %s staged; OMIA→OMIM model-of links are UNFILTERED "
                "(gene-typed OMIM entries retained)", mim_path,
            )
            return omim_xref.select("omia_curie", "omim_curie")
        from dipper_spark.sources.omim import OmimPipeline

        mim = OmimPipeline().mim_types(spark, raw_dir).select(
            "omim_num", "omim_type", "replaced_by"
        )
        joined = omim_xref.join(F.broadcast(mim), "omim_num", "left")
        # replacements fan out (a MOVED-TO can name two targets); re-type the
        # replacement target through a second broadcast join
        replaced = (
            joined.filter(F.size(F.coalesce("replaced_by", F.array())) > 0)
            .select("omia_curie", F.explode("replaced_by").alias("omim_num"))
            .join(F.broadcast(mim.select("omim_num", "omim_type")), "omim_num", "left")
        )
        direct = joined.filter(F.size(F.coalesce("replaced_by", F.array())) == 0)
        live = direct.select("omia_curie", "omim_num", "omim_type").union(
            replaced.select("omia_curie", "omim_num", "omim_type")
        )
        return (
            live.filter(F.col("omim_type").isin(*PHENOTYPE_TYPES))
            .select("omia_curie", F.concat(F.lit("OMIM:"), "omim_num").alias("omim_curie"))
            .distinct()
        )

    @staticmethod
    def _phene_gene_triples(
        phene_gene: DataFrame, genes: DataFrame, phenes: DataFrame, g: str
    ) -> tuple[DataFrame, DataFrame]:
        """Anonymous variant-locus per annotated gene + G2P association
        (OMIA.py:652-679): var = digest('<gene_num>VL'), 'some variant of
        <symbol>', allele-of/affected-locus edges, has-phenotype assoc.
        Also returns the distinct annotated-gene frame (the reference's
        ``self.annotated_genes`` set, OMIA.py:679) for the orthology
        composition — kept as a DataFrame so it never leaves the cluster."""
        rows = (
            phene_gene
            .join(F.broadcast(genes.select("gene_key", "gene_curie", "symbol")),
                  phene_gene["gene_id"] == genes["gene_key"])
            .join(phenes.select("phene_key", "sp_phene_id"),
                  phene_gene["phene_id"] == phenes["phene_key"])
            .select(
                "gene_curie", "symbol", "sp_phene_id",
                make_id(F.concat(F.col("gene_id"), F.lit("VL")), prefix="_").alias("var"),
            )
            .withColumn("var_label", F.concat(F.lit("some variant of "), F.coalesce("symbol", F.lit("")))
                        )
        )
        graph = union_graphs(
            individual_triples(rows, "var", F.lit(ALLELE), label_col="var_label", graph_id=g),
            make_triples(rows, "var", F.lit(IS_ALLELE_OF), "gene_curie", is_literal=False, graph_id=g),
            make_triples(rows, "var", F.lit(T.HAS_AFFECTED_FEATURE), "gene_curie", is_literal=False, graph_id=g),
            make_triples(
                rows, "var", F.lit(ANONYMOUS), F.lit("true"),
                is_literal=True, datatype="xsd:boolean", graph_id=g,
            ),
            g2p_association_triples(
                rows, "var", "sp_phene_id", F.lit(HAS_PHENOTYPE), definedby="omia", graph_id=g
            ),
        )
        annotated = rows.select(F.col("gene_curie").alias("gene_id")).dropDuplicates()
        return graph, annotated

    @staticmethod
    def _breed_phene_triples(
        breed_phene: DataFrame, breeds: DataFrame, phenes: DataFrame,
        omia_omim: DataFrame, g: str
    ) -> DataFrame:
        """Breed has-phenotype phene, plus breed is-model-of each mapped OMIM
        disease with descendant-evidence ECO and a generated description
        (OMIA.py:572-635)."""
        rows = (
            breed_phene
            .join(F.broadcast(breeds.select("breed_key", "breed_curie", "breed_label")),
                  breed_phene["breed_id"] == breeds["breed_key"])
            .join(phenes.select("phene_key", "sp_phene_id", "omia_curie", "sp_label"),
                  breed_phene["phene_id"] == phenes["phene_key"])
            .select("breed_curie", "breed_label", "sp_phene_id", "omia_curie", "sp_label")
        )
        g2p = g2p_association_triples(
            rows, "breed_curie", "sp_phene_id", F.lit(HAS_PHENOTYPE), definedby="omia", graph_id=g
        )
        models = rows.join(omia_omim, "omia_curie")
        # description text mirrors OMIA.py:606-630: species name pulled from
        # the breed label's parens; ' in <species>' stripped from the phene
        # label when it ends with it
        sp = F.regexp_extract("breed_label", r"\((.*)\)", 1)
        phene_label = F.coalesce("sp_label", F.lit("phenotype"))
        phene_label = F.when(
            (sp != "") & phene_label.endswith(sp),
            F.replace(phene_label, F.concat(F.lit(" in "), sp), F.lit("")),
        ).otherwise(phene_label)
        models = models.withColumn(
            "desc",
            F.concat(
                F.lit("High incidence of "), phene_label, F.lit(" in "),
                F.coalesce("breed_label", F.lit("this breed")),
                F.lit(" suggests it to be a model of disease "),
                F.col("omim_curie"), F.lit("."),
            ),
        ).withColumn("evidence", F.array(F.lit(DESCENDANT_EVIDENCE))).withColumn(
            "_pred", F.lit(IS_MODEL_OF)
        )
        model_assocs = association_triples(
            models, "breed_curie", "_pred", "omim_curie",
            definedby="omia", evidence_col="evidence", graph_id=g,
        )
        descs = make_triples(
            with_assoc_id(models, "breed_curie", "_pred", "omim_curie", definedby="omia"),
            "assoc_id", F.lit(T.DESCRIPTION), "desc", is_literal=True, graph_id=g,
        )
        return union_graphs(g2p, model_assocs, descs)
