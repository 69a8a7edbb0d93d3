"""GeneReviews pipeline: NBK book classes + OMIM subclass couplings.

Reference behavior: dipper/sources/GeneReviews.py —
``_get_titles`` (246-271: GRtitle file, latin-1, '#'-prefixed header; book
classes with title labels and shortname synonyms),
``_get_equivids`` (120-233: NBK↔OMIM map; malformed OMIM numbers skipped;
OMIM ids run through the mimTitles replacement/obsolete/phenotype-type
filter exactly like OMIA, then ``OMIM subClassOf NBK``), every book also
``subClassOf`` 'disease or disorder'.

The HTML book scrape (``process_nbk_html``, GeneReviews.py:291-405) — the
S7 surface — is implemented over manually-acquired books (NCBI Bookshelf
prohibits automated download, so, exactly like the reference, only files
present under ``raw/<src>/books/`` are processed): clinical-description
definitions with the reference's copyright/citation suffix, and cited-PMID
``is_about`` links with journal-article typing (io/nbk_html.py holds the
stdlib-HTMLParser extraction + binaryFile/mapInPandas scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.models import class_triples
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

DISEASE = "MONDO:0000001"
PHENOTYPE_TYPES = ("UPHENO:0001001", "GENO:0000418", "SO:0001500")
GRDL = "http://ftp.ncbi.nih.gov/pub/GeneReviews"


@register
class GeneReviewsPipeline(SourcePipeline):
    name = "genereviews"
    files = {
        "idmap": FileContract(
            file="NBKid_shortname_OMIM.txt",
            url=f"{GRDL}/NBKid_shortname_OMIM.txt",
            columns=["NBK_id", "GR_shortname", "OMIM"],
        ),
        "titles": FileContract(
            file="GRtitle_shortname_NBKid.txt",
            url=f"{GRDL}/GRtitle_shortname_NBKid.txt",
            columns=["GR_shortname", "GR_Title", "NBK_id", "PMID"],
        ),
        "mimtitles": FileContract(
            file="mimTitles.txt",
            url="https://omim.org/static/omim/data/mimTitles.txt",
        ),
    }
    test_ids = ["OMIM:301500"]

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        import os

        from dipper_spark.io.readers import read_delim

        g = self.name
        titles = read_delim(
            spark, self.path(raw_dir, "titles"),
            self.files["titles"].columns, header=True, header_prefix="#",
            encoding="ISO-8859-1", src_key="titles", limit=limit,
        ).select(
            F.concat(F.lit("GeneReviews:"), "NBK_id").alias("gr_id"),
            F.col("GR_Title").alias("title"),
            F.col("GR_shortname").alias("shortname"),
        )
        idmap = read_delim(
            spark, self.path(raw_dir, "idmap"),
            self.files["idmap"].columns, header=True, header_prefix="#",
            src_key="idmap", limit=limit,
        ).select(
            F.concat(F.lit("GeneReviews:"), "NBK_id").alias("gr_id"),
            F.col("GR_shortname").alias("shortname"),
            F.trim(F.col("OMIM")).alias("omim_num"),
        ).filter(F.length("omim_num") == 6)

        omim = idmap.select("gr_id", "omim_num")
        mim_path = self.path(raw_dir, "mimtitles")
        if os.path.exists(mim_path):
            # replacement + obsolete + phenotype-type filter, shared with the
            # OMIA model-of cleanup (GeneReviews.py:185-219)
            from dipper_spark.sources.omim import OmimPipeline

            mim = OmimPipeline().mim_types(spark, raw_dir).select(
                "omim_num", "omim_type", "replaced_by"
            )
            joined = omim.join(F.broadcast(mim), "omim_num", "left")
            replaced = (
                joined.filter(F.size(F.coalesce("replaced_by", F.array())) > 0)
                .select("gr_id", F.explode("replaced_by").alias("omim_num"))
                .join(F.broadcast(mim.select("omim_num", "omim_type")), "omim_num", "left")
            )
            direct = joined.filter(F.size(F.coalesce("replaced_by", F.array())) == 0)
            omim = (
                direct.select("gr_id", "omim_num", "omim_type")
                .union(replaced.select("gr_id", "omim_num", "omim_type"))
                .filter(F.col("omim_type").isin(*PHENOTYPE_TYPES))
            )
        omim = omim.withColumn("omim_id", F.concat(F.lit("OMIM:"), "omim_num"))
        books = titles.select("gr_id").union(idmap.select("gr_id")).distinct()
        parts = []
        books_dir = os.path.join(os.path.dirname(self.path(raw_dir, "titles")), "books")
        if os.path.isdir(books_dir):
            parts.append(self._book_triples(spark, books_dir))
        return union_graphs(
            *parts,
            class_triples(titles, "gr_id", label_col="title", graph_id=g),
            make_triples(
                titles.select("gr_id", F.col("shortname").alias("syn"))
                .union(idmap.select("gr_id", F.col("shortname").alias("syn")))
                .filter(F.col("syn").isNotNull() & (F.col("syn") != "")),
                "gr_id", F.lit(T.HAS_EXACT_SYNONYM), "syn", is_literal=True, graph_id=g,
            ),
            class_triples(omim, "omim_id", graph_id=g),
            make_triples(omim, "omim_id", F.lit(T.SUBCLASS_OF), "gr_id", is_literal=False, graph_id=g),
            make_triples(
                books, "gr_id", F.lit(T.SUBCLASS_OF), F.lit(DISEASE), is_literal=False, graph_id=g,
            ),
        ).dropDuplicates(["subject", "predicate", "object"])

    def _book_triples(self, spark: SparkSession, books_dir: str) -> DataFrame:
        """process_nbk_html (GeneReviews.py:291-405): per locally-present
        book, the clinical-description definition (summary + reference-exact
        copyright/citation suffix, IAO:0000115) and cited-PMID links
        (PMID is_about NBK; PMID typed journal article)."""
        from dipper_spark.io.nbk_html import read_nbk_books
        from dipper_spark.models.context import reference_triples

        g = self.name
        parsed = read_nbk_books(spark, books_dir).withColumn(
            "gr_id", F.concat(F.lit("GeneReviews:"), F.col("nbk"))
        )
        defs = parsed.filter(F.col("summary").isNotNull()).select(
            "gr_id",
            F.trim(
                F.concat(
                    F.col("summary"),
                    F.lit(" [GeneReviews:NBK1116, GeneReviews:NBK138602, "),
                    F.col("gr_id"),
                    F.lit("]"),
                )
            ).alias("definition"),
        )
        pmids = parsed.select(
            "gr_id", F.explode("pmids").alias("pm")
        ).select("gr_id", F.concat(F.lit("PMID:"), "pm").alias("pmid"))
        return union_graphs(
            make_triples(
                defs, "gr_id", F.lit("IAO:0000115"), "definition",
                is_literal=True, graph_id=g,
            ),
            make_triples(
                pmids, "pmid", F.lit("IAO:0000136"), "gr_id",
                is_literal=False, graph_id=g,
            ),
            reference_triples(pmids, "pmid", type_col="IAO:0000013", graph_id=g),
        )
