"""S7 NBK HTML book extraction (GeneReviews.process_nbk_html,
GeneReviews.py:291-405): the stdlib-HTMLParser re-derivation must pull the
same clinical summary (whitespace collapsed, list items appended with the
reference's no-separator quirk) and the same cited PMIDs (text and href
forms) as the BeautifulSoup original."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.io.nbk_html import parse_nbk_book, read_nbk_books
from dipper_spark.sources import get_pipeline

BOOK = """<html><body>
<div id="NBK1103.Summary.sec0"><h2>Summary</h2>
<p>Trimethylaminuria   is a
metabolic disorder.</p>
<ul><li>item   one</li><li>item two</li></ul>
</div>
<div id="NBK1103.Literature_Cited"><h2>Literature Cited</h2>
  <div class="bk_ref">Author A. <a href="https://www.ncbi.nlm.nih.gov/pubmed/20301370">PubMed: 20301370</a></div>
  <div class="bk_ref">Author B. <a href="/pubmed/11111111">link text</a></div>
  <div class="bk_ref">Author C. <a href="https://x.org/entrez?db=pubmed&amp;id=9">ambiguous</a></div>
</div>
</body></html>"""


class TestParse:
    def test_summary_collapse_and_item_quirk(self):
        summary, pmids = parse_nbk_book(BOOK)
        # first <p> collapsed; items appended with NO separator before the
        # first item — the reference's ptext += ' '.join(items) verbatim
        assert summary == "Trimethylaminuria is a metabolic disorder.item one item two"
        assert pmids == ["20301370", "11111111"]  # text form, then href form
        # the 'ambiguous' anchor (pubmed href, neither id form) is skipped —
        # documented divergence: the reference raises AttributeError there

    def test_no_summary_book(self):
        summary, pmids = parse_nbk_book(
            '<div id="NBK9.Literature_Cited"><div class="bk_ref">'
            '<a href="/pubmed/42">PubMed: 42</a></div></div>'
        )
        assert summary is None and pmids == ["42"]


class TestPipeline:
    @pytest.fixture(scope="class")
    def graph(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("genereviews")
        (d / "GRtitle_shortname_NBKid.txt").write_text(
            "#GR_shortname\tGR_Title\tNBK_id\tPMID\n"
            "tmau\tTrimethylaminuria\tNBK1103\t20301282\n"
        )
        (d / "NBKid_shortname_OMIM.txt").write_text(
            "#NBK_id\tGR_shortname\tOMIM\nNBK1103\ttmau\t602079\n"
        )
        books = d / "books"
        books.mkdir()
        (books / "NBK1103.html").write_text(BOOK)
        return get_pipeline("genereviews").transform(spark, str(d)).cache()

    def test_definition_with_citation_suffix(self, graph):
        rows = graph.filter(
            (F.col("subject") == "GeneReviews:NBK1103")
            & (F.col("predicate") == "IAO:0000115")
        ).collect()
        assert len(rows) == 1
        assert rows[0].object == (
            "Trimethylaminuria is a metabolic disorder.item one item two "
            "[GeneReviews:NBK1116, GeneReviews:NBK138602, GeneReviews:NBK1103]"
        )

    def test_pmid_links_and_typing(self, graph):
        spo = {(r.subject, r.predicate, r.object) for r in graph.collect()}
        for pm in ("PMID:20301370", "PMID:11111111"):
            assert (pm, "IAO:0000136", "GeneReviews:NBK1103") in spo
            assert (pm, "rdf:type", "IAO:0000013") in spo

    def test_scan_is_arrow_batched(self, spark, tmp_path):
        (tmp_path / "NBK7.html").write_text(BOOK)
        plan = (
            read_nbk_books(spark, str(tmp_path))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "ArrowEvalPython" in plan or "MapInPandas" in plan
        assert "BatchEvalPython" not in plan  # never row-at-a-time
