"""NBK Bookshelf HTML extraction for GeneReviews — the S7 scrape surface.

Reference: GeneReviews.process_nbk_html (GeneReviews.py:291-405) pulls, per
manually-acquired book file, (a) the clinical-description text: the first
<p> of the div whose id matches ``Summary.sec0``, plus the text of every
<li> of that div's first <ul>, each whitespace-collapsed, and (b) the
PubMed ids cited in the div whose id matches ``Literature_Cited``: every
``bk_ref`` div's anchors with a pubmed href, the id taken from a
``PubMed:``-prefixed anchor text or from a ``/pubmed/<digits>`` href tail.

This re-derivation uses the stdlib ``html.parser`` state machine instead
of BeautifulSoup (not in this container) — same extraction contract.
Documented divergences from the reference:

- the reference concatenates the <ul> items onto the paragraph WITHOUT a
  separator (``ptext += ' '.join(item_text)``) — mirrored verbatim, quirk
  included, for output parity;
- an anchor whose href merely CONTAINS "pubmed" but matches neither id
  form crashes the reference (``.group(1)`` on None); here it is skipped.

Spark surface: books are unsplittable whole-file HTML, so the scan is the
honest Python path (binaryFile source → Arrow-batched ``mapInPandas``, one
book per row) — the same class as the XML stanza reader, never row-at-a-
time UDFs.
"""

from __future__ import annotations

import os
import re
from html.parser import HTMLParser

from pyspark.sql import DataFrame, SparkSession

_WS = re.compile(r"\s+")
_SUMMARY_ID = re.compile(r".*Summary.sec0")
_LITCITE_ID = re.compile(r".*Literature_Cited")
_PUBMED_HREF = re.compile(r"pubmed")
_PUBMED_TEXT = re.compile(r"PubMed:")
_PUBMED_TAIL = re.compile(r"/pubmed/(\d+)$")


class _NBKExtractor(HTMLParser):
    """One pass over the book: summary paragraph + list items + cited PMIDs."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.depth = 0
        self.summary_at: int | None = None
        self.litcite_at: int | None = None
        self.ref_at: int | None = None
        # first <p> / first <ul> inside the summary div
        self._p_parts: list[str] = []
        self._p_open = False
        self._p_done = False
        self._ul_open = False
        self._ul_done = False
        self._li_open = False
        self._li_parts: list[str] = []
        self.items: list[str] = []
        # anchors inside bk_ref divs
        self._a_href: str | None = None
        self._a_parts: list[str] = []
        self._a_open = False
        self.pmids: list[str] = []

    def handle_starttag(self, tag, attrs):  # noqa: ANN001
        a = dict(attrs)
        if tag == "div":
            self.depth += 1
            did = a.get("id") or ""
            if self.summary_at is None and _SUMMARY_ID.match(did):
                self.summary_at = self.depth
            if self.litcite_at is None and _LITCITE_ID.match(did):
                self.litcite_at = self.depth
            if (
                self.litcite_at is not None
                and self.ref_at is None
                and "bk_ref" in (a.get("class") or "")
            ):
                self.ref_at = self.depth
        elif self._in_summary():
            if tag == "p" and not self._p_done and not self._p_open:
                self._p_open = True
            elif tag == "ul" and not self._ul_done and not self._ul_open:
                self._ul_open = True
            elif tag == "li" and self._ul_open:
                self._li_open = True
                self._li_parts = []
        elif self.ref_at is not None and tag == "a":
            href = a.get("href") or ""
            if _PUBMED_HREF.search(href):
                self._a_open, self._a_href, self._a_parts = True, href, []

    def handle_endtag(self, tag):  # noqa: ANN001
        if tag == "div":
            if self.summary_at is not None and self.depth == self.summary_at:
                self.summary_at = None
            if self.ref_at is not None and self.depth == self.ref_at:
                self.ref_at = None
            if self.litcite_at is not None and self.depth == self.litcite_at:
                self.litcite_at = None
            self.depth -= 1
        elif tag == "p" and self._p_open:
            self._p_open, self._p_done = False, True
        elif tag == "ul" and self._ul_open:
            self._ul_open, self._ul_done = False, True
        elif tag == "li" and self._li_open:
            self._li_open = False
            self.items.append(_WS.sub(" ", "".join(self._li_parts)))
        elif tag == "a" and self._a_open:
            self._a_open = False
            text = "".join(self._a_parts)
            if _PUBMED_TEXT.match(text):
                self.pmids.append(re.sub(r"PubMed:\s*", "", text))
            else:
                m = _PUBMED_TAIL.search(self._a_href or "")
                if m:  # divergence: the reference raises here when absent
                    self.pmids.append(m.group(1))

    def handle_data(self, data):  # noqa: ANN001
        if self._p_open:
            self._p_parts.append(data)
        if self._li_open:
            self._li_parts.append(data)
        if self._a_open:
            self._a_parts.append(data)

    def _in_summary(self) -> bool:
        return self.summary_at is not None

    def summary(self) -> str | None:
        if not self._p_done:
            return None
        ptext = _WS.sub(" ", "".join(self._p_parts))
        if self.items:
            # reference quirk preserved: no separator before the first item
            ptext += " ".join(self.items)
        return ptext


def parse_nbk_book(html: str) -> tuple[str | None, list[str]]:
    """(clinical summary text or None, cited PubMed id strings)."""
    p = _NBKExtractor()
    p.feed(html)
    p.close()
    return p.summary(), p.pmids


NBK_BOOK_SCHEMA = "nbk string, summary string, pmids array<string>"


def read_nbk_books(spark: SparkSession, books_dir: str) -> DataFrame:
    """Scan a directory of NBK*.html books into (nbk, summary, pmids).

    binaryFile source (one whole book per row — the format is unsplittable)
    and one Arrow batch of books per parse call."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(
        os.path.join(books_dir, "*.html")
    ).select("path", "content")

    def parse(batches):  # noqa: ANN001
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                nbk = os.path.basename(path)
                nbk = nbk[: -len(".html")] if nbk.endswith(".html") else nbk
                summary, pmids = parse_nbk_book(
                    bytes(content).decode("utf-8", "replace")
                )
                rows.append((nbk, summary, pmids))
            yield pd.DataFrame(rows, columns=["nbk", "summary", "pmids"])

    return files.mapInPandas(parse, NBK_BOOK_SCHEMA)
