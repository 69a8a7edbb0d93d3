"""Literal handling: classification, normalization, ntriples escaping.

All are pure column expressions (whole-stage-codegen friendly); each mirrors a
specific reference behavior bit-for-bit so golden outputs match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: CURIE shape (reference: dipper/graph/Graph.py:20-21, from RDFa core)
CURIE_REGEXP = r"^[a-zA-Z_]?[a-zA-Z_0-9-]*:[A-Za-z0-9_][A-Za-z0-9_.-]*[A-Za-z0-9_]*$"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def is_literal_col(col: Column | str) -> Column:
    """Literal-vs-resource inference (reference: RDFGraph._is_literal,
    dipper/graph/RDFGraph.py:67-79): a value is a resource iff it matches the
    CURIE regexp or its scheme (text before ':', lowercased) is http/https/ftp;
    otherwise it is a literal."""
    c = _c(col)
    scheme = F.lower(F.split(c, ":").getItem(0))
    return ~(c.rlike(CURIE_REGEXP) | scheme.isin("http", "https", "ftp"))


def normalize_whitespace(col: Column | str) -> Column:
    """Any [\\t\\n\\r\\x0b\\x0c]+ run -> single space (reference:
    RDFGraph.py:110-111 literal cleanup)."""
    return F.regexp_replace(_c(col), r"[\t\n\r\x0b\x0c]+", " ")


def remove_control_chars(col: Column | str) -> Column:
    """Strip Unicode Cc control chars except tab/newline (reference:
    DipperUtil.remove_control_characters, dipper/utils/DipperUtil.py:34-44)."""
    return F.regexp_replace(_c(col), r"[\x00-\x08\x0b-\x1f\x7f]", "")


def nt_escape(col: Column | str) -> Column:
    r"""ntriples literal escaping, exactly StreamedGraph._quote_encode
    (dipper/graph/StreamedGraph.py:168-180, itself copied from rdflib):
    backslash, newline, double-quote, carriage return — in that order."""
    c = _c(col)
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, '"', '\\\\"')
    c = F.regexp_replace(c, "\r", r"\\r")
    return c


def skolemize_bnode(col: Column | str, base: str = "https://monarchinitiative.org/.well-known/genid/") -> Column:
    """Blank-node skolemization (reference: RDFGraph.skolemizeBlankNode,
    dipper/graph/RDFGraph.py:144-146): '_:b123' / '_b123' -> <base>b123."""
    return F.concat(F.lit(base), F.regexp_replace(_c(col), r"^_:?", ""))
