"""Driver-side turtle parser for golden-graph tests.

Reference: dipper's golden tests feed inline turtle to rdflib and compare
graphs (TestUtils.test_graph_equality, dipper/utils/TestUtils.py:13-57).
This container has no rdflib, so the subset of turtle those goldens use is
parsed here directly: ``@prefix`` headers, ``;``/``,`` chaining, ``a``,
prefixed names (including the default ``:`` prefix), ``<iri>`` refs,
``_:`` bnodes, and quoted literals with ``^^datatype`` / ``@lang`` tags.

Terms are normalized to the engine's CURIE space: prefixed names expand via
the @prefix table then contract through the full curie map (longest-prefix
match), so a golden's ``:MONARCH_b6c2...`` and the engine's
``MONARCH:b6c2...`` compare equal.
"""

from __future__ import annotations

import re

from dipper_spark.core.curie import DEFAULT_CURIE_MAP

_TOKEN = re.compile(
    r"""
      "(?P<lit>(?:[^"\\]|\\.)*)"(?:\^\^(?P<dt>\S+)|@(?P<lang>[a-zA-Z-]+))?
    | <(?P<iri>[^>]*)>
    | (?P<punct>[;,.])(?=\s|$)
    | (?P<term>[^\s;,]+)
    """,
    re.VERBOSE,
)


def _contract(iri: str, cmap: dict[str, str]) -> str:
    """Longest-prefix contraction (CurieUtil.get_curie semantics)."""
    best = None
    for prefix, base in cmap.items():
        if iri.startswith(base) and (best is None or len(base) > len(cmap[best])):
            best = prefix
    if best is None:
        return iri
    local = iri[len(cmap[best]):]
    return f"{best}:{local}" if best else f":{local}"


def _norm_term(tok: str, prefixes: dict[str, str], cmap: dict[str, str]) -> str:
    if tok == "a":
        return "rdf:type"
    if tok.startswith("_:"):
        return tok
    pfx, sep, local = tok.partition(":")
    # a curie already in the canonical prefix space stays as-written (avoids
    # alias flips between same-base prefixes like OIO/oboInOwl) — EXCEPT the
    # default ':' prefix, which must normalize (':MONARCH_x' → 'MONARCH:x')
    if sep and pfx and pfx in cmap:
        return tok
    base = prefixes.get(pfx)
    if base is None and pfx in cmap:
        base = cmap[pfx]
    if base is None and pfx == "" and "" in cmap:
        base = cmap[""]
    if base is None:
        return tok  # bare token; leave as-is
    return _contract(base + local, cmap)


def parse_turtle(text: str, curie_map: dict[str, str] | None = None) -> list[dict]:
    """Inline turtle → list of triple dicts matching TRIPLE_SCHEMA columns
    (subject/predicate/object/is_literal/datatype)."""
    cmap = dict(curie_map or DEFAULT_CURIE_MAP)
    prefixes: dict[str, str] = {}
    triples: list[dict] = []
    # strip comments, including TRAILING same-line ones — a '#' only starts
    # a comment when it is OUTSIDE a <bracketed IRI> and outside a "quoted
    # literal" (IRIs routinely contain fragment '#'s; literals may contain
    # anything) AND is preceded by whitespace / start-of-line: this engine's
    # curie-space terms may carry a raw '#' inside a prefixed name (e.g. the
    # HCLS version node MonarchArchive:YYYYMMDD/#source), which is token
    # content, not a comment
    def _strip_comment(ln: str) -> str:
        in_iri = in_lit = False
        i, n = 0, len(ln)
        while i < n:
            c = ln[i]
            if in_lit:
                if c == "\\":
                    i += 2
                    continue
                if c == '"':
                    in_lit = False
            elif in_iri:
                if c == ">":
                    in_iri = False
            elif c == '"':
                in_lit = True
            elif c == "<":
                in_iri = True
            elif c == "#" and (i == 0 or ln[i - 1] in " \t"):
                return ln[:i]
            i += 1
        return ln

    lines = [_strip_comment(ln) for ln in text.splitlines()]
    lines = [ln for ln in lines if ln.strip()]
    body: list[str] = []
    for ln in lines:
        m = re.match(r"\s*@prefix\s+([\w-]*):\s*<([^>]*)>\s*\.", ln)
        if m:
            prefixes[m.group(1)] = m.group(2)
        else:
            body.append(ln)
    subj = pred = None
    state = "s"  # s -> p -> o
    for m in _TOKEN.finditer("\n".join(body)):
        if m.group("punct"):
            p = m.group("punct")
            if p == ".":
                subj = pred = None
                state = "s"
            elif p == ";":
                state = "p"
            elif p == ",":
                state = "o"
            continue
        if m.group("lit") is not None:
            if state != "o":
                raise ValueError(f"literal in non-object position: {m.group(0)}")
            lit = (
                m.group("lit")
                .replace('\\"', '"')
                .replace("\\n", "\n")
                .replace("\\r", "\r")
                .replace("\\\\", "\\")
            )
            dt = m.group("dt")
            triples.append({
                "subject": subj, "predicate": pred, "object": lit,
                "is_literal": True,
                "datatype": _norm_term(dt, prefixes, cmap) if dt else None,
            })
            continue
        tok = m.group("iri")
        if tok is not None:
            term = _contract(tok, cmap)
        else:
            term = _norm_term(m.group("term"), prefixes, cmap)
        if state == "s":
            subj, state = term, "p"
        elif state == "p":
            pred, state = term, "o"
        else:
            triples.append({
                "subject": subj, "predicate": pred, "object": term,
                "is_literal": False, "datatype": None,
            })
    return triples


def triples_from_turtle(spark, text: str, curie_map: dict[str, str] | None = None,
                        graph_id: str | None = None):
    """Golden turtle → triples DataFrame in the canonical schema, ready for
    core.triples.graph_diff against a pipeline's output."""
    from dipper_spark.core.schema import TRIPLE_SCHEMA

    rows = [
        (
            t["subject"], t["predicate"], t["object"],
            t["is_literal"], t["datatype"], graph_id,
        )
        for t in parse_turtle(text, curie_map)
    ]
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)
