"""CURIE <-> IRI expansion/contraction over a broadcast prefix map.

Reference: dipper/utils/CurieUtil.py:31-67 (get_uri / get_curie /
get_curie_prefix with longest-prefix caveat) and the prefix table
dipper/curie_map.yaml loaded by dipper/curie_map.py:17-30.

Spark-first design: the prefix map is tiny and static → it becomes either a
literal MapType expression (constant-folded, no shuffle, no UDF) or a CASE
chain for contraction.  At 100 TB this is the textbook broadcast-dim pattern:
the map rides inside the task binary, zero network cost per row.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

from dipper_spark.core.curie_data import FULL_CURIE_MAP

#: the full prefix registry (reference: dipper/curie_map.yaml via
#: core/curie_data.py) — every prefix any registered pipeline emits resolves.
DEFAULT_CURIE_MAP = FULL_CURIE_MAP


class CurieMap:
    """Column-function CURIE expander/contracter over a static prefix map."""

    def __init__(self, mapping: dict[str, str] | None = None):
        self.mapping = dict(mapping or DEFAULT_CURIE_MAP)
        if len(set(self.mapping.values())) != len(self.mapping):
            # reference warns the same (CurieUtil.py:20-26)
            import logging

            logging.getLogger(__name__).warning("Curie map is NOT one to one!")

    def _map_expr(self) -> Column:
        return F.create_map(
            *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in self.mapping.items())
        )

    def expand(self, col: Column | str, *, strict: bool = False) -> Column:
        """CURIE -> IRI (reference: CurieUtil.get_uri, CurieUtil.py:60-67).

        Already-absolute IRIs (http/https/ftp scheme) pass through; unknown
        prefixes yield NULL (the reference logs an error and returns None).
        With ``strict=True`` an unresolvable non-null term raises at execution
        time instead — the sink-side guard against silently emitting
        ``<null>`` IRIs (the reference's graph layer likewise raises on
        un-mapped terms rather than writing corrupt RDF).
        """
        c = F.col(col) if isinstance(col, str) else col
        prefix = F.split(c, ":").getItem(0)
        # everything after the FIRST ':' (locals may themselves contain ':')
        local = F.substr(c, F.instr(c, F.lit(":")) + F.lit(1), F.length(c))
        base = self._map_expr()[prefix]
        if strict:
            fallback = F.when(
                c.isNotNull(),
                F.raise_error(
                    F.concat(F.lit("unresolvable CURIE (no prefix mapping): "), c)
                ),
            )
        else:
            fallback = F.lit(None)
        return (
            F.when(F.lower(prefix).isin("http", "https", "ftp"), c)
            .when(base.isNotNull(), F.concat(base, local))
            .otherwise(fallback)
        )

    def expand_str(self, curie: str) -> str:
        """Driver-side expansion of a single CURIE string (for graph IRIs,
        file headers — anything decided before the plan runs)."""
        if curie.split(":", 1)[0].lower() in ("http", "https", "ftp"):
            return curie
        prefix, _, local = curie.partition(":")
        if prefix not in self.mapping:
            raise KeyError(f"unresolvable CURIE (no prefix mapping): {curie}")
        return self.mapping[prefix] + local

    def unresolved(self, col: Column | str) -> Column:
        """Boolean column: term is a CURIE whose prefix has no mapping —
        use to route rejects instead of raising (P2-style reject frame)."""
        c = F.col(col) if isinstance(col, str) else col
        prefix = F.split(c, ":").getItem(0)
        return (
            c.isNotNull()
            & ~c.startswith("_")
            & ~F.lower(prefix).isin("http", "https", "ftp")
            & self._map_expr()[prefix].isNull()
        )

    def contract(self, col: Column | str) -> Column:
        """IRI -> CURIE via longest-prefix match (reference:
        CurieUtil.get_curie/get_curie_prefix, CurieUtil.py:36-51 — which does
        *first* match and comments "no... need the longest match"; we do the
        longest match it wished for)."""
        c = F.col(col) if isinstance(col, str) else col
        expr = F.lit(None).cast("string")
        # each when() wraps the previous as its otherwise, so the LAST-added
        # branch is evaluated first — iterate ascending so the longest base
        # IRI ends up outermost (longest-prefix-match wins)
        for prefix, base in sorted(self.mapping.items(), key=lambda kv: len(kv[1])):
            expr = F.when(
                c.startswith(base),
                F.concat_ws(":", F.lit(prefix), F.substr(c, F.lit(len(base) + 1), F.length(c))),
            ).otherwise(expr)
        return expr
