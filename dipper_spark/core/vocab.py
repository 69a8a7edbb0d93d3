"""Translation tables (globaltt/localtt) as broadcast-map column functions.

Reference: the two-level label->term resolve chain in Source.resolve
(dipper/sources/Source.py:751-796): g(f(x)) | g(x) | f(x) | x, where f =
per-source localtt and g = global translation table
(translationtable/GLOBAL_TERMS.yaml, loaded at RDFGraph.py:29-34).

Spark-first: both tables are small static dicts → literal map expressions
(constant-folded into codegen, zero shuffle).  The "mandatory" miss-raises
behavior becomes either a null-check action or an accumulator-style metric
(count of unresolved), because per-row exceptions don't exist in a vectorized
engine.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dipper_spark.core.vocab_data import GLOBAL_TERMS, LOCAL_TT


def _map_expr(mapping: dict[str, str]) -> Column:
    if not mapping:
        return F.create_map().cast("map<string,string>")
    return F.create_map(*chain.from_iterable((F.lit(k), F.lit(v)) for k, v in mapping.items()))


class TranslationTable:
    def __init__(self, globaltt: dict[str, str] | None = None, localtt: dict[str, str] | None = None):
        self.globaltt = dict(globaltt or {})
        self.localtt = dict(localtt or {})

    @classmethod
    def for_source(cls, name: str | None = None) -> "TranslationTable":
        """The production resolve chain: full global table (738 entries,
        core/vocab_data.py) + the named source's local table.  ``name=None``
        gives globaltt-only resolution."""
        return cls(GLOBAL_TERMS, LOCAL_TT.get(name, {}) if name else {})

    def resolve_str(self, label: str, default: str | None = None) -> str:
        """Driver-side resolve with the same fallback chain as
        :meth:`resolve` — for constants decided before the plan runs."""
        local = self.localtt.get(label)
        if local is not None:
            return self.globaltt.get(local, local)
        hit = self.globaltt.get(label)
        if hit is not None:
            return hit
        return default if default is not None else label

    def resolve(self, col: Column | str, default: Column | str | None = None) -> Column:
        """The Source.resolve fallback chain as one coalesce expression:

        globaltt[localtt[x]] | localtt[x]-when-hit-but-no-global |
        globaltt[x] | default | x

        (reference: Source.py:775-796 — note the subtlety that a localtt hit
        whose label is missing from globaltt returns the *label*, not x).
        """
        c = F.col(col) if isinstance(col, str) else col
        g, l = _map_expr(self.globaltt), _map_expr(self.localtt)
        local_label = l[c]
        dflt = (
            F.lit(None).cast("string")
            if default is None
            else (F.lit(default) if isinstance(default, str) else default)
        )
        return (
            F.when(local_label.isNotNull(), F.coalesce(g[local_label], local_label))
            .otherwise(F.coalesce(g[c], dflt, c))
        )

    def unresolved(self, df: DataFrame, col: str) -> DataFrame:
        """Rows whose value hits neither table — the rows where mandatory
        resolve would have raised KeyError (Source.py:788-789).  Returned as a
        DataFrame so callers can count / fail / route them (quality metric
        A8-style rather than a per-row exception)."""
        c = F.col(col)
        g, l = _map_expr(self.globaltt), _map_expr(self.localtt)
        return df.filter(l[c].isNull() & g[c].isNull())
