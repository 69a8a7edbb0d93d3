"""Deterministic content-addressed identifiers, bit-compatible with dipper.

Reference: Source.hash_id (dipper/sources/Source.py:248-278) and its twin
GraphUtils.digest_id (dipper/utils/GraphUtils.py:137-149):
``'b' + sha1(utf8(s)).hexdigest()[1:20]`` — leading 'b' keeps the id
non-numeric; 19 hex chars of sha1.

Association ids (dipper/models/assoc/Association.py:260-290) digest
``'+'.join([definedby, subject, predicate, object, *attributes])``.

All pure column expressions — JVM-side sha1, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def digest_id(col: Column | str) -> Column:
    """``'b' + sha1(s)[1:20]`` — exact dipper hash_id/digest_id semantics."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit("b"), F.substring(F.sha1(c), 2, 19))


def make_id(col: Column | str, prefix: str = "MONARCH") -> Column:
    """CURIE-form deterministic id (reference: Source.make_id, Source.py:248-258)."""
    return F.concat_ws(":", F.lit(prefix), digest_id(col))


def assoc_id(*parts: Column | str, definedby: str = "MONARCH") -> Column:
    """Deterministic association id over its defining attributes.

    Reference: Association.make_association_id (Association.py:260-290) joins
    definedby+subject+predicate+object(+attributes) with '+' then digests.
    """
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return make_id(F.concat_ws("+", F.lit(definedby), *cols), prefix="MONARCH")
