"""FALDO genomic-feature emitter.

Reference: dipper/models/GenomicFeature.py — Feature = id/label/type +
start/stop coordinates on a reference (26-52); graph expansion
addFeatureToGraph (127-231) emits the feature node, a region bnode, begin and
end position bnodes (each typed faldo:ExactPosition + the strand-position
class from _getStrandType 109-125), with deterministic position ids from
_makePositionId (246-279: '_' + digest of ':'.join(reference, coord,
strand-types)).

Spark-first: the whole FALDO star is a deterministic flatMap expressed as a
union of narrow selects over one staged DataFrame; position ids use the same
'b'+sha1[1:20] digest family as the reference (core.ids.digest_id), so they
are stable across partitionings and re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dipper_spark.core.ids import digest_id
from dipper_spark.core.triples import make_triples, union_graphs
from dipper_spark.models import terms as T


def strand_type_col(strand_col) -> F.Column:
    """GenomicFeature._getStrandType (GenomicFeature.py:109-125):
    '+' → ForwardStrandPosition, '-' → ReverseStrandPosition,
    '.' → BothStrandsPosition, else (null/'?') → StrandedPosition."""
    s = F.col(strand_col) if isinstance(strand_col, str) else strand_col
    return (
        F.when(s == "+", F.lit(T.FALDO_FORWARD))
        .when(s == "-", F.lit(T.FALDO_REVERSE))
        .when(s == ".", F.lit(T.FALDO_BOTH))
        .otherwise(F.lit(T.FALDO_STRANDED))
    )


def strand_string_col(strand_col) -> F.Column:
    """GenomicFeature._getStrandStringFromPositionTypes (246-258) composed
    with _getStrandType: the lowercase word used inside bnode digests —
    '+' → 'plus', '-' → 'minus', '.' → 'both', unknown → NULL."""
    s = F.col(strand_col) if isinstance(strand_col, str) else strand_col
    return (
        F.when(s == "+", F.lit("plus"))
        .when(s == "-", F.lit("minus"))
        .when(s == ".", F.lit("both"))
    )


def feature_triples(
    df: DataFrame,
    id_col: str = "feature_id",
    *,
    type_col: str | None = None,
    label_col: str | None = None,
    chrom_col: str = "chrom",
    start_col: str = "start",
    stop_col: str = "stop",
    strand_col: str | None = None,
    graph_id: str | None = None,
    unpositioned_region: bool = False,
) -> DataFrame:
    """addFeatureToGraph (GenomicFeature.py:127-231) as a union of selects,
    bit-compatible with the reference bnode derivations:

    feature  rdf:type        <type>             (when type_col given)
    feature  rdfs:label      label              (when label_col given)
    feature  faldo:location  region             (when start/stop present)
    feature  rdf:type        SO:0000001         (when NO location — the
                                                 feature itself is the region,
                                                 GenomicFeature.py:210-212)
    region   rdf:type        faldo:Region ; rdfs:label "<ref>-<st>-<sp>[-strand]-Region"
    region   faldo:begin / faldo:end  position bnodes
    position rdf:type        <strand-position-class> | faldo:Position (strand unknown)
    position rdfs:label      "<ref>-<coord>[-strand]"
    position faldo:position  coord^^xsd:integer
    position faldo:reference chrom

    Region id = digest of '-'.join(prefix-stripped ref, start|'UN',
    stop|'UN'[, strand word]) + '-Region' (GenomicFeature.py:172-199);
    position id = digest of '-'.join(prefix-stripped ref, coord[, strand
    word]) (_makePositionId 246-279).  Both bnodes carry their digest words
    as rdfs:label, as the reference does.

    ``unpositioned_region=True`` models a start location that has a
    reference but NO coordinate (Coriell.py:568
    ``addFeatureStartLocation(None, chr_id)``): rows with a chrom but both
    coords null then emit the '<ref>-UN-UN-Region' star with a
    coordinate-less begin position (label + faldo:reference only — the
    reference's position loop skips faldo:position and types for
    coordinate None / empty type list, GenomicFeature.py:316-330) instead
    of being typed SO:0000001.
    """
    strand_w = strand_string_col(strand_col) if strand_col is not None else F.lit(None).cast("string")
    strand_cls = strand_type_col(strand_col) if strand_col is not None else F.lit(None).cast("string")
    # reference strips one leading curie prefix (and bnode '_') from the
    # reference id before digesting (GenomicFeature.py:174, 259-262)
    refstr = F.regexp_replace(F.col(chrom_col), r"^\w+:_?", "")
    st = F.coalesce(F.col(start_col).cast("string"), F.lit("UN"))
    sp = F.coalesce(F.col(stop_col).cast("string"), F.lit("UN"))
    staged = (
        df.withColumn("_strand_w", strand_w)
        .withColumn("_strand_cls", F.coalesce(strand_cls, F.lit(T.FALDO_POSITION_CLS)))
        .withColumn("_rid", F.concat(F.concat_ws("-", refstr, st, sp, F.col("_strand_w")), F.lit("-Region")))
        .withColumn("_region", F.concat(F.lit("_:"), digest_id("_rid")))
        .withColumn("_begin_w", F.concat_ws("-", refstr, F.col(start_col).cast("string"), F.col("_strand_w")))
        .withColumn("_end_w", F.concat_ws("-", refstr, F.col(stop_col).cast("string"), F.col("_strand_w")))
        .withColumn("_begin", F.concat(F.lit("_:"), digest_id("_begin_w")))
        .withColumn("_end", F.concat(F.lit("_:"), digest_id("_end_w")))
    )
    g = graph_id
    located = staged.filter(F.col(start_col).isNotNull() | F.col(stop_col).isNotNull())
    unlocated = staged.filter(F.col(start_col).isNull() & F.col(stop_col).isNull())
    if unpositioned_region:
        unpos = unlocated.filter(F.col(chrom_col).isNotNull()).withColumn(
            "_pos_w", refstr
        ).withColumn("_pos", F.concat(F.lit("_:"), digest_id("_pos_w")))
        unlocated = unlocated.filter(F.col(chrom_col).isNull())
    parts = [
        make_triples(located, id_col, F.lit(T.FALDO_LOCATION), "_region", is_literal=False, graph_id=g),
        make_triples(located, "_region", F.lit(T.TYPE), F.lit(T.FALDO_REGION), is_literal=False, graph_id=g),
        make_triples(located, "_region", F.lit(T.LABEL), "_rid", is_literal=True, graph_id=g),
        # no location → the feature itself is typed region SO:0000001
        make_triples(unlocated, id_col, F.lit(T.TYPE), F.lit(T.SO_REGION), is_literal=False, graph_id=g),
    ]
    if unpositioned_region:
        parts += [
            make_triples(unpos, id_col, F.lit(T.FALDO_LOCATION), "_region", is_literal=False, graph_id=g),
            make_triples(unpos, "_region", F.lit(T.TYPE), F.lit(T.FALDO_REGION), is_literal=False, graph_id=g),
            make_triples(unpos, "_region", F.lit(T.LABEL), "_rid", is_literal=True, graph_id=g),
            make_triples(unpos, "_region", F.lit(T.FALDO_BEGIN), "_pos", is_literal=False, graph_id=g),
            make_triples(unpos, "_pos", F.lit(T.LABEL), "_pos_w", is_literal=True, graph_id=g),
            make_triples(unpos, "_pos", F.lit(T.FALDO_REFERENCE), chrom_col, is_literal=False, graph_id=g),
        ]
    for pos, words, coord in (("_begin", "_begin_w", start_col), ("_end", "_end_w", stop_col)):
        has = located.filter(F.col(coord).isNotNull())
        parts += [
            make_triples(has, "_region", F.lit(T.FALDO_BEGIN if pos == "_begin" else T.FALDO_END), pos, is_literal=False, graph_id=g),
            make_triples(has, pos, F.lit(T.TYPE), "_strand_cls", is_literal=False, graph_id=g),
            make_triples(has, pos, F.lit(T.LABEL), words, is_literal=True, graph_id=g),
            make_triples(
                has, pos, F.lit(T.FALDO_POSITION_PROP), F.col(coord).cast("string"),
                is_literal=True, datatype="xsd:integer", graph_id=g,
            ),
            make_triples(has, pos, F.lit(T.FALDO_REFERENCE), chrom_col, is_literal=False, graph_id=g),
        ]
    if type_col is not None:
        parts.append(make_triples(staged, id_col, F.lit(T.TYPE), type_col, is_literal=False, graph_id=g))
    if label_col is not None:
        parts.append(
            make_triples(
                staged.filter(F.col(label_col).isNotNull()),
                id_col, F.lit(T.LABEL), label_col, is_literal=True, graph_id=g,
            )
        )
    return union_graphs(*parts)
