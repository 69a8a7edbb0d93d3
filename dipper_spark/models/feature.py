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
) -> DataFrame:
    """addFeatureToGraph (GenomicFeature.py:127-231) as a union of selects:

    feature  rdf:type        <type>             (when type_col given)
    feature  rdfs:label      label              (when label_col given)
    feature  faldo:location  region
    region   rdf:type        faldo:Region
    region   faldo:begin     beginPos
    region   faldo:end       endPos
    beginPos rdf:type        faldo:ExactPosition / <strand-position-class>
    beginPos faldo:position  start^^xsd:integer
    beginPos faldo:reference chrom              (ditto for endPos)
    """
    strand = strand_type_col(strand_col) if strand_col is not None else F.lit(T.FALDO_STRANDED)
    # deterministic bnode-style ids (GenomicFeature._makePositionId 246-279)
    staged = (
        df.withColumn("_strand_cls", strand)
        .withColumn(
            "_region",
            F.concat(F.lit("_:"), digest_id(F.concat_ws(":", F.col(chrom_col),
                     F.col(start_col).cast("string"), F.col(stop_col).cast("string")))),
        )
        .withColumn(
            "_begin",
            F.concat(F.lit("_:"), digest_id(F.concat_ws(":", F.col(chrom_col),
                     F.col(start_col).cast("string"), F.col("_strand_cls")))),
        )
        .withColumn(
            "_end",
            F.concat(F.lit("_:"), digest_id(F.concat_ws(":", F.col(chrom_col),
                     F.col(stop_col).cast("string"), F.col("_strand_cls")))),
        )
    )
    g = graph_id
    parts = [
        make_triples(staged, id_col, F.lit(T.FALDO_LOCATION), "_region", is_literal=False, graph_id=g),
        make_triples(staged, "_region", F.lit(T.TYPE), F.lit(T.FALDO_REGION), is_literal=False, graph_id=g),
        make_triples(staged, "_region", F.lit(T.FALDO_BEGIN), "_begin", is_literal=False, graph_id=g),
        make_triples(staged, "_region", F.lit(T.FALDO_END), "_end", is_literal=False, graph_id=g),
    ]
    for pos, coord in (("_begin", start_col), ("_end", stop_col)):
        parts += [
            make_triples(staged, pos, F.lit(T.TYPE), F.lit(T.FALDO_EXACT), is_literal=False, graph_id=g),
            make_triples(staged, pos, F.lit(T.TYPE), "_strand_cls", is_literal=False, graph_id=g),
            make_triples(
                staged.filter(F.col(coord).isNotNull()),
                pos, F.lit(T.FALDO_POSITION_PROP), F.col(coord).cast("string"),
                is_literal=True, datatype="xsd:integer", graph_id=g,
            ),
            make_triples(staged, pos, F.lit(T.FALDO_REFERENCE), chrom_col, is_literal=False, graph_id=g),
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
