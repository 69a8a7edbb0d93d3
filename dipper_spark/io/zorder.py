"""Z-order (Morton-curve) layout key for multi-dimensional scan pruning.

100 TB posture: parquet scans prune FILES by per-file column min/max
statistics, but a table sorted on one dimension gives tight stats only on
that dimension — a filter on the second dimension reads everything.
Interleaving the bits of both dimensions into one sort key (the Morton /
Z-order curve — Morton 1966; the technique behind Delta Lake's OPTIMIZE
ZORDER and many spatial indexes) makes every contiguous key range a small
bounding box in BOTH dimensions, so per-file min/max prune filters on
either column.

Everything here is exact integer bit arithmetic on JVM-side expressions
(shiftleft / bitwise OR / AND — whole-stage codegen, no UDFs), and the
same arithmetic is emitted as portable SQL for the DuckDB oracle:
deterministic, engine-identical keys.

The interesting part is measurable, not just writable: ``zorder_shard_stats``
assigns rows to equal-width key-range shards under (a) a z-order key and
(b) a single-dimension sort key and reports each shard's bounding box on
both dimensions — the z-order layout's per-shard second-dimension extent
collapses, which IS the pruning win (``tests/test_zorder.py`` pins the
ratio).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits kept per dimension (z key = 2 * Z_BITS wide).  16 bits/dim keeps
#: the interleaved key inside a signed 64-bit long with room to spare.
Z_BITS = 16


def _scale_expr(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Clamp + scale a value into the [0, 2^bits) integer grid — floor of
    the linear map, saturating at the edges (same discipline as the
    histogram-quantile sketch bins)."""
    n = 1 << bits
    scaled = F.floor((col - F.lit(lo)) / F.lit((hi - lo) / n)).cast("long")
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), scaled))


def zorder_key(
    x: Column,
    y: Column,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bits: int = Z_BITS,
) -> Column:
    """Interleaved Morton key of two columns: bit i of x lands at key bit
    2i, bit i of y at 2i+1.  Pure shift/mask expression — ``bits`` terms
    per dimension, folded into one whole-stage-codegen expression."""
    xs = _scale_expr(x, *x_range, bits=bits)
    ys = _scale_expr(y, *y_range, bits=bits)
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(xs.bitwiseAND(F.lit(1 << i)), i)
        ).bitwiseOR(F.shiftleft(ys.bitwiseAND(F.lit(1 << i)), i + 1))
    return key


def zorder_key_sql(
    x: str,
    y: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bits: int = Z_BITS,
) -> str:
    """The identical arithmetic as portable SQL text (DuckDB oracle)."""
    n = 1 << bits

    def scale(col: str, lo: float, hi: float) -> str:
        w = (hi - lo) / n
        return (
            f"least({n - 1}, greatest(0, "
            f"CAST(floor(({col} - {lo}) / {w}) AS BIGINT)))"
        )

    xs, ys = scale(x, *x_range), scale(y, *y_range)
    terms = []
    for i in range(bits):
        terms.append(f"(({xs} & {1 << i}) << {i})")
        terms.append(f"(({ys} & {1 << i}) << {i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_shard_stats(
    df: DataFrame,
    key: Column,
    x: Column,
    y: Column,
    n_shards: int = 16,
    key_bits: int = 2 * Z_BITS,
) -> DataFrame:
    """Layout audit: split the key space into ``n_shards`` equal-width
    ranges (shard = key >> (key_bits - log2(n_shards)) — a pure map, no
    ntile window, so rows never leave their partition to learn their
    shard) and report each shard's row count and bounding box on both
    dimensions.  The per-shard (x_max - x_min)/(y_max - y_min) extents are
    exactly what parquet min/max pruning sees per file.

    ``n_shards`` must be a power of two: the shard is a pure bit shift of
    the key, so only power-of-two counts yield equal-width ranges (e.g.
    10 would silently audit 8 wider shards).
    """
    if n_shards < 1 or n_shards & (n_shards - 1):
        raise ValueError(f"n_shards must be a power of two, got {n_shards}")
    shift = key_bits - (n_shards.bit_length() - 1)
    shard = F.shiftright(key, shift).cast("long").alias("shard")
    return (
        df.select(shard, x.alias("_x"), y.alias("_y"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("_x").alias("x_min"),
            F.max("_x").alias("x_max"),
            F.min("_y").alias("y_min"),
            F.max("_y").alias("y_max"),
        )
    )


def linear_key(
    x: Column, x_range: tuple[float, float], bits: int = Z_BITS
) -> Column:
    """Single-dimension sort key on the SAME grid and key width as
    ``zorder_key`` (x bits shifted to the top half) — the comparison
    baseline for the layout audit."""
    return F.shiftleft(_scale_expr(x, *x_range, bits=bits), bits)


def linear_key_sql(x: str, x_range: tuple[float, float], bits: int = Z_BITS) -> str:
    n = 1 << bits
    lo, hi = x_range
    w = (hi - lo) / n
    return (
        f"(least({n - 1}, greatest(0, "
        f"CAST(floor(({x} - {lo}) / {w}) AS BIGINT))) << {bits})"
    )
