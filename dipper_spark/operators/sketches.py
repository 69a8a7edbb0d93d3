"""Count-min sketch as a relational aggregate: heavy-hitter frequency
estimation with sublinear state.

Beyond-reference operator (SURVEY §2's LLM-pipeline section).  The CMS is
the streaming-world token/heavy-hitter counter; expressed relationally it
is just a keyed aggregation, which buys the scale properties for free:

- **build** = explode each item into ``depth`` (row, bucket) probes and
  hash-aggregate — map-side partial combine compresses each partition to
  at most depth x width counters before the shuffle, so the shuffle volume
  is the SKETCH size, not the stream size;
- **merge** across partitions/days/sources is the same groupBy (CMS is a
  counter matrix; merging is addition) — no custom UDAF needed;
- **estimate** = min over the item's depth counters, an overestimate by
  construction (collisions only ever add).

Hashes are the engine-portable md5-prefix integers used across the dedup
family, so a SQL oracle reproduces the sketch bit-for-bit — unlike opaque
binary sketch blobs (datasketches et al.), this one is auditable by query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(d: Column, item: Column, width: int) -> Column:
    h = F.conv(F.substring(F.md5(F.concat(d.cast("string"), F.lit(":"), item)), 1, 8), 16, 10)
    return (h.cast("long") % width).alias("bucket")


def count_min_build(
    df: DataFrame, item: Column | str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: (d, bucket, c) counter rows, d in [0, depth)."""
    it = F.col(item) if isinstance(item, str) else item
    probes = df.select(
        it.alias("_item"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    return (
        probes.select("d", _bucket(F.col("d"), F.col("_item"), width))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def linear_counting(
    df: DataFrame,
    item: Column | str,
    groups: list[str],
    m: int = 4096,
) -> DataFrame:
    """Linear-counting distinct estimate per group: hash items into ``m``
    buckets, est = -m·ln(1 - occupied/m) — the low-cardinality-regime
    distinct sketch.  Its large-cardinality sibling is ``hll_registers``
    / ``hll_estimate`` below (fixed 2**p-register state where LC's
    occupancy bitmap saturates); both are exact relational SQL, portable
    and oracle-checkable.

    Shape: distinct (group, bucket) hash-agg — state per group is at most
    ``m`` rows however large the stream; merge across partitions/days is
    the same distinct.  Estimator bias is O(m·e^{-n/m}); saturated groups
    (occupied = m) return NULL rather than ±inf.  Rounding is
    floor(x+0.5) for engine-identical half-handling.

    Returns (*groups, occupied, est_distinct).
    """
    it = F.col(item) if isinstance(item, str) else item
    bucket = (
        F.conv(F.substring(F.md5(it), 1, 8), 16, 10).cast("long") % m
    ).alias("bucket")
    occ = (
        df.select(*groups, bucket)
        .distinct()
        .groupBy(*groups)
        .agg(F.count(F.lit(1)).alias("occupied"))
    )
    frac = F.col("occupied").cast("double") / F.lit(float(m))
    est = F.floor(-F.lit(float(m)) * F.log(F.lit(1.0) - frac) + F.lit(0.5)).cast("long")
    return occ.select(
        *groups,
        F.col("occupied").cast("long").alias("occupied"),
        F.when(F.col("occupied") < m, est).alias("est_distinct"),
    )


def count_min_estimate(
    cms: DataFrame, items: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-query the sketch for each row of ``items``: est = min over the
    item's depth counters (0 when a counter row is absent — the item was
    never seen).  The sketch side is depth x width rows → broadcast."""
    probes = items.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    ).withColumn("bucket", _bucket(F.col("d"), F.col(item_col), width))
    joined = probes.join(F.broadcast(cms), ["d", "bucket"], "left")
    others = [c for c in items.columns]
    return (
        joined.groupBy(*others)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_n"))
    )


def bloom_build(df: DataFrame, item: Column | str, k: int = 3, m: int = 8192) -> DataFrame:
    """Bloom filter as a relational bit-set: the DISTINCT occupied positions
    of ``k`` md5-derived hashes over ``m`` slots — one row per SET bit
    (≤ m rows total, bounded by the filter size, not the corpus).

    This is the Dolma-style approximate-membership dedup primitive.  At
    100 TB the corpus is scanned ONCE to build ≤ m rows; every later probe
    joins against the broadcast bit-set, never the corpus.  Merging two
    filters is a UNION + DISTINCT (bitwise OR in set form).  Unlike
    engine-opaque bloom blobs, the bit-set is exact SQL — portable and
    oracle-checkable.
    """
    it = F.col(item) if isinstance(item, str) else item
    probes = df.select(
        it.alias("_item"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("d"),
    )
    return (
        probes.select(_bucket(F.col("d"), F.col("_item"), m).alias("pos"))
        .distinct()
    )


def bloom_probe(
    bits: DataFrame, items: DataFrame, item_col: str, k: int = 3, m: int = 8192
) -> DataFrame:
    """Membership test: an item is 'maybe present' iff ALL ``k`` of its
    positions are set (false positives possible, false negatives not).
    The bit-set side is ≤ m rows → broadcast; the probe is map-side."""
    probes = items.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("d")
    ).withColumn("pos", _bucket(F.col("d"), F.col(item_col), m))
    joined = probes.join(
        F.broadcast(bits.withColumn("_set", F.lit(1))), ["pos"], "left"
    )
    others = [c for c in items.columns]
    return joined.groupBy(*others).agg(
        (F.min(F.coalesce(F.col("_set"), F.lit(0))) == 1).alias("maybe_present")
    )


def histogram_quantiles(
    df: DataFrame,
    value: Column | str,
    groups: list[str],
    probs: dict[str, float],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Mergeable fixed-width-histogram quantile sketch: the bounded-state
    quantile path for data too big to sort (the t-digest/KLL role, in
    exact-SQL form).  Values are binned into ``n_bins`` equal slots over
    [lo, hi) (clamped at the edges); the p-quantile estimate is the UPPER
    edge of the first bin whose cumulative count reaches p·total —
    deterministic, engine-portable, error bounded by one bin width.

    Shape at 100 TB: one hash-agg to (group, bin) counts — map-side
    partial combine compresses every partition to ≤ n_bins rows per group
    before the shuffle, so shuffle volume is the SKETCH size, not the data
    size; merging sketches across partitions/days/sources is the same
    grouped sum.  The cumulative window runs over ≤ n_bins rows per group.
    (The exact-percentile sibling is ``q_length_percentiles``; this is the
    variant whose state stays bounded when the value column has unbounded
    cardinality.)

    ``probs`` maps output column name -> probability.  Returns
    (*groups, n_total, <probs keys...>).
    """
    from pyspark.sql import Window

    v = F.col(value) if isinstance(value, str) else value
    width = (hi - lo) / n_bins
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")),
    ).alias("bin")
    counts = df.select(*groups, bin_).groupBy(*groups, "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy(*groups).orderBy("bin")
    wt = Window.partitionBy(*groups)
    cum = counts.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(wt)
    )
    edge = F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6)
    aggs = [
        F.min(
            F.when(
                F.col("cum").cast("double") >= F.lit(p) * F.col("total").cast("double"),
                edge,
            )
        ).alias(name)
        for name, p in probs.items()
    ]
    return cum.groupBy(*groups).agg(
        F.max("total").cast("long").alias("n_total"), *aggs
    )


def _bit_length(w: Column, bits: int) -> Column:
    """bit_length(w) for 0 <= w < 2**bits as a comparison cascade — exact
    integer branching, no floating log2 (whose libm rounding near powers
    of two need not agree across engines).  The oracle mirrors the same
    CASE chain textually."""
    c = F.when(w >= (1 << (bits - 1)), F.lit(bits))
    for b in range(bits - 1, 0, -1):
        c = c.when(w >= (1 << (b - 1)), F.lit(b))
    return c.otherwise(F.lit(0))


def hll_registers(
    df: DataFrame, item: Column | str, groups: list[str], p: int = 10
) -> DataFrame:
    """HyperLogLog registers as RELATIONAL state: (group, bucket, rho) rows
    with rho = max over items hashing to the bucket — refuting the usual
    "HLL blobs are engine-opaque" objection (cf. ``linear_counting``): kept
    as rows, the sketch is plain SQL, mergeable by ``groupBy(bucket).max``
    and bit-reproducible by a DuckDB oracle.

    Flajolet et al. 2007 layout on the portable 32-bit md5-prefix hash:
    bucket = low ``p`` bits, w = high ``32-p`` bits, rho = leading zeros of
    w in its ``32-p``-bit frame + 1 (w = 0 -> 32-p+1).

    Shape at 100 TB: one hash-agg to at most 2**p rows per group — map-side
    partial max compresses every partition to sketch size before the
    shuffle; merging shards/days/sources is the same grouped max.  State is
    FIXED at m = 2**p registers regardless of cardinality — the
    large-cardinality regime where ``linear_counting``'s occupancy bitmap
    saturates (occupied -> m makes ln(1 - occ/m) blow up).
    """
    it = F.col(item) if isinstance(item, str) else item
    wbits = 32 - p
    # NULL items never count toward COUNT(DISTINCT ...) — and unhandled they
    # would forge a register: md5(NULL) -> _h NULL -> bucket NULL while
    # _bit_length's CASE falls through to ELSE 0, yielding the maximal rho
    # and inflating n_present/s_present in hll_estimate.
    hashed = df.filter(it.isNotNull()).select(
        *groups,
        F.conv(F.substring(F.md5(it), 1, 8), 16, 10).cast("long").alias("_h"),
    )
    rho = F.lit(wbits + 1) - _bit_length(F.shiftright(F.col("_h"), p), wbits)
    return (
        hashed.select(
            *groups,
            F.col("_h").bitwiseAND((1 << p) - 1).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, groups: list[str], p: int = 10) -> DataFrame:
    """Collapse HLL registers to a per-group cardinality estimate.

    E_raw = alpha_m * m^2 / (V + sum 2^-rho) where V = zero registers
    (absent rows); small-range correction E = m * ln(m / V) when
    E_raw <= 2.5m and V > 0 (Flajolet et al. 2007).  Every double here is
    cross-engine deterministic: 2^-rho = 1.0 / (1 << rho) is an exact
    power of two, so the register sum — all terms multiples of 2^-(33-p)
    with total < 2^p — is EXACT in IEEE double regardless of summation
    order (<= 53 mantissa bits used); alpha/division/ln follow the
    exact-double oracle discipline proven by ``linear_counting``.

    Returns (*groups, n_present, registers_fp, estimate) where
    registers_fp is an md5 over the sorted "bucket:rho" rows — the witness
    that Spark and the oracle built identical register state.
    """
    m = 1 << p
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    agg = registers.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_present"),
        # NB: F.shiftleft's python signature takes only an int amount;
        # the SQL builtin accepts a column — 1 << rho is exact, and
        # 1.0 / 2^rho is an exact power of two in IEEE double
        F.sum(F.lit(1.0) / F.expr("shiftleft(1, rho)").cast("double")).alias(
            "_s_present"
        ),
        F.md5(
            F.concat_ws(
                ",",
                F.array_sort(
                    F.collect_list(
                        F.concat_ws(
                            ":",
                            F.col("bucket").cast("string"),
                            F.col("rho").cast("string"),
                        )
                    )
                ),
            )
        ).alias("registers_fp"),
    )
    v = (F.lit(m) - F.col("n_present")).cast("double")
    s = F.col("_s_present") + v
    raw = alpha * F.lit(float(m * m)) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > F.lit(0.0)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(
        *groups,
        F.col("n_present").cast("long").alias("n_present"),
        "registers_fp",
        est.alias("estimate"),
    )
