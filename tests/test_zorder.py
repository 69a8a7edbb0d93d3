"""Z-order layout key: interleaving correctness and the pruning win."""

from pyspark.sql import functions as F

from dipper_spark.io.zorder import (
    Z_BITS,
    linear_key,
    zorder_key,
    zorder_shard_stats,
)


def test_morton_interleave_bit_exact(spark):
    """zorder_key on the identity grid reproduces textbook Morton codes."""

    def morton(x: int, y: int) -> int:
        k = 0
        for i in range(Z_BITS):
            k |= ((x >> i) & 1) << (2 * i)
            k |= ((y >> i) & 1) << (2 * i + 1)
        return k

    pts = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (255, 7), (65535, 65535)]
    df = spark.createDataFrame(pts, ["x", "y"])
    ident = (0.0, float(1 << Z_BITS))
    got = df.select(
        "x", "y",
        zorder_key(
            F.col("x").cast("double"), F.col("y").cast("double"), ident, ident
        ).alias("k"),
    ).collect()
    for r in got:
        assert r.k == morton(r.x, r.y), (r.x, r.y)


def test_out_of_range_clamps(spark):
    df = spark.createDataFrame([(-5.0, 99999.0)], ["x", "y"])
    [r] = df.select(
        zorder_key(F.col("x"), F.col("y"), (0.0, 16.0), (0.0, 16.0), bits=4).alias("k")
    ).collect()
    # x clamps to 0, y clamps to 15 -> Morton(0, 15) = 0b10101010
    assert r.k == 0b10101010


def test_zorder_shards_bound_both_dims(spark):
    """On a uniform 2-D grid, z-order shards have a bounded extent on BOTH
    dimensions while value-sorted shards span the full y domain — the
    per-file min/max pruning win."""
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).cast("double").alias("x"),
        (F.col("id") / 64).cast("long").cast("double").alias("y"),
    )
    rng = (0.0, 64.0)
    zs = zorder_shard_stats(
        grid, zorder_key(F.col("x"), F.col("y"), rng, rng), F.col("x"), F.col("y"),
        n_shards=16,
    ).collect()
    ls = zorder_shard_stats(
        grid, linear_key(F.col("x"), rng), F.col("x"), F.col("y"), n_shards=16
    ).collect()
    # every z shard covers exactly a 16x16 quadrant: extent 15 on each dim
    assert len(zs) == 16
    for r in zs:
        assert r.n_rows == 256
        assert r.x_max - r.x_min == 15.0
        assert r.y_max - r.y_min == 15.0
    # linear shards: tight on x, FULL RANGE on y
    for r in ls:
        assert r.y_max - r.y_min == 63.0
        assert r.x_max - r.x_min <= 3.0


def test_shard_stats_rejects_non_power_of_two(spark):
    """The shard is a pure bit shift, so n_shards=10 would silently audit
    8 wider shards — the guard raises instead (round-9 ADVICE)."""
    import pytest

    grid = spark.range(4).select(
        F.col("id").cast("double").alias("x"), F.col("id").cast("double").alias("y")
    )
    rng = (0.0, 4.0)
    key = zorder_key(F.col("x"), F.col("y"), rng, rng)
    for bad in (0, 3, 10, 12):
        with pytest.raises(ValueError, match="power of two"):
            zorder_shard_stats(grid, key, F.col("x"), F.col("y"), n_shards=bad)
