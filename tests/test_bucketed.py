"""Bucketed co-located join: the pay-the-shuffle-once layout contract.

The assertion that matters at 100 TB: two tables bucketed on the join key
with the same bucket count join with NO Exchange and NO Sort in the plan —
the shuffle happened at write time, never again."""

import pyspark.sql.functions as F
import pytest

from dipper_spark.io.bucketed import bucketed_table, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Force a non-broadcast join so the bucketed distribution is what's
    under test (tiny test tables would otherwise broadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange_or_sort(spark, tmp_path, no_broadcast):
    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "t_bkt_a", ["k"], 4, path=str(tmp_path / "a"))
    write_bucketed(b, "t_bkt_b", ["k"], 4, path=str(tmp_path / "b"))
    try:
        joined = bucketed_table(spark, "t_bkt_a").join(
            bucketed_table(spark, "t_bkt_b"), "k"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # distribution comes from the buckets
        # (an in-partition Sort remains: since Spark 3.0 bucket sort order
        # is not propagated to the plan without the legacy outputOrdering
        # flag — the shuffle, the scale cost, is what bucketing eliminates)
        assert "Bucketed: true" in plan
        assert joined.count() == 1000
        # a raw-path read of the same files loses the bucket spec -> the
        # join shuffles again (the anti-pattern bucketed_table guards)
        raw = spark.read.parquet(str(tmp_path / "a")).join(
            bucketed_table(spark, "t_bkt_b"), "k"
        )
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in raw_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_a")
        spark.sql("DROP TABLE IF EXISTS t_bkt_b")


def test_bucketed_aggregation_skips_shuffle(spark, tmp_path, no_broadcast):
    df = spark.range(500).select((F.col("id") % 50).alias("k"), F.col("id").alias("v"))
    write_bucketed(df, "t_bkt_g", ["k"], 4, path=str(tmp_path / "g"))
    try:
        agg = bucketed_table(spark, "t_bkt_g").groupBy("k").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        # the groupBy key matches the bucket key: no exchange below the agg
        assert "Exchange" not in plan
        assert agg.count() == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_g")
