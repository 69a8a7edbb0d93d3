"""Skew mitigation operators (operators/skew.py): salted two-phase
aggregation, value-salted exact count-distinct, hot-key replicate join, and
the detect_hot_keys trigger that wires q_key_skew's straggler prediction to
the mitigation.

Every equality test runs on a PLANTED Zipfian table (one key owning ~2/3 of
the rows) because the driver fixtures are deliberately uniform; the oracle
gate (q_salted_agg / q_skew_join vs DuckDB) covers the fixture tables.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def zipf(spark):
    # key "hot" owns 200 of 260 rows; 6 cold keys with 10 each
    rows = [(i, "hot", float(i % 7), i % 5) for i in range(200)] + [
        (1000 + 10 * k + j, f"cold{k}", float(j), j)
        for k in range(6)
        for j in range(10)
    ]
    return spark.createDataFrame(rows, ["row_id", "key", "val", "tag"])


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestDetectHotKeys:
    def test_planted_hot_key_found(self, spark, zipf):
        from dipper_spark.operators.skew import detect_hot_keys

        # hot: 200 rows, mean = 260/7 ~ 37 -> factor ~5.4; cold factor ~0.27
        assert detect_hot_keys(zipf, "key", straggler_threshold=4.0) == ["hot"]

    def test_uniform_table_has_no_hot_keys(self, spark):
        from dipper_spark.operators.skew import detect_hot_keys

        df = spark.createDataFrame(
            [(i, f"k{i % 10}") for i in range(100)], ["row_id", "key"]
        )
        assert detect_hot_keys(df, "key", straggler_threshold=2.0) == []

    def test_cap_and_order(self, spark, zipf):
        from dipper_spark.operators.skew import detect_hot_keys

        # threshold 0 makes every key "hot": hottest first, cap respected
        got = detect_hot_keys(zipf, "key", straggler_threshold=0.0, max_keys=3)
        assert got[0] == "hot" and len(got) == 3


class TestSaltedAggregate:
    def test_equals_plain_groupby(self, spark, zipf):
        from dipper_spark.operators.skew import salted_aggregate

        got = salted_aggregate(
            zipf,
            "key",
            {
                "n_rows": ("count", None),
                "total": ("sum", "val"),
                "lo": ("min", "val"),
                "hi": ("max", "val"),
                "mean": ("avg", "val"),
            },
            salt_on="row_id",
            n_salts=8,
        )
        want = zipf.groupBy("key").agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("val").alias("total"),
            F.min("val").alias("lo"),
            F.max("val").alias("hi"),
            F.avg("val").alias("mean"),
        )
        g = {r.key: r for r in got.collect()}
        w = {r.key: r for r in want.collect()}
        assert set(g) == set(w)
        for k in w:
            assert g[k].n_rows == w[k].n_rows
            assert g[k].lo == w[k].lo and g[k].hi == w[k].hi
            assert g[k].total == pytest.approx(w[k].total, abs=1e-9)
            assert g[k].mean == pytest.approx(w[k].mean, abs=1e-12)

    def test_avg_is_weighted_not_avg_of_avgs(self, spark):
        from dipper_spark.operators.skew import salted_aggregate

        # cells of very different sizes: avg-of-avgs would give 0.5*(1+10)
        rows = [(i, "g", 1.0) for i in range(99)] + [(99, "g", 10.0)]
        df = spark.createDataFrame(rows, ["row_id", "key", "val"])
        [r] = salted_aggregate(
            df, "key", {"mean": ("avg", "val")}, salt_on="row_id", n_salts=4
        ).collect()
        assert r.mean == pytest.approx((99 * 1.0 + 10.0) / 100)

    def test_rejects_unknown_func(self, spark, zipf):
        from dipper_spark.operators.skew import salted_aggregate

        with pytest.raises(ValueError, match="unsupported agg"):
            salted_aggregate(
                zipf, "key", {"x": ("median", "val")}, salt_on="row_id"
            )

    def test_plan_two_phase_shape(self, spark, zipf):
        from dipper_spark.operators.skew import salted_aggregate

        out = salted_aggregate(
            zipf,
            "key",
            {"n_rows": ("count", None), "total": ("sum", "val")},
            salt_on="row_id",
            n_salts=8,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # partial over (key, salt) -> exchange -> final over key -> exchange:
        # exactly two keyed exchanges, all JVM-side, no window/sort
        assert plan.count("Exchange hashpartitioning") == 2
        assert "Python" not in plan and "Window" not in plan


class TestSaltedCountDistinct:
    def test_exact_vs_count_distinct(self, spark, zipf):
        from dipper_spark.operators.skew import salted_count_distinct

        got = {
            r.key: r.n_distinct
            for r in salted_count_distinct(zipf, "key", "tag", n_salts=8).collect()
        }
        want = {
            r.key: r.n
            for r in zipf.groupBy("key")
            .agg(F.count_distinct("tag").alias("n"))
            .collect()
        }
        assert got == want

    def test_nulls_excluded_like_count_distinct(self, spark):
        from dipper_spark.operators.skew import salted_count_distinct

        df = spark.createDataFrame(
            [("g", "a"), ("g", "a"), ("g", None), ("g", "b")], ["key", "v"]
        )
        [r] = salted_count_distinct(df, "key", "v", n_salts=4).collect()
        assert r.n_distinct == 2

    def test_all_null_group_reports_zero_like_count_distinct(self, spark):
        """COUNT(DISTINCT v) on an all-NULL group is 0, not an absent row
        — the salted form must keep the key in the universe."""
        from dipper_spark.operators.skew import salted_count_distinct

        df = spark.createDataFrame(
            [("g", "a"), ("h", None), ("h", None)], ["key", "v"]
        )
        got = {r.key: r.n_distinct
               for r in salted_count_distinct(df, "key", "v", n_salts=4).collect()}
        assert got == {"g": 1, "h": 0}

    def test_null_group_key_matches_count_distinct(self, spark):
        """A NULL group KEY must report its real distinct count — the
        restore path must be null-safe (ADVICE r10: a null-unsafe left
        equality join coalesced the NULL key's count to 0)."""
        from dipper_spark.operators.skew import salted_count_distinct

        df = spark.createDataFrame(
            [(None, "a"), (None, "b"), ("g", "a"), (None, None)],
            ["key", "v"],
        )
        got = {r.key: r.n_distinct
               for r in salted_count_distinct(df, "key", "v", n_salts=4).collect()}
        want = {r.key: r.n
                for r in df.groupBy("key")
                .agg(F.count_distinct("v").alias("n")).collect()}
        assert got == want == {None: 2, "g": 1}

    def test_all_null_values_under_null_key(self, spark):
        """NULL key whose values are ALL NULL: restored with 0 like
        COUNT(DISTINCT)."""
        from dipper_spark.operators.skew import salted_count_distinct

        df = spark.createDataFrame(
            [(None, None), ("g", "a")], ["key", "v"]
        )
        got = {r.key: r.n_distinct
               for r in salted_count_distinct(df, "key", "v", n_salts=4).collect()}
        assert got == {None: 0, "g": 1}

    def test_salt_cells_partition_the_distinct_set(self, spark, zipf):
        """Equal values always share a cell, so per-cell distinct counts are
        disjoint — the sum is exact by partitioning, not by luck."""
        from dipper_spark.operators.skew import _salt_col

        cells = (
            zipf.withColumn("_salt", _salt_col("tag", 8))
            .groupBy("tag")
            .agg(F.count_distinct("_salt").alias("n_cells"))
        )
        assert all(r.n_cells == 1 for r in cells.collect())


class TestSkewJoin:
    def _dim(self, spark):
        return spark.createDataFrame(
            [("hot", "H")] + [(f"cold{k}", f"C{k}") for k in range(6)],
            ["dkey", "label"],
        )

    def test_inner_equals_plain_join(self, spark, zipf, no_broadcast):
        from dipper_spark.operators.skew import skew_join

        dim = self._dim(spark)
        got = skew_join(
            zipf, dim, "key", "dkey", salt_on="row_id",
            hot_keys=["hot"], n_salts=8,
        ).select("row_id", "key", "label")
        want = zipf.join(dim, zipf["key"] == dim["dkey"]).select(
            "row_id", "key", "label"
        )
        assert _sorted_rows(got) == _sorted_rows(want)

    def test_left_keeps_unmatched_fact_rows_once(self, spark, zipf, no_broadcast):
        from dipper_spark.operators.skew import skew_join

        dim = self._dim(spark).filter(F.col("dkey") != "cold0")
        got = skew_join(
            zipf, dim, "key", "dkey", salt_on="row_id",
            hot_keys=["hot"], n_salts=8, how="left",
        ).select("row_id", "label")
        want = zipf.join(dim, zipf["key"] == dim["dkey"], "left").select(
            "row_id", "label"
        )
        assert _sorted_rows(got) == _sorted_rows(want)

    def test_empty_hot_list_degrades_to_plain(self, spark, zipf, no_broadcast):
        from dipper_spark.operators.skew import skew_join

        dim = self._dim(spark)
        got = skew_join(
            zipf, dim, "key", "dkey", salt_on="row_id", hot_keys=[], n_salts=8
        ).select("row_id", "label")
        want = zipf.join(dim, zipf["key"] == dim["dkey"]).select(
            "row_id", "label"
        )
        assert _sorted_rows(got) == _sorted_rows(want)

    def test_salt_all_keys_when_none(self, spark, zipf, no_broadcast):
        from dipper_spark.operators.skew import skew_join

        dim = self._dim(spark)
        got = skew_join(
            zipf, dim, "key", "dkey", salt_on="row_id", hot_keys=None, n_salts=4
        ).select("row_id", "label")
        want = zipf.join(dim, zipf["key"] == dim["dkey"]).select(
            "row_id", "label"
        )
        assert _sorted_rows(got) == _sorted_rows(want)

    def test_hot_key_rows_spread_across_cells(self, spark, zipf):
        """The point of the salt: the hot key's 200 probe rows land in ~8
        cells instead of 1 reducer; cold keys stay in exactly 1 cell."""
        from dipper_spark.operators.skew import _salt_col

        salted = zipf.withColumn(
            "_salt",
            F.when(F.col("key") == "hot", _salt_col("row_id", 8)).otherwise(
                F.lit(0)
            ),
        )
        per_cell = (
            salted.groupBy("key", "_salt").agg(F.count(F.lit(1)).alias("n"))
        )
        hot_cells = per_cell.filter(F.col("key") == "hot").collect()
        assert len(hot_cells) >= 6  # 200 hashes over 8 cells fill nearly all
        assert max(r.n for r in hot_cells) < 200 / 2  # no cell owns the key
        cold = per_cell.filter(F.col("key") != "hot")
        assert cold.select("key").distinct().count() == cold.count()

    def test_plan_salted_shuffle_shape(self, spark, zipf, no_broadcast):
        """With broadcast off, the salted join must be a keyed
        shuffle join on (key, salt) — dim replicated via explode, never a
        nested-loop, nothing python-side."""
        from dipper_spark.operators.skew import skew_join

        out = skew_join(
            zipf, self._dim(spark), "key", "dkey", salt_on="row_id",
            hot_keys=["hot"], n_salts=8,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
        assert "Generate explode" in plan
        assert "Python" not in plan

    def test_rejects_unsupported_how(self, spark, zipf):
        from dipper_spark.operators.skew import skew_join

        with pytest.raises(ValueError, match="inner/left"):
            skew_join(
                zipf, self._dim(spark), "key", "dkey",
                salt_on="row_id", how="full",
            )


class TestDetectHotKeysNulls:
    def test_null_keys_never_enter_the_hot_list(self, spark):
        from dipper_spark.operators.skew import detect_hot_keys

        rows = [(i, "hot") for i in range(50)] + [(100 + i, None) for i in range(200)]
        df = spark.createDataFrame(rows, ["row_id", "key"])
        got = detect_hot_keys(df, "key", straggler_threshold=0.0)
        assert None not in got and got == ["hot"]


class TestGuardedDispatch:
    """The runtime guard (guarded_join / guarded_aggregate): salted plan
    ENGAGES on a planted Zipfian key, plain plan UNTOUCHED on uniform
    data — plan-level locks, plus row equality on both branches."""

    def _uniform(self, spark):
        return spark.createDataFrame(
            [(i, f"k{i % 10}", float(i)) for i in range(100)],
            ["row_id", "key", "val"],
        )

    def _dim_for(self, spark, fact):
        keys = [r.key for r in fact.select("key").distinct().collect()]
        return spark.createDataFrame(
            [(k, f"L-{k}") for k in keys], ["dkey", "label"]
        )

    def test_join_engages_on_zipf(self, spark, zipf, no_broadcast):
        from dipper_spark.operators.skew import guarded_join

        dim = self._dim_for(spark, zipf)
        out = guarded_join(
            zipf, dim, "key", "dkey", salt_on="row_id",
            straggler_threshold=4.0, n_salts=8,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Generate explode" in plan  # hot dim rows replicated: salted
        plain = zipf.join(dim, zipf["key"] == dim["dkey"], "inner")
        assert _sorted_rows(out) == _sorted_rows(plain)

    def test_join_plain_on_uniform(self, spark, no_broadcast):
        from dipper_spark.operators.skew import guarded_join

        fact = self._uniform(spark)
        dim = self._dim_for(spark, fact)
        out = guarded_join(
            fact, dim, "key", "dkey", salt_on="row_id",
            straggler_threshold=4.0, n_salts=8,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # genuinely the plain join: no salt, no replication, no extra project
        assert "Generate" not in plan and "explode" not in plan
        plain = fact.join(dim, fact["key"] == dim["dkey"], "inner")
        assert _sorted_rows(out) == _sorted_rows(plain)

    def test_agg_engages_on_zipf(self, spark, zipf):
        from dipper_spark.operators.skew import guarded_aggregate

        out = guarded_aggregate(
            zipf, "key",
            {"n": ("count", None), "s": ("sum", "val"), "m": ("avg", "val")},
            salt_on="row_id", straggler_threshold=4.0, n_salts=8,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 2  # two-phase salted
        want = zipf.groupBy("key").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("val").alias("s"),
            F.avg("val").alias("m"),
        )
        assert _sorted_rows(out) == _sorted_rows(want)

    def test_agg_plain_on_uniform(self, spark):
        from dipper_spark.operators.skew import guarded_aggregate

        df = self._uniform(spark)
        out = guarded_aggregate(
            df, "key", {"n": ("count", None), "s": ("sum", "val")},
            salt_on="row_id", straggler_threshold=4.0, n_salts=8,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1  # single-phase plain
        want = df.groupBy("key").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("val").alias("s"),
        )
        assert _sorted_rows(out) == _sorted_rows(want)

    def test_agg_trigger_counts_null_group(self, spark):
        """A massive NULL group straggles an aggregation like any hot key:
        the aggregate trigger must see it (the join trigger rightly skips
        NULLs — they never match a join)."""
        from dipper_spark.operators.skew import guarded_aggregate

        rows = [(i, None, 1.0) for i in range(200)] + [
            (1000 + k, f"k{k}", 1.0) for k in range(8)
        ]
        df = spark.createDataFrame(rows, ["row_id", "key", "val"])
        out = guarded_aggregate(
            df, "key", {"n": ("count", None)},
            salt_on="row_id", straggler_threshold=4.0, n_salts=8,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 2  # engaged
        got = {r.key: r.n for r in out.collect()}
        assert got[None] == 200 and all(got[f"k{k}"] == 1 for k in range(8))


class TestReservedColumnCollision:
    """ADVICE r10: a user column literally named ``_salt``/``_salts`` must
    survive the salted operators untouched — scratch names are generated
    collision-free, not hard-coded."""

    def test_skew_join_preserves_user_salt_column(self, spark, no_broadcast):
        from dipper_spark.operators.skew import skew_join

        fact = spark.createDataFrame(
            [("hot", i, f"u{i}") for i in range(20)]
            + [("cold", 99, "u99")],
            ["key", "_salt", "row_id"],
        )
        dim = spark.createDataFrame(
            [("hot", "H", -1), ("cold", "C", -2)], ["dkey", "label", "_salts"]
        )
        got = skew_join(
            fact, dim, "key", "dkey", salt_on="row_id",
            hot_keys=["hot"], n_salts=4,
        )
        plain = fact.join(dim, fact["key"] == dim["dkey"], "inner")
        assert "_salt" in got.columns and "_salts" in got.columns
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, plain.collect())
        )

    def test_salted_aggregate_with_user_salt_column(self, spark):
        from dipper_spark.operators.skew import salted_aggregate

        df = spark.createDataFrame(
            [("g", 1, 10.0), ("g", 2, 20.0), ("h", 3, 5.0)],
            ["key", "_salt", "x"],
        )
        got = {
            (r.key): (r.n, r.s)
            for r in salted_aggregate(
                df, "key",
                {"n": ("count", None), "s": ("sum", "x")},
                salt_on="_salt", n_salts=4,
            ).collect()
        }
        assert got == {"g": (2, 30.0), "h": (1, 5.0)}

    def test_salted_count_distinct_with_user_salt_column(self, spark):
        from dipper_spark.operators.skew import salted_count_distinct

        df = spark.createDataFrame(
            [("g", "a", 0), ("g", "b", 1), ("g", "a", 2)],
            ["key", "v", "_salt"],
        )
        [r] = salted_count_distinct(df, "key", "v", n_salts=4).collect()
        assert r.n_distinct == 2
