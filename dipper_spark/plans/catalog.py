"""Query catalog: the SURVEY §2 operator inventory exercised end-to-end.

Every entry is a pair (Spark plan builder, DuckDB oracle SQL) over the driver
synthetic tables.  The Spark side goes through the dipper_spark operator
library — these queries ARE the engine's integration surface, not ad-hoc SQL.

Conventions for oracle hash-stability:
- every computed/aggregate column is aliased identically on both sides;
- float outputs are rounded explicitly (summation order differs between
  engines at the ULP level — rounding makes the lexical values identical);
- timestamps never appear raw in outputs (epoch seconds / formatted strings
  instead: engine-dependent rendering would break the hash);
- counts are BIGINT on both sides (DuckDB count(*) is BIGINT; Spark count is
  LongType; DuckDB SUM(int) would be HUGEINT → always CAST in the oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.operators.util import tiny_df
from dipper_spark.core.triples import (
    dedup_triples,
    make_triples,
    predicate_histogram,
    union_graphs,
    void_stats,
)
from dipper_spark.operators import (
    anti_join,
    broadcast_lookup,
    canonical_pair,
    composite_key,
    dispatch,
    group_zscore,
    interval_rollup,
    one_to_one_mappings,
    pairwise_within_group,
    qualifier_filter,
    range_join,
    score_threshold,
    test_id_subset,
    topk_per_group,
)
from dipper_spark.session import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _r2(c):  # noqa: ANN001 - column-expr helper
    return F.round(c, 2)


def _cents(c, grid: int = 100):  # noqa: ANN001 - column-expr helper
    """Exact integer units of a decimal-grid double (2-dec money by
    default): floor(v*grid + 0.5) as BIGINT.  Summing these is exact and
    order-free; a plain sum(double) at a fixed group count drifts with
    partition layout once group size is large enough (seen at sf1.0 —
    round-2/round-6 boundary flips in q_star_join_revenue/q_json_extract).
    SQL mirror: CAST(floor(col * 100 + 0.5) AS BIGINT)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.floor(col * F.lit(float(grid)) + F.lit(0.5)).cast("long")


# --------------------------------------------------------------------------
# scans / filters / aggregation core
# --------------------------------------------------------------------------


@register(
    "q_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(CAST(sum(ep100) AS DOUBLE) / 100.0, 2)           AS sum_base_price,
           round(CAST(sum(ep100 * (100 - d100)) AS DOUBLE) / 10000.0, 2)
                                                                  AS sum_disc_price,
           round(CAST(sum(ep100 * (100 - d100) * (100 + t100)) AS DOUBLE)
                 / 1000000.0, 2)                                  AS sum_charge,
           round(avg(l_quantity), 6)                              AS avg_qty,
           round((CAST(sum(d100) AS DOUBLE) / count(*)) / 100.0, 6) AS avg_disc,
           count(*)                                               AS count_order
    FROM (SELECT l_returnflag, l_linestatus, l_quantity, l_shipdate,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS ep100,
                 CAST(floor(l_discount * 100 + 0.5) AS BIGINT)      AS d100,
                 CAST(floor(l_tax * 100 + 0.5) AS BIGINT)           AS t100
          FROM lineitem)
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped scan→filter→hash-aggregate.

    Operator parity: P1 projection + P7-style pushdown filter + the A-family
    partial/final hash aggregation (dipper's per-source counters, A8).
    Plan shape to verify: filter and column pruning reach the parquet scan;
    one shuffle for the final agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # money in exact integer cents (_cents): sum_qty/avg_qty stay float —
    # quantities are integer-valued doubles, whose sums are already exact
    ep, d, t = _cents("l_extendedprice"), _cents("l_discount"), _cents("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02"))
        .select("l_returnflag", "l_linestatus", "l_quantity",
                ep.alias("ep100"), d.alias("d100"), t.alias("t100"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r2(F.sum("l_quantity")).alias("sum_qty"),
            F.round(F.sum("ep100").cast("double") / F.lit(100.0), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("ep100") * (F.lit(100) - F.col("d100"))).cast("double")
                / F.lit(10000.0), 2
            ).alias("sum_disc_price"),
            # the triple product is ~1.2e11/row — a BIGINT sum wraps near
            # sf13 (Spark non-ANSI wraps silently, DuckDB errors: the
            # engines would diverge DIFFERENTLY).  Sum in DECIMAL(38,0)
            # (exact to 1e38, i.e. any conceivable SF); DuckDB's
            # sum(BIGINT) is already HUGEINT (int128) so the oracle side
            # is exact without a cast.
            F.round(
                F.sum(
                    (
                        F.col("ep100") * (F.lit(100) - F.col("d100"))
                        * (F.lit(100) + F.col("t100"))
                    ).cast("decimal(38,0)")
                ).cast("double") / F.lit(1000000.0), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
            F.sum("d100").alias("_sd100"),
        )
        .withColumn(
            "avg_disc",
            F.round(
                (F.col("_sd100").cast("double") / F.col("count_order")) / F.lit(100.0), 6
            ),
        )
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "sum_charge", "avg_qty", "avg_disc", "count_order",
        )
    )


@register(
    "q_star_join_revenue",
    """
    SELECT r_name, n_name,
           round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                          * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                      AS DOUBLE) / 10000.0, 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY r_name, n_name
    """,
)
def q_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MGI-style star join (J1): fact probed against broadcast dims.

    The reference hand-schedules build-before-probe dict passes
    (MGI.parse 420-444); here the same DAG is declarative and the dims carry
    explicit broadcast hints — zero shuffle on the fact side for the dim
    joins; the orders join is the only co-partitioned shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    star = broadcast_lookup(
        broadcast_lookup(
            broadcast_lookup(
                li, load_table(spark, sf_dir, "supplier"), li["l_suppkey"] == F.col("s_suppkey")
            ),
            load_table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ),
        load_table(spark, sf_dir, "region"),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return (
        star.join(orders, star["l_orderkey"] == orders["o_orderkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(
                    _cents("l_extendedprice")
                    * (F.lit(100) - _cents("l_discount"))
                ).cast("double") / F.lit(10000.0), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_topk_per_group",
    """
    SELECT p_brand, p_partkey, p_retailprice, rank FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             CAST(row_number() OVER (PARTITION BY p_brand
                                     ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rank
      FROM part)
    WHERE rank <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bgee top-k per gene (W1) → top-3 parts per brand by price.

    Tie-break on p_partkey: the reference's pandas stable sort is not
    reproducible under parallelism, so a distributed rewrite must pick a
    total order (SURVEY §2.6).
    """
    part = load_table(spark, sf_dir, "part")
    out = topk_per_group(
        part,
        "p_brand",
        [F.col("p_retailprice").desc(), F.col("p_partkey").asc()],
        k=3,
        keep_rank=True,
    )
    return out.select(
        "p_brand", "p_partkey", "p_retailprice", F.col("rank").cast("long").alias("rank")
    )


@register(
    "q_score_threshold",
    """
    SELECT l_returnflag,
           count(*) AS n_kept,
           round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                      AS DOUBLE) / 100.0, 2) AS kept_value
    FROM lineitem
    WHERE l_extendedprice > 50000
    GROUP BY l_returnflag
    """,
)
def q_score_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING combined_score>700 threshold filter (P4) + A8 hit counters.
    Money totals sum exact integer CENTS (see _cents): a fixed group
    count with group size ∝ SF makes plain double sums order-dependent."""
    li = load_table(spark, sf_dir, "lineitem")
    kept = score_threshold(li, "l_extendedprice", gt=50000)
    return kept.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(F.sum(_cents("l_extendedprice")).cast("double") / F.lit(100.0), 2).alias("kept_value"),
    )


@register(
    "q_zscore_threshold",
    """
    SELECT event_id, event_type, round(z, 4) AS z FROM (
      SELECT event_id, event_type,
             CASE WHEN n > 1 THEN
               ((CAST(q AS DOUBLE) / 100.0) - mean)
                 / sqrt((ex2 - mean * mean) * (CAST(n AS DOUBLE) / (n - 1)))
             END AS z
      FROM (
        SELECT event_id, event_type, q,
               count(*) OVER w AS n,
               (CAST(sum(q) OVER w AS DOUBLE) / count(*) OVER w) / 100.0 AS mean,
               (CAST(sum(q * q) OVER w AS DOUBLE) / count(*) OVER w) / 10000.0 AS ex2
        FROM (SELECT event_id, event_type,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS q
              FROM events)
        WINDOW w AS (PARTITION BY event_type)))
    WHERE abs(z) >= 2
    """,
)
def q_zscore_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MPD z-score outliers (A6 + P4): per-group analytic window, |z| >= 2."""
    ev = load_table(spark, sf_dir, "events")
    # grid=100: events.value lives on the 2-decimal grid, so the window
    # moments are exact integer sums — scale- and layout-invariant
    z = group_zscore(ev, "event_type", "value", z_col="z", grid=100)
    return (
        score_threshold(z, "z", abs_ge=2.0)
        .select("event_id", "event_type", F.round("z", 4).alias("z"))
    )


@register(
    "q_dispatch_case",
    """
    SELECT CASE o_orderpriority
             WHEN '1-URGENT' THEN 'critical'
             WHEN '2-HIGH'   THEN 'high'
             ELSE 'normal' END AS priority_class,
           count(*) AS n_orders,
           round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                      AS DOUBLE) / 100.0, 2) AS total_value
    FROM orders
    GROUP BY priority_class
    """,
)
def q_dispatch_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discriminator dispatch (P10/W2): HPOA aspect / ClinVar star-rating
    when-chains as a reusable mapping operator."""
    orders = load_table(spark, sf_dir, "orders")
    cls = dispatch(
        "o_orderpriority", {"1-URGENT": "critical", "2-HIGH": "high"}, default="normal"
    )
    return (
        orders.withColumn("priority_class", cls)
        .groupBy("priority_class")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(_cents("o_totalprice")).cast("double") / F.lit(100.0), 2
            ).alias("total_value"),
        )
    )


@register(
    "q_qualifier_filter",
    """
    SELECT event_type, count(*) AS n_events
    FROM events
    WHERE event_type IS NULL OR event_type NOT IN ('error')
    GROUP BY event_type
    """,
)
def q_qualifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negation-qualifier drop (P2): HPOA Qualifier=='NOT' rows."""
    ev = load_table(spark, sf_dir, "events")
    return qualifier_filter(ev, "event_type", bad_values=("error",)).groupBy(
        "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))


@register(
    "q_test_id_subset",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders WHERE o_custkey IN (1, 7, 42, 99, 123, 500, 1200)
    """,
)
def q_test_id_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-mode id subsetting (P6) as a broadcast LEFT SEMI join."""
    orders = load_table(spark, sf_dir, "orders")
    ids = tiny_df(spark, [(i,) for i in [1, 7, 42, 99, 123, 500, 1200]], "id bigint")
    return test_id_subset(orders, "o_custkey", ids).select(
        "o_orderkey", "o_custkey", _r2(F.col("o_totalprice")).alias("o_totalprice")
    )


@register(
    "q_limit_topn",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered limit (P7/O2): Spark plans TakeOrderedAndProject — a
    per-partition top-N + driver merge, never a global sort."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", _r2(F.col("o_totalprice")).alias("o_totalprice"))
    )


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------


@register(
    "q_range_join",
    """
    SELECT p_partkey, count(*) AS n_points
    FROM (SELECT p_partkey, p_size * 100 AS lo, p_size * 100 + 150 AS hi
          FROM part WHERE p_partkey <= 200) iv
    JOIN lineitem ON l_extendedprice >= lo AND l_extendedprice <= hi
    GROUP BY p_partkey
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join (J5, the UDP variant/gene test).

    The interval side is small → broadcast-nested-loop with a codegen'd
    residual.  Scale path (docstring of operators.joins.range_join):
    bucketize points to restore an equi-key when intervals outgrow broadcast.
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    iv = part.filter(F.col("p_partkey") <= 200).select(
        "p_partkey",
        (F.col("p_size") * 100).alias("lo"),
        (F.col("p_size") * 100 + 150).alias("hi"),
    )
    joined = range_join(li, F.broadcast(iv), "l_extendedprice", "lo", "hi")
    return joined.groupBy("p_partkey").agg(F.count(F.lit(1)).alias("n_points"))


@register(
    "q_pairwise_self_join",
    """
    SELECT CASE WHEN f1 = f2 THEN 'agree' ELSE 'conflict' END AS verdict,
           count(*) AS n_pairs
    FROM (SELECT a.l_orderkey, a.l_linenumber AS id1, b.l_linenumber AS id2,
                 a.l_returnflag AS f1, b.l_returnflag AS f2
          FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
          WHERE a.l_linenumber < b.l_linenumber)
    GROUP BY verdict
    """,
)
def q_pairwise_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClinVar SCV agree/conflict pair linking (J8): self-equi-join on the
    group key with an id1<id2 residual; group sizes are bounded (<=7 lines
    per order), so the quadratic blowup dipper risks in Python loops is
    bounded the same way here."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = pairwise_within_group(li, "l_orderkey", "l_linenumber", payload=["l_returnflag"])
    verdict = F.when(F.col("l_returnflag_1") == F.col("l_returnflag_2"), "agree").otherwise(
        "conflict"
    )
    return pairs.select(verdict.alias("verdict")).groupBy("verdict").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


@register(
    "q_symmetric_pairs",
    """
    SELECT least(c_nationkey, s_nationkey)    AS nation_a,
           greatest(c_nationkey, s_nationkey) AS nation_b,
           count(*) AS n_trades,
           round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                      AS DOUBLE) / 100.0, 2) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN supplier ON l_suppkey  = s_suppkey
    GROUP BY nation_a, nation_b
    """,
)
def q_symmetric_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING symmetric-edge canonicalization (J7): undirected customer-nation
    ↔ supplier-nation trade edges via (least, greatest)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    df = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
    )
    a, b = canonical_pair("c_nationkey", "s_nationkey")
    return (
        df.select(a.alias("nation_a"), b.alias("nation_b"), "l_extendedprice")
        .groupBy("nation_a", "nation_b")
        .agg(
            F.count(F.lit(1)).alias("n_trades"),
            F.round(
                F.sum(_cents("l_extendedprice")).cast("double") / F.lit(100.0), 2
            ).alias("volume"),
        )
    )


@register(
    "q_composite_key_join",
    """
    SELECT p_partkey, zid FROM part
    JOIN (SELECT DISTINCT p_brand AS b, p_type AS t,
                 md5(concat_ws('-', p_brand, p_type)) AS zid FROM part) m
      ON concat_ws('-', p_brand, p_type) = concat_ws('-', b, t)
    """,
)
def q_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZFIN octuple→ZP-key lookup (J6): join on a computed composite key."""
    part = load_table(spark, sf_dir, "part")
    key = composite_key(["p_brand", "p_type"])
    mapping = (
        part.select(F.col("p_brand").alias("b"), F.col("p_type").alias("t"))
        .distinct()
        .withColumn("zid", F.md5(composite_key(["b", "t"])))
    )
    fact = part.withColumn("__key", key)
    return broadcast_lookup(
        fact, mapping, fact["__key"] == composite_key(["b", "t"])
    ).select("p_partkey", "zid")


@register(
    "q_anti_join",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders
                                    WHERE o_custkey = c_custkey
                                      AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join existence check (J11): customers with no URGENT order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_join(cust, orders, "c_custkey").groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "q_one_to_one",
    """
    SELECT o_custkey, max(o_orderkey) AS o_orderkey
    FROM orders GROUP BY o_custkey HAVING count(*) = 1
    """,
)
def q_one_to_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1:1-mapping restriction (A9/J3): GO's uniprot map keeps only keys with
    exactly one target."""
    orders = load_table(spark, sf_dir, "orders")
    return one_to_one_mappings(orders.select("o_custkey", "o_orderkey"), "o_custkey", "o_orderkey")


# --------------------------------------------------------------------------
# set ops / rollups / triples
# --------------------------------------------------------------------------


@register(
    "q_union_dedup",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def q_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source union with set semantics (U1/U2)."""
    from dipper_spark.operators import union_dedup

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return union_dedup(cust, supp)


@register(
    "q_except_diff",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000
    """,
)
def q_except_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (U3/U4): nations with rich customers but no rich
    suppliers — the header-contract `exp - got` shape at table scale."""
    from dipper_spark.operators import except_diff

    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 8000)
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    return except_diff(cust, supp, keep_duplicates=False)


@register(
    "q_interval_rollup",
    """
    WITH leveled AS (
      SELECT strftime(o_orderdate, '%Y') AS node, 'year' AS level, o_totalprice FROM orders
      UNION ALL
      SELECT strftime(o_orderdate, '%Y-%m'), 'month', o_totalprice FROM orders
      UNION ALL
      SELECT strftime(o_orderdate, '%Y-%m-%d'), 'day', o_totalprice FROM orders)
    SELECT level, node, round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi, count(*) AS n_children
    FROM leveled GROUP BY level, node
    """,
)
def q_interval_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCSC cytoband extent rollup (A7) over a prefix hierarchy — here the
    date hierarchy day→month→year.  One explode + ONE groupBy shuffle for all
    levels (vs dipper's ordered Python loop per level)."""
    orders = load_table(spark, sf_dir, "orders")
    rolled = interval_rollup(
        orders,
        levels={
            "year": F.date_format("o_orderdate", "yyyy"),
            "month": F.date_format("o_orderdate", "yyyy-MM"),
            "day": F.date_format("o_orderdate", "yyyy-MM-dd"),
        },
        start="o_totalprice",
        end="o_totalprice",
    )
    return rolled.select(
        "level",
        "node",
        _r2(F.col("start")).alias("lo"),
        _r2(F.col("end")).alias("hi"),
        "n_children",
    )


def _nation_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiny triple graph used by the triple-op queries: three patterns over
    the nation dim (the Model-emitter shape, Model.py:10-14)."""
    nation = load_table(spark, sf_dir, "nation").select(
        F.concat_ws(":", F.lit("NATION"), "n_nationkey").alias("nid"),
        "n_name",
        F.concat_ws(":", F.lit("REGION"), "n_regionkey").alias("rid"),
    )
    labels = make_triples(nation, "nid", F.lit("rdfs:label"), "n_name", graph_id="nations")
    partof = make_triples(nation, "nid", F.lit("BFO:0000050"), "rid", graph_id="nations")
    types = make_triples(
        nation, "nid", F.lit("rdf:type"), F.lit("geo:Nation"), graph_id="nations"
    )
    return labels.unionByName(partof).unionByName(types)


_NATION_TRIPLES_SQL = """
      SELECT concat_ws(':', 'NATION', n_nationkey) AS subject,
             'rdfs:label' AS predicate, n_name AS object FROM nation
      UNION ALL
      SELECT concat_ws(':', 'NATION', n_nationkey), 'BFO:0000050',
             concat_ws(':', 'REGION', n_regionkey) FROM nation
      UNION ALL
      SELECT concat_ws(':', 'NATION', n_nationkey), 'rdf:type', 'geo:Nation' FROM nation
"""


@register(
    "q_predicate_histogram",
    f"""
    WITH triples AS ({_NATION_TRIPLES_SQL})
    SELECT predicate, count(*) AS n_triples FROM triples GROUP BY predicate
    """,
)
def q_predicate_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphUtils.count_predicates (A3) over a generated triple graph."""
    return predicate_histogram(_nation_triples(spark, sf_dir))


@register(
    "q_void_stats",
    f"""
    WITH triples AS ({_NATION_TRIPLES_SQL})
    SELECT count(*) AS n_triples,
           count(DISTINCT subject)   AS n_subjects,
           count(DISTINCT object)    AS n_objects,
           count(DISTINCT predicate) AS n_properties
    FROM triples
    """,
)
def q_void_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HCLS/VoID dataset stats (A5, Dataset.py:123-127)."""
    return void_stats(_nation_triples(spark, sf_dir))


@register(
    "q_dedup_triples",
    f"""
    WITH twice AS ({_NATION_TRIPLES_SQL} UNION ALL {_NATION_TRIPLES_SQL})
    SELECT DISTINCT subject, predicate, object FROM twice
    """,
)
def q_dedup_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rdflib-store set semantics (A1): double-emitted graph collapses."""
    t = _nation_triples(spark, sf_dir)
    return dedup_triples(union_graphs(t, t)).select("subject", "predicate", "object")


# --------------------------------------------------------------------------
# scalar function families
# --------------------------------------------------------------------------


@register(
    "q_scalar_strings",
    """
    SELECT p_partkey,
           regexp_replace(lower(trim(p_name)), '[aeiou]', '', 'g') AS squeezed,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens,
           concat_ws('|', p_brand, p_type) AS combo
    FROM part
    """,
)
def q_scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family (§2.9): trim/lower/regexp_replace/split/concat —
    the id-scrubbing patterns of P8 (Panther._clean_up_gene_id etc.)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_replace(F.lower(F.trim(F.col("p_name"))), "[aeiou]", "").alias("squeezed"),
        F.size(F.split("p_name", " ", -1)).cast("long").alias("n_tokens"),
        F.concat_ws("|", "p_brand", "p_type").alias("combo"),
    )


@register(
    "q_hash_ids",
    """
    SELECT o_orderkey,
           'b' || substr(md5(concat_ws('+', 'ORDER', o_orderkey, o_custkey)), 2, 19) AS digest
    FROM orders
    """,
)
def q_hash_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed deterministic ids (§2.9 hash family).

    The dipper-exact id is sha1-based (core.ids.digest_id, bit-verified in
    tests); DuckDB 1.0 lacks sha1, so the oracle-checked variant uses the
    same 'b'+hex[2:20] scheme over md5."""
    orders = load_table(spark, sf_dir, "orders")
    payload = F.concat_ws("+", F.lit("ORDER"), "o_orderkey", "o_custkey")
    return orders.select(
        "o_orderkey",
        F.concat(F.lit("b"), F.substring(F.md5(payload), 2, 19)).alias("digest"),
    )


@register(
    "q_json_extract",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           count(*) AS n,
           round((CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                       AS DOUBLE) / count(*)) / 1000000.0, 6) AS avg_value
    FROM events GROUP BY k
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction (§2.9: OMIM entry walks, MyChem records).

    The per-key average is computed in FIXED POINT (micro-unit BIGINT
    sums): a plain avg() over a continuous double column is float-
    addition-order dependent, which surfaced as a last-ulp round-6
    mismatch at sf1.0 (group size 10x sf0.1) — exactly the class of
    at-scale-only bug the full-table sf1.0 gate exists to catch.
    Quantizing each value to integer micro-units first makes every
    cross-row sum exact and order-free on both engines at any SF."""
    ev = load_table(spark, sf_dir, "events")
    micro = F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("long").alias("k"),
            micro.alias("_vm"),
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_vm").alias("_s"))
        .select(
            "k", "n",
            F.round(
                (F.col("_s").cast("double") / F.col("n")) / F.lit(1000000.0), 6
            ).alias("avg_value"),
        )
    )


@register(
    "q_date_functions",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           count(*) AS n_orders,
           round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                      AS DOUBLE) / 100.0, 2) AS month_value
    FROM orders GROUP BY month
    """,
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family (§2.9): strptime/strftime version stamps → month buckets."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(_cents("o_totalprice")).cast("double") / F.lit(100.0), 2
            ).alias("month_value"),
        )
    )


@register(
    "q_windowed_events",
    """
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
           event_type, count(*) AS n,
           round(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                      AS DOUBLE) / 100.0, 2) AS total_value
    FROM events GROUP BY window_start, event_type
    """,
)
def q_windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows via the native window() operator — the
    Structured-Streaming-ready aggregation (SURVEY §2.10: the engine adds
    real event-time semantics the reference lacks).  Identical plan works
    under readStream with a watermark (see dipper_spark.streaming)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(_cents("value")).cast("double") / F.lit(100.0), 2
            ).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    return q_pricing_summary(spark, sf_dir)
