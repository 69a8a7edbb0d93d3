"""Skew MITIGATION operators — the act-on-it half of the skew story.

``key_skew_stats`` (operators/aggregates.py) and the ``q_key_skew`` /
``q_selfjoin_size`` pre-flights DIAGNOSE hot shuffle keys: per-key straggler
factor = n_key / mean_key_load = n_key * n_keys / n_rows.  This module is
what a 100 TB pipeline does when that prediction exceeds threshold — split
the hot keys into K salted sub-keys so no single reducer owns a stage:

- :func:`detect_hot_keys` — the trigger: same count table the audit runs on,
  keys whose predicted straggler factor exceeds a threshold, as a bounded
  driver-side list (capped; a hot-key set by definition is small — mass
  concentrated on many keys is not skew).
- :func:`salted_aggregate` — two-phase aggregation: partial over
  (key, salt) → final over key.  NB Spark's hash aggregate already does
  map-side partial combine for algebraic functions, which bounds hot-key
  partial state per TASK; the explicit salted form matters when the partial
  state itself is heavy per key (collect_list/collect_set bags, exact
  distinct sets) or when a downstream per-key sort/window would otherwise
  funnel a hot key through one task (cf. ``salted_topk_per_group``).
- :func:`salted_count_distinct` — EXACT per-key COUNT(DISTINCT v) where the
  salt is derived from the VALUE (pmod(xxhash64(v), K)): distinct values
  partition cleanly across salt cells, so the per-cell distinct counts sum
  exactly — the two-level rewrite Spark applies to count-distinct, with the
  cell fan-out made explicit and key-independent.
- :func:`skew_join` — selective salted replicate join: fact rows of hot keys
  get salt = pmod(xxhash64(salt_on), K) while cold keys keep salt 0; the
  dim side is exploded across all K salts for hot keys and left single for
  cold.  Row-for-row identical to the plain join; the hot key's probe rows
  now land on K reducers instead of 1, at the price of K-1 extra copies of
  the hot dim rows only.

Reference shape this protects: dipper's MGI star flow joins every fact scan
against driver dicts (MGI.py:308-313) — on a cluster those become keyed
shuffles, and a Zipfian key (a promiscuous gene id, a mega-user) makes one
reducer the stage.  AQE's OptimizeSkewedJoin splits oversized sort-merge
partitions at runtime but cannot split a SINGLE hot key's matching rows for
hash joins or rebalance a hot-key aggregation state; salting is the exact,
engine-level fix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGG_FUNCS = {"count", "sum", "min", "max", "avg"}


def _tmp_name(base: str, *frames: DataFrame) -> str:
    """A working-column name guaranteed absent from every input frame.

    The salted operators inject scratch columns; silently overwriting a
    user column named ``_salt`` would break the advertised row-for-row
    identity, so probe and suffix until the name is free.
    """
    taken = {c for df in frames for c in df.columns}
    name, i = base, 0
    while name in taken:
        i += 1
        name = f"{base}_{i}"
    return name


def detect_hot_keys(
    df: DataFrame,
    key: str,
    straggler_threshold: float = 4.0,
    max_keys: int = 1000,
) -> list:
    """Keys whose predicted reducer load exceeds ``straggler_threshold`` ×
    the mean key load — the same per-key straggler factor
    ``key_skew_stats``/``q_key_skew`` report (factor = n_key·n_keys/n_rows).

    Returns a bounded, deterministically-ordered driver-side list (hottest
    first, key as tie-break) ready to feed :func:`skew_join`.  The collect
    is bounded by construction: at factor t, at most n_keys/t keys can
    exceed the mean by t×, and ``max_keys`` caps the pathological case —
    if MORE than ``max_keys`` keys are "hot" the distribution is not skewed
    but merely heavy, and salting everything (hot_keys=None) is the answer.
    """
    # NULL keys are excluded: a null join key never matches (no skew risk
    # in a join), and isin(None) comparisons are null-valued — a None in
    # the hot list would silently match nothing downstream
    counts = (
        df.filter(F.col(key).isNotNull())
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    tot = counts.agg(
        F.sum("_n").alias("_rows"), F.count(F.lit(1)).alias("_keys")
    )
    factor = F.col("_n") * F.col("_keys") / F.col("_rows")
    hot = (
        counts.crossJoin(F.broadcast(tot))
        .filter(factor > F.lit(float(straggler_threshold)))
        .orderBy(F.desc("_n"), F.col(key))
        .limit(max_keys)
    )
    return [r[0] for r in hot.select(key).collect()]


def _salt_col(salt_on: Column | str, n_salts: int) -> Column:
    s = F.col(salt_on) if isinstance(salt_on, str) else salt_on
    return F.pmod(F.xxhash64(s), F.lit(n_salts)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: str | list[str],
    aggs: dict[str, tuple[str, str | None]],
    salt_on: Column | str,
    n_salts: int = 64,
) -> DataFrame:
    """Two-phase salted aggregation: partial over (keys, salt) → final over
    keys, for the algebraic algebra {count, sum, min, max, avg}.

    ``aggs`` maps output column name → (func, input column); count takes
    input None.  avg is recombined exactly as sum-of-sums / sum-of-counts
    (NEVER avg-of-avgs — unequal cell sizes would bias it).  ``salt_on``
    must be a high-cardinality row attribute (a row id, an event id) so a
    hot key's rows spread across cells; correctness does not depend on the
    spread, only the balance does.

    Result is row-for-row identical to ``df.groupBy(keys).agg(...)`` — the
    salt only inserts an intermediate reduction, bounding any single
    reducer's input at phase 2 to n_salts rows per key.
    """
    key_cols = [keys] if isinstance(keys, str) else list(keys)
    for name, (fn, col) in aggs.items():
        if fn not in _AGG_FUNCS:
            raise ValueError(f"unsupported agg {fn!r} for {name!r}")
        if (col is None) != (fn == "count"):
            raise ValueError(f"{name!r}: only count takes input None")

    partial_exprs, final_exprs = [], []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"_p_{name}"))
            final_exprs.append(F.sum(f"_p_{name}").cast("long").alias(name))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{name}"))
            final_exprs.append(F.sum(f"_p_{name}").alias(name))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{name}"))
            final_exprs.append(F.min(f"_p_{name}").alias(name))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{name}"))
            final_exprs.append(F.max(f"_p_{name}").alias(name))
        else:  # avg: exact recombination from (sum, count) partials
            partial_exprs.append(F.sum(col).alias(f"_ps_{name}"))
            partial_exprs.append(F.count(col).alias(f"_pc_{name}"))
            final_exprs.append(
                (F.sum(f"_ps_{name}") / F.sum(f"_pc_{name}")).alias(name)
            )

    salt = _tmp_name("_salt", df)
    phase1 = (
        df.withColumn(salt, _salt_col(salt_on, n_salts))
        .groupBy(*key_cols, salt)
        .agg(*partial_exprs)
    )
    return phase1.groupBy(*key_cols).agg(*final_exprs)


def salted_count_distinct(
    df: DataFrame,
    keys: str | list[str],
    value: str,
    n_salts: int = 64,
    out_col: str = "n_distinct",
) -> DataFrame:
    """EXACT per-key COUNT(DISTINCT value) with the salt derived from the
    VALUE: cell = pmod(xxhash64(value), K).  Equal values always land in
    the same cell, so per-cell distinct counts are disjoint and their sum
    is exact — unlike :func:`salted_aggregate`, no freedom in ``salt_on``.

    This is the skew-proof form of the distinct-set aggregation: a hot
    key's distinct SET (the thing that makes count-distinct a holistic,
    memory-heavy state) is split across K cells, each holding ~1/K of the
    values.  NULL values are excluded, matching COUNT(DISTINCT ...).
    """
    key_cols = [keys] if isinstance(keys, str) else list(keys)
    salt = _tmp_name("_salt", df)
    d = _tmp_name("_d", df)
    per_cell = (
        df.filter(F.col(value).isNotNull())
        .withColumn(salt, _salt_col(value, n_salts))
        .groupBy(*key_cols, salt)
        .agg(F.count_distinct(F.col(value)).alias(d))
    )
    summed = per_cell.groupBy(*key_cols).agg(
        F.sum(d).cast("long").alias(out_col)
    )
    # a key whose values are ALL NULL has no cells — but COUNT(DISTINCT)
    # reports it with 0, so restore exactly the MISSING keys from the key
    # universe.  left_anti with null-safe key equality (not a plain left
    # equality join) so a NULL group key restores correctly too: under
    # null-unsafe '=' a NULL key never matches its own summed row and
    # would coalesce its real count to 0.
    universe = df.select(*key_cols).distinct()
    anti_cond = None
    for k in key_cols:
        c = universe[k].eqNullSafe(summed[k])
        anti_cond = c if anti_cond is None else (anti_cond & c)
    missing = universe.join(summed, anti_cond, "left_anti").select(
        *key_cols, F.lit(0).cast("long").alias(out_col)
    )
    return summed.unionByName(missing)


def _plain_agg_exprs(aggs: dict) -> list:
    """The un-salted GROUP BY expression list for a ``salted_aggregate``
    spec — so the guarded dispatcher's two branches share one contract."""
    out = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            out.append(F.count(F.lit(1)).cast("long").alias(name))
        elif fn == "avg":
            out.append(F.avg(col).alias(name))
        else:
            out.append(getattr(F, fn)(col).alias(name))
    return out


def guarded_aggregate(
    df: DataFrame,
    keys: str | list[str],
    aggs: dict[str, tuple[str, str | None]],
    salt_on: Column | str,
    straggler_threshold: float = 4.0,
    n_salts: int = 64,
) -> DataFrame:
    """Runtime-guarded aggregation: run the q_key_skew straggler
    prediction first, and take :func:`salted_aggregate` ONLY when some
    group's predicted reducer load exceeds ``straggler_threshold`` × the
    mean — otherwise the plain ``groupBy().agg()`` plan, completely
    untouched (no salt column, no extra exchange).  Both branches are
    row-for-row identical, so the guard is a pure plan decision.

    The trigger pass is one count-per-key aggregation over ``df`` — the
    same scan q_key_skew already runs as a pre-flight; at 100 TB you pay
    it exactly when you suspect skew, and it is map-side-combined so its
    shuffle is keys-sized.  NULL group keys participate in the trigger
    here (unlike the join trigger): a massive NULL group straggles an
    aggregation just like any hot key, and salting handles it.
    """
    key_cols = [keys] if isinstance(keys, str) else list(keys)
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_n"))
    tot = counts.agg(
        F.sum("_n").alias("_rows"), F.count(F.lit(1)).alias("_keys")
    )
    factor = F.col("_n") * F.col("_keys") / F.col("_rows")
    any_hot = (
        counts.crossJoin(F.broadcast(tot))
        .filter(factor > F.lit(float(straggler_threshold)))
        .limit(1)
        .count()
        > 0
    )
    if not any_hot:
        return df.groupBy(*key_cols).agg(*_plain_agg_exprs(aggs))
    return salted_aggregate(df, key_cols, aggs, salt_on, n_salts=n_salts)


def guarded_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_on: Column | str,
    straggler_threshold: float = 4.0,
    n_salts: int = 16,
    how: str = "inner",
    max_hot_keys: int = 1000,
) -> DataFrame:
    """Runtime-guarded join: :func:`detect_hot_keys` predicts the
    stragglers, and the join takes :func:`skew_join` ONLY when the hot
    list is non-empty — otherwise the plain
    ``fact.join(dim, fact_key == dim_key, how)`` plan, completely
    untouched (Catalyst still free to broadcast, no salt column, no dim
    replication).  Both branches are row-for-row identical; the guard
    only decides the physical shape.

    This is the act-on-it wiring of the skew story: q_key_skew predicts,
    the guard triggers, salting mitigates — the shape dipper's star
    flows would need on a cluster when a promiscuous key (MGI.py:308-313
    probe dicts) concentrates a stage onto one reducer.  The detect pass
    costs one keys-sized count aggregation over the fact — pay it on
    joins you suspect; hot lists are bounded driver artifacts (cap
    ``max_hot_keys``).
    """
    hot = detect_hot_keys(
        fact, fact_key, straggler_threshold=straggler_threshold,
        max_keys=max_hot_keys,
    )
    if not hot:
        return fact.join(dim, fact[fact_key] == dim[dim_key], how)
    return skew_join(
        fact, dim, fact_key, dim_key, salt_on,
        hot_keys=hot, n_salts=n_salts, how=how,
    )


def skew_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_on: Column | str,
    hot_keys: list | None = None,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted replicate join for a skewed fact key: fact rows of hot keys
    get a value-spread salt, the dim side is replicated across all
    ``n_salts`` salts FOR HOT KEYS ONLY (cold keys pay nothing), and the
    join runs on (key, salt).  Row-for-row identical to
    ``fact.join(dim, fact[fact_key] == dim[dim_key], how)``.

    ``hot_keys`` is the bounded list :func:`detect_hot_keys` returns — the
    q_key_skew straggler prediction acted on.  ``hot_keys=None`` salts
    every key (the right call when the whole distribution is heavy).
    ``how`` supports inner/left: the salt never invents or drops a fact
    row (every fact row gets exactly one salt; every hot dim row appears
    once per salt, and a fact row joins only its own salt's replica).

    100 TB cost model: the hot key's probe rows fan out over n_salts
    reducers instead of one; the build side grows by (n_salts−1) copies of
    ONLY the hot keys' rows — for a dimension join that is n_salts rows
    per hot key, noise next to the fact volume the single reducer would
    otherwise sort alone.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_join supports inner/left, not {how!r}")
    fk, dk = F.col(fact_key), F.col(dim_key)
    if hot_keys is None:
        f_salt = _salt_col(salt_on, n_salts)
        d_salts = F.sequence(F.lit(0), F.lit(n_salts - 1))
    elif len(hot_keys) == 0:
        # nothing predicted hot: degrade to the plain join shape (salt 0
        # everywhere, single dim replica) — zero overhead, same rows
        f_salt = F.lit(0)
        d_salts = F.array(F.lit(0))
    else:
        is_hot_f = fk.isin(list(hot_keys))
        is_hot_d = dk.isin(list(hot_keys))
        f_salt = F.when(is_hot_f, _salt_col(salt_on, n_salts)).otherwise(
            F.lit(0)
        )
        d_salts = F.when(
            is_hot_d, F.sequence(F.lit(0), F.lit(n_salts - 1))
        ).otherwise(F.array(F.lit(0)))
    salt = _tmp_name("_salt", fact, dim)
    salts = _tmp_name("_salts", fact, dim)
    salted_fact = fact.withColumn(salt, f_salt.cast("int"))
    # explode must sit top-level in its projection (Spark rejects
    # generators nested in expressions), hence the two-step withColumn
    salted_dim = (
        dim.withColumn(salts, d_salts)
        .withColumn(salt, F.explode(salts))
        .drop(salts)
    )
    cond = (salted_fact[fact_key] == salted_dim[dim_key]) & (
        salted_fact[salt] == salted_dim[salt]
    )
    out = salted_fact.join(salted_dim, cond, how)
    return out.drop(salted_fact[salt]).drop(salted_dim[salt])
