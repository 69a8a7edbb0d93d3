"""Join operators — SURVEY §2.4 (J1-J11).

Dipper implements every join as a driver-built Python dict probed during a
scan — i.e. a manual broadcast hash join (e.g. MGI's idhash star flow,
MGI.py:308-313 "this allows us to do the 'joining' on the fly").  Here each
becomes a declarative join; small build sides get an explicit
``F.broadcast`` hint, everything else is left to Catalyst/AQE (which will
pick broadcast vs sort-merge vs shuffled-hash and split skewed partitions).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def broadcast_lookup(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
    *,
    guard: bool = False,
    salt_on: Column | str | None = None,
    straggler_threshold: float = 4.0,
    n_salts: int = 16,
) -> DataFrame:
    """Dict-probe join: broadcast the dimension side.

    Reference: the MGI idhash/label_hash probes (MGI.py:535-545), ClinVar
    gene→condition map (ClinVar.py:774-784), GO eco map — all dict lookups.

    Scale note: correct while the dim fits in executor memory (dims here are
    O(10⁵-10⁷) rows of ids/labels).  For dims that outgrow broadcast, drop the
    hint and let AQE choose; co-locating via bucketing on the key removes the
    fact-side shuffle entirely.

    ``guard=True`` (opt-in; round-11 verdict item #5) runs the q_key_skew
    straggler prediction on the fact key first and switches to the salted
    :func:`~dipper_spark.operators.skew.skew_join` ONLY when a key trips
    ``straggler_threshold`` — the protection a star probe needs on a
    cluster when a promiscuous fact key (a hub genotype/marker) would
    otherwise funnel a post-join stage onto one reducer.  Requires a
    single string ``on`` and inner/left ``how``; the output is
    column-for-column identical to the plain USING join either way (the
    guard is a pure plan decision).  ``salt_on`` spreads a hot key's rows
    across salts — defaults to a hash of the whole fact row."""
    if guard and isinstance(on, str) and how in ("inner", "left"):
        from dipper_spark.operators.skew import (
            _tmp_name,
            detect_hot_keys,
            skew_join,
        )

        hot = detect_hot_keys(
            fact, on, straggler_threshold=straggler_threshold
        )
        if hot:
            dk = _tmp_name("_dim_key", fact, dim)
            spread = (
                salt_on
                if salt_on is not None
                else F.xxhash64(*[F.col(c) for c in fact.columns])
            )
            out = skew_join(
                fact, dim.withColumnRenamed(on, dk), on, dk, spread,
                hot_keys=hot, n_salts=n_salts, how=how,
            )
            # normalize to the USING-join column order the plain path has
            cols = (
                [on]
                + [c for c in fact.columns if c != on]
                + [c for c in dim.columns if c != on]
            )
            return out.select(*cols)
    return fact.join(F.broadcast(dim), on, how)


def join_with_miss_metrics(
    fact: DataFrame, dim: DataFrame, on: str | list[str]
) -> tuple[DataFrame, DataFrame]:
    """Inner join + the unmatched remainder as a second DataFrame.

    Reference: STRING counts and drops unmapped proteins
    (StringDB.py:203-225); GO logs uniprot map hit/miss percentages
    (GeneOntology.py:285-286,495-501).  matched = inner join,
    missed = anti join; both reuse the same broadcast build side.
    """
    matched = fact.join(F.broadcast(dim), on, "inner")
    missed = fact.join(F.broadcast(dim), on, "left_anti")
    return matched, missed


def one_to_one_mappings(mapping: DataFrame, key: str, value: str) -> DataFrame:
    """Restrict a mapping table to keys with exactly one value.

    Reference: GO's uniprot→entrez map keeps only 1:1 rows
    (GeneOntology.py:503-570); CurieUtil warns on non-1:1 (CurieUtil.py:20-26).

    Window-free formulation: groupBy(key) with count + max keeps it a single
    partial-aggregatable shuffle (no sort), then values with count==1.
    """
    return (
        mapping.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"), F.max(value).alias(value))
        .filter(F.col("__n") == 1)
        .drop("__n")
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point: Column | str,
    start: Column | str,
    end: Column | str,
    extra_eq: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Point-in-interval join (inclusive bounds).

    Reference: UDP tests variant position against gene [start,end] per chrom
    (UDP.py:330-446, test at 372-375) — dipper does it with a dict-of-coords
    probe per row.

    Physical strategy: with an equality key (e.g. chrom) Catalyst plans a
    hash join with the range as residual — the right plan at any scale.
    Without one it is a broadcast-nested-loop; keep the interval side small
    (gene models are) or pre-bucketize points into interval-aligned bins to
    restore an equi-key.
    """
    p, s, e = _c(point), _c(start), _c(end)
    cond = (p >= s) & (p <= e)
    for lc, rc in extra_eq or []:
        cond = (points[lc] == intervals[rc]) & cond
    return points.join(intervals, cond)


def composite_key(cols: Iterable[Column | str], sep: str = "-") -> Column:
    """Computed composite join key.

    Reference: ZFIN's phenotype octuple → ZP-id key (_make_zpkey,
    ZFIN.py:2818-2826 joins ids with '-')."""
    return F.concat_ws(sep, *[_c(c) for c in cols])


def canonical_pair(a: Column | str, b: Column | str) -> tuple[Column, Column]:
    """Symmetric-edge canonicalization: order the endpoints lexicographically
    so each undirected edge appears once.

    Reference: STRING orders the two proteins before emitting one direction
    of 'interacts with' (StringDB.py:200-208)."""
    ca, cb = _c(a), _c(b)
    return F.least(ca, cb), F.greatest(ca, cb)


def pairwise_within_group(
    df: DataFrame, group: str | list[str], id_col: str, payload: list[str] | None = None
) -> DataFrame:
    """All ordered pairs (id1 < id2) within a group — the SCV-linking shape.

    Reference: ClinVar links every SCV pair within an RCV with agree/conflict
    predicates (scv_link, ClinVar.py:233-278) via nested Python loops; here a
    self-equi-join on the group key with a ``<`` residual.

    Scale note: output is quadratic in group size; for skewed groups cap the
    group cardinality upstream (dipper's RCVs are small) or salt the key.
    """
    group_cols = [group] if isinstance(group, str) else list(group)
    payload = payload or []
    left = df.select(*group_cols, F.col(id_col).alias("id1"), *[F.col(c).alias(f"{c}_1") for c in payload])
    right = df.select(*group_cols, F.col(id_col).alias("id2"), *[F.col(c).alias(f"{c}_2") for c in payload])
    return left.join(right, group_cols).filter(F.col("id1") < F.col("id2"))


def explode_pairs(df: DataFrame, arr_a: str, arr_b: str) -> DataFrame:
    """Cross-product expansion of two array columns (1:N x 1:M mappings).

    Reference: STRING expands gene-curie lists pairwise
    (StringDB.py:212-218)."""
    return df.withColumn(arr_a, F.explode(arr_a)).withColumn(arr_b, F.explode(arr_b))


def semi_join(df: DataFrame, other: DataFrame, on: str | list[str]) -> DataFrame:
    """Existence check (reference: mondo xref membership,
    DipperUtil.is_id_in_mondo, DipperUtil.py:110-125)."""
    return df.join(other, on, "left_semi")


def anti_join(df: DataFrame, other: DataFrame, on: str | list[str]) -> DataFrame:
    """Non-existence check (reference: KEGG omim↔disease reconciliation
    branches, KEGG.py:466-634)."""
    return df.join(other, on, "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tiebreak: str | None = None,
    match_col: str = "asof",
) -> DataFrame:
    """As-of join: attach to each left row the LATEST right row of the same
    key with right_ts <= left_ts (backward direction — the attribution /
    point-in-time-lookup primitive; DuckDB/kdb ASOF JOIN semantics).

    Beyond-reference operator.  Scale shape — the sort-merge-asof form, NOT
    the naive inequality join: both sides are tagged and UNIONed, then ONE
    window per key (ordered by time, right rows before left rows at equal
    timestamps, so a simultaneous right row is visible to the left row)
    forward-fills the most recent right payload via last(ignorenulls).
    Cost: a single shuffle on the key and one sort within partitions —
    independent of match multiplicity, where the inequality-join form
    explodes each left row against every earlier right row before pruning
    to rank 1.

    ``tiebreak`` (a right-side column) makes the pick among equal
    (key, right_ts) rows deterministic: the greatest tiebreak value wins.
    Returns every left column plus ``match_col`` — a struct of the matched
    right row's columns, NULL when no right row precedes the left row
    (filter it out for inner semantics).
    """
    keys = [on] if isinstance(on, str) else list(on)
    r_payload = [c for c in right.columns if c not in keys]
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    r_struct = F.struct(*[F.col(c) for c in r_payload])
    l_type = left.select(l_struct.alias("_s")).schema["_s"].dataType
    r_type = right.select(r_struct.alias("_s")).schema["_s"].dataType

    tagged_l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        l_struct.alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
        F.lit(None).cast("string").alias("_tie"),
    )
    tagged_r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_type).alias("_l"),
        r_struct.alias("_r"),
        (F.col(tiebreak).cast("string") if tiebreak else F.lit(None).cast("string")).alias("_tie"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc(), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        tagged_l.unionByName(tagged_r)
        .withColumn(match_col, F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    return filled.select(*[F.col(f"_l.{c}").alias(c) for c in left.columns], match_col)
