"""Graph analytics over edge lists: PageRank (fixed-iteration, fully
relational).

Beyond-reference operators.  Like the IVF Lloyd loop (operators/
similarity.py) and min-label components (operators/dedup.py), the
iteration discipline is: each pass is a keyed join + aggregation, the rank
frame is lineage-truncated per iteration so plan size and per-iteration
cost stay flat, and a FIXED iteration count keeps the computation
deterministic — which is what lets a SQL oracle unroll the whole
algorithm as CTEs and hash-match the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    broadcast_ranks: bool = True,
    checkpoint_every: int = 8,
) -> DataFrame:
    """PageRank over a directed edge list, ``iters`` synchronous
    iterations from the uniform distribution.

    r'(v) = (1-d)/N + d · Σ_{u→v} r(u)/outdeg(u)

    Assumes every node has at least one out-edge (feed an undirected graph
    as both directions and this holds by construction — no dangling-mass
    redistribution needed).  Per iteration: one equi-join of the static
    bare (src, dst) edge frame against the node-sized contribution frame
    (rank/outdeg, division folded into the broadcast side) and one
    hash-agg on the destination.  The edge frame is checkpointed once and
    the degree table derives from that checkpoint; the rank frame is
    checkpointed every
    ``checkpoint_every`` iterations to truncate lineage — short fixed
    chains (the catalog's 5) stay PURE-LAZY, one job instead of one per
    iteration (each eager checkpoint is a driver-paced barrier; measured
    12.2s→7.0s warm at sf0.1), while long chains still bound plan depth.

    ``broadcast_ranks=True`` (default) hash-broadcasts the rank frame into
    the per-iteration join: the edge list — orders of magnitude bigger
    than the node set — is then NEVER re-shuffled (localCheckpoint erases
    partitioning info from Catalyst's view, so without the hint every
    iteration would pay a full edge shuffle just to meet the node-sized
    frame).  The only remaining shuffle per iteration is the hash-agg on
    the destination key — the irreducible PageRank shuffle.  For graphs
    whose NODE frame outgrows executor memory (billions of vertices) pass
    False and both sides shuffle on the source key.

    Returns (node, rank) with Σ rank = 1.
    """
    # the bare (src, dst) pairs are the ONLY corpus-sized frame: checkpoint
    # them first and derive the node-sized degree table FROM the checkpoint
    # (one scan) — the former shape joined outdeg onto every edge row and
    # checkpointed that, so the iterations re-read a wider frame and the
    # build scanned the upstream edge derivation once per consumer
    # (guide §2.3 shuffle/scan fewer bytes; §1.2 don't recompute)
    ed = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=True
    )
    deg = ed.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = deg.select(F.col("src").alias("node"))
    n_frame = nodes.agg(F.count(F.lit(1)).cast("double").alias("nn"))
    ranks = nodes.crossJoin(F.broadcast(n_frame)).select(
        "node", (F.lit(1.0) / F.col("nn")).alias("r")
    )
    # per-source contribution r(u)/outdeg(u) is a NODE-sized computation:
    # fold the division into the (broadcast) rank frame instead of
    # carrying outdeg on every edge row — each iteration's edge pass then
    # probes a prebuilt (src, c) hash relation and partial-aggregates,
    # touching 2 longs per edge.  The division is the same double on the
    # same operands, just computed once per node instead of once per edge
    # (bit-identical terms; deg's broadcast subtree is identical across
    # iterations, so ReuseExchange builds it once per job).
    degn = F.broadcast(deg.select(F.col("src").alias("node"), "outdeg"))
    for i in range(iters):
        rsrc = ranks.join(degn, "node").select(
            F.col("node").alias("src"),
            (F.col("r") / F.col("outdeg")).alias("c"),
        )
        if broadcast_ranks:
            rsrc = F.broadcast(rsrc)
        contribs = (
            ed.join(rsrc, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("c")).alias("in_r"))
        )
        ranks = contribs.crossJoin(F.broadcast(n_frame)).select(
            "node",
            (
                F.lit(1.0 - damping) / F.col("nn")
                + F.lit(damping) * F.col("in_r")
            ).alias("r"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("r").alias("rank"))


def oriented_edges(e: DataFrame, deg: DataFrame) -> DataFrame:
    """Reorient canonical undirected edges low-degree → high-degree endpoint
    (ties broken by node id) — the arboricity-bounded canonicalization for
    triangle enumeration: wedge fan-out at a node is then out-degree², and
    every node's out-degree is O(√m) regardless of its true degree, so a
    hub vertex can no longer mint quadratic wedge candidates.  (deg, id) is
    a TOTAL order, so each triangle still has exactly one (x→y→z) form and
    the x→z closing edge is guaranteed to be stored in that orientation."""
    # deg is NODE-sized (the pagerank broadcast economics: orders of
    # magnitude smaller than the edge list); without the hint the
    # checkpointed frames carry no stats and Catalyst plans BOTH degree
    # attaches as sort-merge joins — two exchanges and two sorts of the
    # edge list for dictionary-class lookups (round-14 profile).  The
    # broadcast also makes the two builds ReuseExchange-identical, so
    # deg ships once.
    da = F.broadcast(deg.select(F.col("node").alias("a"), F.col("degree").alias("_da")))
    db = F.broadcast(deg.select(F.col("node").alias("b"), F.col("degree").alias("_db")))
    ed = e.join(da, "a").join(db, "b")
    lo_first = F.struct(F.col("_da"), F.col("a")) < F.struct(F.col("_db"), F.col("b"))
    return ed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("a"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("b"),
    )


def triangles(edges: DataFrame, a: str = "a", b: str = "b", order: str = "id") -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    UNDIRECTED edge list (rows canonicalized to a < b, deduped here).

    Classic two-join enumeration in canonical order — each triangle
    {x < y < z} is produced exactly once as e(x,y) ⋈ e(y,z) ⋈ e(x,z), so
    no post-hoc division by 6.  All three joins are equi-joins on node
    keys: the shape shuffles on vertex ids and AQE's skew splitting covers
    moderate hubs.

    ``order='degree'`` is the 100 TB form: edges are reoriented low-degree →
    high-degree (ties by id) before enumeration, bounding the wedge join's
    fan-out by arboricity (out-degree ≤ O(√m) for every node, so one hub
    vertex can't mint quadratic candidate rows).  The RESULT is identical —
    only the enumeration order changes — verified by the equivalence pytest;
    ``order='id'`` stays the default because it is what the SQL oracle
    mirrors term-for-term.

    clustering(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), NULL-guarded under
    F.when for deg < 2 (ANSI mode would otherwise kill the job on the
    divide) and returned as 0.0 for isolated/leaf nodes.

    Returns (node, degree, n_tri, clustering).
    """
    # the canonical edge list is consumed by the degree aggregation and all
    # three legs of the triangle join (and the caller's edge derivation can
    # itself be an expensive self-join, e.g. the lineitem co-occurrence
    # graph) — eagerly checkpoint it so that derivation runs ONCE instead
    # of once per consumer (guide §1.2); same for the node-sized degree
    # frame (3 consumers) and the reoriented edges (3 join legs)
    e = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("a"),
            F.greatest(F.col(a), F.col(b)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg0 = (
        e.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .localCheckpoint(eager=True)
    )
    en = (
        oriented_edges(e, deg0).localCheckpoint(eager=True)
        if order == "degree"
        else e
    )
    e1 = en.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = en.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = en.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    deg = deg0
    cc = F.when(
        F.col("degree") >= 2,
        F.lit(2.0) * F.col("n_tri") / (F.col("degree") * (F.col("degree") - 1)),
    ).otherwise(F.lit(0.0))
    # per_node is node-sized like deg: broadcast it so the final attach is
    # a BroadcastHashJoin LeftOuter instead of a sort-merge that exchanges
    # and sorts both node frames (round-14 profile; the build side is the
    # per-node triangle aggregate, already reduced to one row per node)
    return (
        deg.join(F.broadcast(per_node), "node", "left")
        .withColumn("n_tri", F.coalesce(F.col("n_tri"), F.lit(0)).cast("long"))
        .select("node", "degree", "n_tri", F.round(cc, 6).alias("clustering"))
    )
