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
) -> DataFrame:
    """PageRank over a directed edge list, ``iters`` synchronous
    iterations from the uniform distribution.

    r'(v) = (1-d)/N + d · Σ_{u→v} r(u)/outdeg(u)

    Assumes every node has at least one out-edge (feed an undirected graph
    as both directions and this holds by construction — no dangling-mass
    redistribution needed).  Per iteration: one equi-join of the static
    (edge, outdeg) frame against the rank frame on the source key and one
    hash-agg on the destination — two keyed shuffles whose volume is the
    edge list, never node².  The (edge, outdeg) frame is computed once and
    checkpointed; the rank frame (node-sized) is checkpointed per
    iteration to truncate lineage.

    Returns (node, rank) with Σ rank = 1.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    nodes = deg.select(F.col("src").alias("node"))
    n_frame = nodes.agg(F.count(F.lit(1)).cast("double").alias("nn"))
    ranks = nodes.crossJoin(F.broadcast(n_frame)).select(
        "node", (F.lit(1.0) / F.col("nn")).alias("r")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        contribs = (
            ed.join(ranks.select(F.col("node").alias("src"), "r"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("r") / F.col("outdeg")).alias("in_r"))
        )
        ranks = (
            contribs.crossJoin(F.broadcast(n_frame))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("nn")
                    + F.lit(damping) * F.col("in_r")
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank"))
