"""Iterative graph algorithms as bounded DataFrame loops.

The engine's iterative pattern (shared with dedup's hash-min connected
components, operators/dedup.py): a FIXED number of driver-side loop
iterations, each a declarative join+aggregate Catalyst plan — no RDDs,
no GraphX dependency, no unbounded recursion. Bounded iterations keep
the lineage shallow enough to stay a single plan; a 100 TB deployment
inserts a ``localCheckpoint()`` every ~5 iterations to truncate it.

Arithmetic is integer fixed-point (micro-units) so results are exactly
reproducible on any engine and independent of partitioning and
aggregation order — an FP PageRank sum would depend on both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    damping_pct: int = 85,
    unit: int = 1_000_000,
) -> DataFrame:
    """PageRank over a directed edge list, ``n_iters`` synchronous
    iterations, integer micro-unit arithmetic → ``(node, score)``.

    Per-node semantics (the classic 1.0-per-node formulation):

    * every node starts at ``unit`` (1.0 in micro-units);
    * each iteration a node sends ``((score * damping_pct) DIV 100)
      DIV outdeg`` to every out-neighbor — BIGINT floor division, so
      any engine computes the identical integer and the aggregation
      order cannot matter;
    * new score = teleport mass ``unit - unit*damping_pct/100`` plus
      received contributions. Dangling nodes (no out-edges) send
      nothing; every node (src or dst) receives teleport mass.

    Scale shape: ``edges`` is deduplicated once and reused every
    iteration — one shuffle on ``src`` for the score join (the score
    frame is node-sized, far smaller than edges; AQE broadcasts it
    when it fits), one shuffle on ``dst`` for the contribution sum.
    Iterations are driver-side loop unrolling of a declarative plan,
    so Catalyst sees the whole pipeline; for long runs checkpoint
    every few iterations to truncate lineage.
    """
    if n_iters < 0:
        raise ValueError(f"n_iters must be >= 0, got {n_iters}")
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # edges ⋈ outdeg is iteration-invariant: build it once so every
    # iteration pays only the score join + the contribution aggregate
    sendable = e.join(deg, "src")
    teleport = unit - unit * damping_pct // 100
    scores = nodes.select("node", F.lit(unit).cast("long").alias("score"))
    for _ in range(n_iters):
        contrib = (
            sendable.join(
                scores.select(F.col("node").alias("src"), "score"), "src"
            )
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(score * {damping_pct}) DIV 100 DIV outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        scores = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(teleport) + F.coalesce(F.col("contrib"), F.lit(0)))
            .cast("long")
            .alias("score"),
        )
    return scores
