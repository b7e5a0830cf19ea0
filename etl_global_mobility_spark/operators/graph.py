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

from etl_global_mobility_spark.operators.parallelism import (
    SINGLE_TASK_MAX_EDGES,
    driver_rows_df,
)


def _lpa_rounds_pandas(und_pdf, n_iters: int):
    """EXACT synchronous majority-LPA rounds over an in-memory
    undirected edge frame (pandas): per round every node adopts its
    neighbors' most frequent PREVIOUS-round label, ties to the
    smallest label — the same pure function of (edge set, n_iters) as
    the distributed ``_lpa_round``, pinned equal by test. Returns the
    final label Series (index = node) plus the per-round changed-node
    counts (the convergence diagnostic shares one implementation)."""
    import numpy as np
    import pandas as pd

    src = und_pdf["src"].to_numpy()
    dst = und_pdf["dst"].to_numpy()
    # node universe from src ∪ dst: every current caller passes a
    # symmetrized frame (src alone would suffice), but a future caller
    # handing a directed edge list would otherwise get a KeyError from
    # lab.loc[dst] — or silently missing nodes (ADVICE r14)
    nodes = pd.unique(pd.Series(np.concatenate([src, dst]))).copy()
    nodes.sort()
    lab = pd.Series(nodes, index=nodes)
    changed: list[int] = []
    for _ in range(n_iters):
        nb = pd.DataFrame({"src": src, "label": lab.loc[dst].to_numpy()})
        cnt = (
            nb.groupby(["src", "label"], sort=False)
            .size()
            .reset_index(name="n")
        )
        # total order (src, n DESC, label ASC) → first row per src is
        # the deterministic majority label, exactly the distributed
        # row_number() tie-break
        cnt = cnt.sort_values(
            ["src", "n", "label"], ascending=[True, False, True],
            kind="mergesort",
        )
        top = cnt.drop_duplicates("src", keep="first")
        new = pd.Series(
            top["label"].to_numpy(), index=top["src"].to_numpy()
        ).sort_index()
        changed.append(int((new.to_numpy() != lab.loc[new.index].to_numpy()).sum()))
        lab = new
    return lab, changed


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


def label_propagation(
    edges: DataFrame,
    n_iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Community detection by SYNCHRONOUS majority label propagation
    (Raghavan et al. 2007, "Near linear time algorithm to detect
    community structures in large-scale networks") made DETERMINISTIC:
    ties break by the SMALLEST label, and every round updates all
    nodes from the PREVIOUS round's labels (no asynchronous order
    dependence), so the result is a pure function of the edge set and
    ``n_iters`` — reproducible on any engine, any partitioning.

    Per round: ``label(v) := argmax over v's neighbor labels by
    (frequency DESC, label ASC)``. Unlike connected components
    (operators/dedup.py dedup_components — every connected node ends
    with the component MINIMUM), majority propagation splits a
    connected graph along dense regions: a node bridging two cliques
    adopts the bigger clique's label. Fixed ``n_iters`` (classic LPA
    converges in ~5 rounds on social graphs; a fixed count keeps the
    plan bounded and the semantics oracle-expressible).

    Scale shape per round: one shuffle join of the node-sized label
    frame against the edge list + one (node, label) count aggregate +
    one top-1-per-node window — all keyed on node id, no quadratic
    step; lineage truncates via eager localCheckpoint each round,
    released by session hygiene (session.py release_session_state).
    Returns (node, label) for every node in ``edges``.
    """
    if n_iters < 0:
        raise ValueError(f"n_iters must be >= 0, got {n_iters}")
    # Persist the DIRECTED distinct edges and gate the fast path on
    # THEIR count — not on the symmetrized union as round 14 did. The
    # union's two branches each scan the upstream edge pipeline, so
    # materializing it first via und.count() re-ran the (expensive)
    # pair generation's post-shuffle tail once per branch at every
    # declaration; counting ``e`` materializes the upstream exactly
    # once, and the distributed path's union then reads the cache
    # twice. The bound is the same module constant — n_und ∈ [n_e,
    # 2·n_e], so gating on n_e admits graphs up to ~2× the old
    # undirected-row bound: still one-task-sized either way, and the
    # distributed rounds stay pinned by the monkeypatched-threshold
    # tests and soaks.
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
        .persist()
    )
    e_cached = e
    und = None
    # try/finally so NO exit path — success, guard raise, or a failure
    # mid-round — leaks the persisted edge frames into the long-lived
    # session (ADVICE r10). Safe on the success path because every
    # round's labels are eagerly localCheckpointed — the returned
    # frame no longer reads ``und``. The first count() sits INSIDE the
    # try: it is exactly the job the clearCache-race failure mode can
    # kill, and a raise before the try would skip the unpersist.
    try:
        n_e = e.count()
        if n_e < SINGLE_TASK_MAX_EDGES:
            # Small-graph fast path: the edge list is BOUNDED (≤ the
            # module constant ≈ 1.6 MB of long pairs), so collect the
            # cached edges, symmetrize driver-side, and run ALL
            # synchronous rounds in local pandas — the same
            # _lpa_rounds_pandas body the one-task path ran, so the
            # two cannot drift; equality with the distributed rounds
            # stays pinned by test. Round 14 ran this as a coalesce(1)
            # mapInPandas + eager localCheckpoint, which still paid
            # ~1.5-2 s of Python-worker round-trip + checkpoint job
            # per declaration (measured r15, warm session); the
            # driver-local run returns a one-slice frame with the
            # labels already materialized — nothing to recompute when
            # the finally releases the cache.
            import pandas as pd

            und_set = set()
            for r in e.collect():
                und_set.add((r[0], r[1]))
                und_set.add((r[1], r[0]))
            if not und_set:
                return driver_rows_df(
                    edges.sparkSession, [], "node long, label long"
                )
            srcs, dsts = zip(*sorted(und_set))
            lab, _ = _lpa_rounds_pandas(
                pd.DataFrame({"src": srcs, "dst": dsts}), n_iters
            )
            return driver_rows_df(
                edges.sparkSession,
                [(int(n), int(v)) for n, v in lab.items()],
                "node long, label long",
            )
        und = (
            e.unionByName(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .distinct()
            .persist()
        )
        # Node-count conservation guard (same defect class as
        # dedup_components): every node in the undirected edge list
        # has at least one neighbor, so the top-1-per-node round NEVER
        # shrinks the label frame. A shrink means external
        # session-state corruption — measured: clearCache() racing
        # this query lets AQE's empty-relation propagation empty a
        # join mid-round (see session.release_session_state). Fail
        # loudly, never return a silently partial community map. The
        # n_und cross-check closes the vacuous case where the node
        # frame itself materialized empty off a corrupted cached
        # stage.
        n_und = und.count()
        labels = (
            und.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
        )
        n_nodes = labels.count()
        if n_und > 0 and n_nodes == 0:
            raise RuntimeError(
                f"label_propagation: {n_und} undirected edges but 0 nodes "
                "— external session-state corruption (e.g. clearCache() "
                "racing this query — see session.release_session_state)"
            )
        for _ in range(n_iters):
            labels = _lpa_round(und, labels)
        if n_iters > 0:
            n_final = labels.count()  # scan of the checkpointed RDD
            if n_final != n_nodes:
                raise RuntimeError(
                    f"label_propagation node frame shrank {n_nodes} -> "
                    f"{n_final}: external session-state corruption (e.g. "
                    "clearCache() racing this query — see "
                    "session.release_session_state)"
                )
        return labels
    finally:
        e_cached.unpersist()
        if und is not None:
            und.unpersist()


def _lpa_round(und: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous majority-propagation round: every node adopts
    its neighbors' most frequent previous-round label (frequency DESC,
    label ASC — the deterministic tie). Eagerly localCheckpointed so
    the iterative lineage stays flat (see label_propagation)."""
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy(
        F.col("n").desc(), F.col("label").asc()
    )
    return (
        und.join(labels.select(F.col("node").alias("dst"), "label"), "dst")
        .groupBy("src", "label")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("src").alias("node"), "label")
        .localCheckpoint(eager=True)
    )


def label_propagation_convergence(
    edges: DataFrame,
    n_iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Rounds-to-convergence diagnostic for :func:`label_propagation`:
    one row per round with the count and fraction of nodes that
    changed label — the operational dial behind the fixed-iteration
    contract (is 3 rounds enough on THIS graph? is the frac still
    falling, or has propagation stalled?). The LPA literature's
    stopping rule is exactly this curve (Raghavan et al. 2007 stop
    when no label changes).

    Same per-round semantics and cost shape as label_propagation (the
    round body is shared — :func:`_lpa_round`), plus ONE node-keyed
    join + count per round to compare against the previous labels:
    bounded by the node count, never the edge count. Output is
    n_iters rows — driver-bounded by construction.
    """
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    # Persist + gate on the DIRECTED distinct edges — see
    # label_propagation for the rationale (one upstream
    # materialization per declaration; the bound shifts to directed
    # rows, same module constant).
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
        .persist()
    )
    e_cached = e
    und = None
    try:
        n_e = e.count()
        if n_e == 0:
            # empty graph: every round trivially changes 0 of 0 nodes
            # — build the n_iters diagnostic rows directly (the
            # distributed loop below computes exactly these via
            # empty-frame jobs)
            return edges.sparkSession.createDataFrame(
                [(t, 0, 0, 0.0) for t in range(1, n_iters + 1)],
                "round int, n_changed long, n_nodes long, frac_changed double",
            )
        if n_e < SINGLE_TASK_MAX_EDGES:
            # Small-graph fast path — same rationale and proof
            # obligations as label_propagation's: collect the bounded
            # cached edges, symmetrize driver-side, run all rounds AND
            # the per-round changed counts in local pandas (the round
            # body is shared — _lpa_rounds_pandas — so the two queries
            # cannot drift), return a one-slice local frame.
            import pandas as pd

            und_set = set()
            for r in e.collect():
                und_set.add((r[0], r[1]))
                und_set.add((r[1], r[0]))
            srcs, dsts = zip(*sorted(und_set))
            lab, changed = _lpa_rounds_pandas(
                pd.DataFrame({"src": srcs, "dst": dsts}), n_iters
            )
            n = int(len(lab))
            return driver_rows_df(
                edges.sparkSession,
                [
                    (t, int(c), n, float(c) / n)
                    for t, c in zip(range(1, n_iters + 1), changed)
                ],
                "round int, n_changed long, n_nodes long, "
                "frac_changed double",
            )
        und = (
            e.unionByName(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .distinct()
            .persist()
        )
        n_und = und.count()
        # checkpointed eagerly: each round reads the previous labels
        # TWICE (round input + change comparison)
        labels = (
            und.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
            .localCheckpoint(eager=True)
        )
        n_nodes = labels.count()
        if n_und > 0 and n_nodes == 0:
            raise RuntimeError(
                f"label_propagation_convergence: {n_und} undirected edges "
                "but 0 nodes — external session-state corruption (e.g. "
                "clearCache() racing this query — see "
                "session.release_session_state)"
            )
        rows = []
        for t in range(1, n_iters + 1):
            new = _lpa_round(und, labels)
            n_changed = (
                new.join(
                    labels.select("node", F.col("label").alias("prev")),
                    "node",
                )
                .filter(F.col("label") != F.col("prev"))
                .count()
            )
            # exact-integer ratio as one IEEE double division — the
            # same value any SQL engine computes from these counts
            frac = float(n_changed) / n_nodes if n_nodes else 0.0
            rows.append((t, n_changed, n_nodes, frac))
            labels = new
        return edges.sparkSession.createDataFrame(
            rows,
            "round int, n_changed long, n_nodes long, frac_changed double",
        )
    finally:
        e_cached.unpersist()
        if und is not None:
            und.unpersist()


def pagerank_convergence(
    edges: DataFrame,
    n_iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    damping_pct: int = 85,
    unit: int = 1_000_000,
) -> DataFrame:
    """Rounds-to-convergence diagnostic for :func:`pagerank` — the
    power-iteration residual curve: per round, the L1 norm of the
    integer score change (sum over nodes of |new − old| micro-units)
    and its per-node average relative to ``unit``. The standard
    stopping rule for power iteration is a threshold on exactly this
    residual (Page et al. 1999 §2.1 run to convergence of the
    iterate); a fixed-iteration deployment reads this curve to decide
    whether its n_iters is sufficient on ITS graph.

    Same per-round semantics and arithmetic as pagerank (BIGINT floor
    division — every engine computes the identical integers, so the
    residuals are exact, not float-drifting), plus ONE node-keyed
    join + sum per round: bounded by the node count. Scores are
    eagerly localCheckpointed per round (the diagnostic reads each
    frame twice: round input + residual), so the iterative lineage
    stays flat. Output is n_iters rows — driver-bounded.
    """
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
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
    sendable = e.join(deg, "src").persist()
    try:
        teleport = unit - unit * damping_pct // 100
        n_edges = sendable.count()
        if n_edges == 0:
            # empty graph: zero nodes move zero mass every round — the
            # distributed loop below computes exactly these rows via
            # empty-frame jobs (and the fast path's mapInPandas never
            # fires on a 0-row source)
            return edges.sparkSession.createDataFrame(
                [(t, 0, 0, 0.0) for t in range(1, n_iters + 1)],
                "round int, l1_delta long, n_nodes long, avg_move double",
            )
        if n_edges < SINGLE_TASK_MAX_EDGES:
            # Small-graph fast path (same bound/rationale as the
            # components/LPA fast paths): collect the bounded cached
            # (src, dst, outdeg) list and run all power-iteration
            # rounds + L1 residuals on the DRIVER, returning a
            # one-slice local frame. Python ints reproduce the BIGINT
            # floor-division arithmetic exactly (all operands
            # non-negative), so the residual curve is bit-identical —
            # pinned by test against the distributed rounds. Round 14
            # ran this as a coalesce(1) mapInPandas + eager
            # localCheckpoint, which still paid the Python-worker
            # round-trip + checkpoint job per declaration (~1.5-2 s
            # measured r15, warm session).
            rows3 = sendable.collect()
            srcs = [r[0] for r in rows3]
            dsts = [r[1] for r in rows3]
            degs = [r[2] for r in rows3]
            node_set = sorted(set(srcs) | set(dsts))
            score = {n: unit for n in node_set}
            out_rows = []
            for t in range(1, n_iters + 1):
                contrib: dict[int, int] = {}
                for s, d2, od in zip(srcs, dsts, degs):
                    c = (score[s] * damping_pct) // 100 // od
                    contrib[d2] = contrib.get(d2, 0) + c
                new = {n: teleport + contrib.get(n, 0) for n in node_set}
                l1 = sum(abs(new[n] - score[n]) for n in node_set)
                out_rows.append(
                    (
                        t,
                        l1,
                        len(node_set),
                        float(l1) / (len(node_set) * unit),
                    )
                )
                score = new
            return driver_rows_df(
                edges.sparkSession,
                out_rows,
                "round int, l1_delta long, n_nodes long, avg_move double",
            )
        scores = nodes.select(
            "node", F.lit(unit).cast("long").alias("score")
        ).localCheckpoint(eager=True)
        n_nodes = scores.count()
        rows = []
        for t in range(1, n_iters + 1):
            contrib = (
                sendable.join(
                    scores.select(F.col("node").alias("src"), "score"), "src"
                )
                .select(
                    F.col("dst").alias("node"),
                    F.expr(
                        f"(score * {damping_pct}) DIV 100 DIV outdeg"
                    ).alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("contrib"))
            )
            new = (
                nodes.join(contrib, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(teleport)
                        + F.coalesce(F.col("contrib"), F.lit(0))
                    )
                    .cast("long")
                    .alias("score"),
                )
                .localCheckpoint(eager=True)
            )
            l1 = (
                new.join(
                    scores.select("node", F.col("score").alias("prev")),
                    "node",
                )
                .agg(F.sum(F.abs(F.col("score") - F.col("prev"))).alias("l1"))
                .collect()[0]["l1"]
            )
            l1 = int(l1) if l1 is not None else 0
            avg = float(l1) / (n_nodes * unit) if n_nodes else 0.0
            rows.append((t, l1, n_nodes, avg))
            scores = new
        return edges.sparkSession.createDataFrame(
            rows,
            "round int, l1_delta long, n_nodes long, avg_move double",
        )
    finally:
        sendable.unpersist()
