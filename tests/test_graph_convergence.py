"""label_propagation_convergence — the per-round change curve
(operators/graph.py; corpus row llm_labelprop_convergence)."""

from __future__ import annotations

import pytest


def test_convergence_curve_on_known_graph(spark):
    """Triangle {1,2,3} + isolated edge {4,5}. Hand-rolled synchronous
    rounds (min-label ties):

      l1 = {1:2, 2:1, 3:1, 4:5, 5:4}   -> 5/5 changed
      l2 = {1:1, 2:1, 3:1, 4:4, 5:5}   -> 3/5 changed (1 joins; edge flips)
      l3 = {1:1, 2:1, 3:1, 4:5, 5:4}   -> 2/5 changed (edge oscillates)

    The triangle converges, the isolated edge 2-cycles — exactly the
    signal the diagnostic exists to surface."""
    from etl_global_mobility_spark.operators.graph import (
        label_propagation_convergence,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5)], "src long, dst long"
    )
    rows = {
        r.round: r
        for r in label_propagation_convergence(edges, n_iters=3).collect()
    }
    assert [rows[t].n_nodes for t in (1, 2, 3)] == [5, 5, 5]
    assert [rows[t].n_changed for t in (1, 2, 3)] == [5, 3, 2]
    assert rows[1].frac_changed == 1.0
    assert rows[2].frac_changed == 0.6
    assert rows[3].frac_changed == 0.4


def test_convergence_matches_label_propagation_rounds(spark):
    """The diagnostic's round semantics must be the operator's: after
    the curve hits 0 changed, label_propagation at that n_iters is a
    fixed point."""
    from etl_global_mobility_spark.operators.graph import (
        label_propagation,
        label_propagation_convergence,
    )

    # clique of 4: converges to all-min and stays fixed (a star would
    # NOT work here — stars are bipartite and 2-cycle forever)
    edges = spark.createDataFrame(
        [(i, j) for i in range(4) for j in range(i + 1, 4)],
        "src long, dst long",
    )
    curve = {
        r.round: r.n_changed
        for r in label_propagation_convergence(edges, n_iters=4).collect()
    }
    fixed_after = min(t for t, c in curve.items() if c == 0)
    a = {
        (r.node, r.label)
        for r in label_propagation(edges, n_iters=fixed_after).collect()
    }
    b = {
        (r.node, r.label)
        for r in label_propagation(edges, n_iters=fixed_after + 1).collect()
    }
    assert a == b


def test_convergence_validates_n_iters(spark):
    from etl_global_mobility_spark.operators.graph import (
        label_propagation_convergence,
    )

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iters"):
        label_propagation_convergence(edges, n_iters=0)


def test_pagerank_residual_curve_on_known_graph(spark):
    """Single edge a->b, unit=1e6, damping 85 (teleport 150000).
    Hand-rolled integer rounds:

      it1: a 1000000->150000 (delta 850000); b gets 850000+150000 =
           1000000 (delta 0)                       -> L1 850000
      it2: a stays 150000; b gets (150000*85)//100 = 127500
           + 150000 = 277500 (delta 722500)        -> L1 722500
      it3: identical sends -> fixed point          -> L1 0
    """
    from etl_global_mobility_spark.operators.graph import (
        pagerank_convergence,
    )

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    rows = {
        r.round: r for r in pagerank_convergence(edges, n_iters=3).collect()
    }
    assert [rows[t].l1_delta for t in (1, 2, 3)] == [850000, 722500, 0]
    assert [rows[t].n_nodes for t in (1, 2, 3)] == [2, 2, 2]
    assert rows[1].avg_move == 850000 / 2_000_000
    assert rows[3].avg_move == 0.0


def test_pagerank_convergence_matches_pagerank_rounds(spark):
    """After the residual hits 0, pagerank at that n_iters is a fixed
    point — the diagnostic's round semantics are the operator's."""
    from etl_global_mobility_spark.operators.graph import (
        pagerank,
        pagerank_convergence,
    )

    edges = spark.createDataFrame(
        [(1, 2), (3, 2), (4, 2)], "src long, dst long"
    )
    curve = {
        r.round: r.l1_delta
        for r in pagerank_convergence(edges, n_iters=4).collect()
    }
    fixed_after = min(t for t, d in curve.items() if d == 0)
    a = {(r.node, r.score) for r in pagerank(edges, n_iters=fixed_after).collect()}
    b = {(r.node, r.score) for r in pagerank(edges, n_iters=fixed_after + 1).collect()}
    assert a == b
