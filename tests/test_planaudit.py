"""perf_plan_diff — the release-review join of wall times onto plan
shapes (operators/planaudit.py; scripts/plan_perf_diff.py is the CLI)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.planaudit import (
    perf_plan_diff,
    plan_shape_report,
)

SHAPE_SCHEMA = (
    "query string, n_shuffles int, n_broadcasts int, n_scans int, "
    "n_python_nodes int, has_cartesian boolean, est_rows double, "
    "est_size_bytes double"
)


def _shape(query, n_shuffles=1, n_broadcasts=0, n_scans=1,
           n_python_nodes=0, has_cartesian=False):
    return (query, n_shuffles, n_broadcasts, n_scans, n_python_nodes,
            has_cartesian, None, 1.0)


def test_statuses_and_deltas(spark):
    prev = spark.createDataFrame(
        [
            _shape("q_ok"),
            _shape("q_slower"),
            _shape("q_planchange", n_broadcasts=1),
            _shape("q_both", n_shuffles=1),
            _shape("q_removed"),
            _shape("q_no_times"),
        ],
        SHAPE_SCHEMA,
    )
    now = spark.createDataFrame(
        [
            _shape("q_ok"),
            _shape("q_slower"),
            # broadcast degraded to a shuffle: the canonical regression
            _shape("q_planchange", n_broadcasts=0, n_shuffles=2),
            _shape("q_both", n_shuffles=3),
            _shape("q_added"),
            _shape("q_no_times"),
        ],
        SHAPE_SCHEMA,
    )
    secs_prev = {"q_ok": 1.0, "q_slower": 1.0, "q_planchange": 1.0,
                 "q_both": 1.0, "q_removed": 1.0}
    secs_now = {"q_ok": 1.1, "q_slower": 2.0, "q_planchange": 1.2,
                "q_both": 4.0, "q_added": 0.5}

    rows = {
        r["query"]: r
        for r in perf_plan_diff(
            spark, prev, now, secs_prev, secs_now, slow_ratio=1.5
        ).collect()
    }
    assert rows["q_ok"]["status"] == "ok"
    assert rows["q_ok"]["plan_deltas"] == []
    assert rows["q_slower"]["status"] == "slower"
    assert rows["q_slower"]["time_ratio"] == 2.0
    assert rows["q_planchange"]["status"] == "plan_changed"
    assert sorted(rows["q_planchange"]["plan_deltas"]) == [
        "n_broadcasts 1 -> 0",
        "n_shuffles 1 -> 2",
    ]
    assert rows["q_both"]["status"] == "slower+plan_changed"
    assert rows["q_both"]["plan_deltas"] == ["n_shuffles 1 -> 3"]
    assert rows["q_added"]["status"] == "added"
    assert rows["q_removed"]["status"] == "removed"
    # missing measurements must not fabricate a ratio or a "slower"
    assert rows["q_no_times"]["time_ratio"] is None
    assert rows["q_no_times"]["status"] == "ok"

    # review-first ordering: the dangerous bucket leads the report
    ordered = [
        r["query"]
        for r in perf_plan_diff(
            spark, prev, now, secs_prev, secs_now, slow_ratio=1.5
        ).collect()
    ]
    assert ordered[0] == "q_both"
    assert ordered[1] == "q_slower"
    assert ordered[2] == "q_planchange"


def test_real_plan_regression_is_flagged(spark):
    """A broadcast join degrading to a shuffled-hash join — the exact
    regression class the report exists for — must land in plan_deltas
    via real EXPLAIN extraction, not synthetic rows."""
    big = spark.range(0, 10_000).withColumn("k", F.col("id") % 100)
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    good = big.join(F.broadcast(dim), "k").groupBy("v").count()
    bad = big.join(dim.hint("shuffle_hash"), "k").groupBy("v").count()

    prev = plan_shape_report(spark, {"q": good})
    now = plan_shape_report(spark, {"q": bad})
    row = perf_plan_diff(
        spark, prev, now, {"q": 1.0}, {"q": 1.1}
    ).collect()[0]
    assert row["status"] == "plan_changed"
    deltas = " ".join(row["plan_deltas"])
    assert "n_broadcasts" in deltas and "n_shuffles" in deltas
