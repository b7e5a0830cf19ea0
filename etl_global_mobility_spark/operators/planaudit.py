"""EXPLAIN-driven plan-shape reporting — the per-round plan audit
(SURVEY §4, tests/test_plans.py) operationalized as an engine feature.

A nightly pipeline doesn't just want its queries to RUN — it wants to
know when a code or data change silently degrades a PLAN: a broadcast
that became a shuffle join, a filter that stopped pushing down, a
Python eval node that leaked into a hot path, a cartesian product. At
100 TB those regressions cost hours before any output differs. This
module extracts the scale-relevant shape of a query's physical plan
into a row, so plan shapes can be persisted per release and DIFFED —
the same regression-ratchet discipline bench.py applies to runtimes,
applied to plans.

Driver-side by construction: input is a handful of ALREADY-DECLARED
DataFrames (no jobs run — ``executedPlan`` only plans), output is one
bounded row per query.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Python-eval physical nodes (kept in sync with the plan-sweep
#: allowlist in tests/test_plans.py). ArrowEvalPython before
#: BatchEvalPython so the alternation never double-counts.
_PY_NODES = re.compile(
    r"ArrowEvalPython|BatchEvalPython|MapInPandas|MapInArrow"
    r"|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas|AggregateInPandas"
    r"|PythonMapInArrow"
)
_SHUFFLES = re.compile(
    r"Exchange (?:hashpartitioning|rangepartitioning|"
    r"RoundRobinPartitioning|SinglePartition)"
)


def plan_shape_row(name: str, df: DataFrame) -> dict:
    """Extract the scale-relevant shape of ``df``'s physical plan.

    Counts come from the pre-execution plan (AQE's initial plan —
    the shape Catalyst committed to from statistics alone, which is
    what a static regression diff can compare release-to-release).
    ``est_rows`` is the optimizer's row-count estimate for the final
    operator (NULL without CBO stats), ``est_size_bytes`` its
    sizeInBytes estimate.
    """
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    stats = qe.optimizedPlan().stats()
    row_opt = stats.rowCount()
    # Catalyst statistics are unbounded BigInts — join estimates
    # multiply out past 2^63 on multi-join plans (seen: ~2e20 at
    # sf0.1) — so both estimates ride as DOUBLE: this is a magnitude
    # report for release-to-release diffing, not an exact count.
    return {
        "query": name,
        "n_shuffles": len(_SHUFFLES.findall(plan)),
        "n_broadcasts": plan.count("BroadcastExchange"),
        "n_scans": plan.count("Scan "),
        "n_python_nodes": len(_PY_NODES.findall(plan)),
        "has_cartesian": "CartesianProduct" in plan,
        "est_rows": float(str(row_opt.get())) if row_opt.isDefined() else None,
        "est_size_bytes": float(str(stats.sizeInBytes())),
    }


def plan_shape_report(
    spark: SparkSession, queries: dict[str, DataFrame]
) -> DataFrame:
    """One row per named query: its plan's shuffle/broadcast/scan/
    Python-node counts, cartesian flag, and optimizer estimates —
    sorted by query name for a deterministic layout."""
    rows = [plan_shape_row(n, df) for n, df in sorted(queries.items())]
    return spark.createDataFrame(
        rows,
        "query string, n_shuffles int, n_broadcasts int, n_scans int, "
        "n_python_nodes int, has_cartesian boolean, est_rows double, "
        "est_size_bytes double",
    )


#: Structural plan columns compared by :func:`perf_plan_diff` — the
#: data-independent shape. The est_* estimates are magnitudes that move
#: with the data and are deliberately NOT part of ``plan_changed``.
_SHAPE_COLS = (
    "n_shuffles",
    "n_broadcasts",
    "n_scans",
    "n_python_nodes",
    "has_cartesian",
)


def perf_plan_diff(
    spark: SparkSession,
    plan_prev: DataFrame,
    plan_now: DataFrame,
    secs_prev: dict[str, float],
    secs_now: dict[str, float],
    slow_ratio: float = 1.5,
) -> DataFrame:
    """The release-review report: join per-query wall times onto the
    plan-shape diff so ONE artifact answers "did this query get slower,
    and did its plan change when it did?" — the cross-reference the
    bench post-mortem otherwise reconstructs by hand from
    BENCH_FULL_*.json and two EXPLAIN dumps.

    ``plan_prev``/``plan_now`` are :func:`plan_shape_report` outputs
    (persist one per release, read it back); ``secs_prev``/``secs_now``
    are the ``{"query": seconds}`` maps bench.py emits. Output: one row
    per query in either release with

    * ``secs_prev`` / ``secs_now`` / ``time_ratio`` (now/prev; NULL
      when either side is missing a measurement),
    * ``plan_deltas`` — ``["n_shuffles 1 -> 3", ...]`` for every
      structural column that moved (empty array when the shape held),
    * ``status`` — ``added`` / ``removed`` for coverage changes, else
      ``slower+plan_changed`` (the review-first bucket),
      ``slower``, ``plan_changed``, or ``ok``.

    Driver-side by construction: both inputs are one bounded row per
    query (hundreds), so every join here is broadcast-sized; the heavy
    lifting (EXPLAIN extraction) already happened in
    :func:`plan_shape_report` without running a single job.
    """
    prev = plan_prev.select(
        "query", *[F.col(c).alias(f"prev_{c}") for c in _SHAPE_COLS]
    )
    now = plan_now.select(
        "query", *[F.col(c).alias(f"now_{c}") for c in _SHAPE_COLS]
    )
    t_prev = spark.createDataFrame(
        [(k, float(v)) for k, v in secs_prev.items()] or [(None, None)],
        "query string, secs_prev double",
    ).filter(F.col("query").isNotNull())
    t_now = spark.createDataFrame(
        [(k, float(v)) for k, v in secs_now.items()] or [(None, None)],
        "query string, secs_now double",
    ).filter(F.col("query").isNotNull())

    j = (
        now.join(prev, "query", "full_outer")
        .join(t_now, "query", "left")
        .join(t_prev, "query", "left")
    )
    deltas = F.array_compact(
        F.array(
            *[
                F.when(
                    F.col(f"prev_{c}").isNotNull()
                    & F.col(f"now_{c}").isNotNull()
                    & (F.col(f"prev_{c}") != F.col(f"now_{c}")),
                    F.concat_ws(
                        " ",
                        F.lit(c),
                        F.col(f"prev_{c}").cast("string"),
                        F.lit("->"),
                        F.col(f"now_{c}").cast("string"),
                    ),
                )
                for c in _SHAPE_COLS
            ]
        )
    )
    ratio = F.when(
        F.col("secs_prev").isNotNull()
        & (F.col("secs_prev") > F.lit(0.0))
        & F.col("secs_now").isNotNull(),
        F.col("secs_now") / F.col("secs_prev"),
    )
    slower = F.coalesce(ratio > F.lit(float(slow_ratio)), F.lit(False))
    plan_changed = F.size("plan_deltas") > 0
    status = (
        F.when(F.col(f"prev_{_SHAPE_COLS[0]}").isNull(), F.lit("added"))
        .when(F.col(f"now_{_SHAPE_COLS[0]}").isNull(), F.lit("removed"))
        .when(slower & plan_changed, F.lit("slower+plan_changed"))
        .when(slower, F.lit("slower"))
        .when(plan_changed, F.lit("plan_changed"))
        .otherwise(F.lit("ok"))
    )
    return (
        j.withColumn("plan_deltas", deltas)
        .withColumn("time_ratio", F.round(ratio, 4))
        .withColumn("status", status)
        .select(
            "query",
            "secs_prev",
            "secs_now",
            "time_ratio",
            "plan_deltas",
            "status",
        )
        .orderBy(
            # review-first layout: the dangerous bucket sorts to the top
            F.when(F.col("status") == "slower+plan_changed", 0)
            .when(F.col("status") == "slower", 1)
            .when(F.col("status") == "plan_changed", 2)
            .when(F.col("status") == "added", 3)
            .when(F.col("status") == "removed", 4)
            .otherwise(5),
            F.col("time_ratio").desc_nulls_last(),
            "query",
        )
    )
