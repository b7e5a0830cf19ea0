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
