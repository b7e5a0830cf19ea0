"""Image-text alignment gate (operators/alignment.py): CLIP-score
semantics, NaN/NULL gating, report invariants, and the zero-shuffle
plan claim."""

import math

import pytest
from pyspark.sql import functions as F




def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def pairs(spark):
    rows = [
        # pair_id, image_embedding, text_embedding
        (1, [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]),     # cos = 1
        (2, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),     # cos = 0
        (3, [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]),    # cos = -1
        (4, [3.0, 4.0, 0.0], [3.0, 4.0, 0.0]),     # cos = 1, non-unit
        (5, [1.0, 1.0, 0.0], [1.0, 0.0, 0.0]),     # cos = 1/sqrt(2)
        (6, [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]),     # zero-norm -> NaN
        (7, None, [1.0, 0.0, 0.0]),                # NULL side -> NULL
    ]
    return spark.createDataFrame(
        rows,
        "pair_id long, image_embedding array<double>, "
        "text_embedding array<double>",
    )


def test_alignment_scores_known_values(pairs):
    from etl_global_mobility_spark.operators.alignment import (
        alignment_scores,
    )

    got = {r["pair_id"]: r["alignment"] for r in alignment_scores(pairs).collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(0.0)
    assert got[3] == pytest.approx(-1.0)
    assert got[4] == pytest.approx(1.0)
    assert got[5] == pytest.approx(1.0 / math.sqrt(2.0))
    assert math.isnan(got[6])
    assert got[7] is None


def test_alignment_gate_drops_nan_and_null_pairs(spark, pairs):
    """The load-bearing guard: in both Spark and DuckDB a bare
    ``NaN >= t`` comparison is TRUE (NaN sorts above every double), so
    an unguarded filter would wave zero-norm garbage through. The gate
    must keep exactly the real scores above threshold."""
    from etl_global_mobility_spark.operators.alignment import (
        alignment_gate,
    )

    # first prove the hazard is real in this engine
    hazard = (
        spark.range(1)
        .select(
            (F.lit(float("nan")) >= F.lit(0.5)).alias("nan_passes")
        )
        .first()
    )
    assert hazard["nan_passes"] is True

    kept = {r["pair_id"] for r in alignment_gate(pairs, threshold=0.5).collect()}
    assert kept == {1, 4, 5}
    # threshold is inclusive
    kept_inc = {
        r["pair_id"]
        for r in alignment_gate(pairs, threshold=1.0 / math.sqrt(2.0)).collect()
    }
    assert 5 in kept_inc


def test_alignment_gate_plan_is_map_only(pairs):
    """100 TB claim: scoring + gating is scan -> project -> filter,
    ZERO exchanges and ZERO joins."""
    from etl_global_mobility_spark.operators.alignment import (
        alignment_gate,
    )

    plan = _plan(alignment_gate(pairs))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_alignment_report_invariants(pairs):
    from etl_global_mobility_spark.operators.alignment import (
        alignment_report,
    )

    rows = alignment_report(pairs, threshold=0.5, n_bins=20).collect()
    by_bucket = {r["bucket"]: r for r in rows}
    assert sum(r["n_pairs"] for r in rows) == 7
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-12
    # NaN + NULL pairs land in the degenerate row, never a score bin
    assert by_bucket["degenerate"]["n_pairs"] == 2
    assert by_bucket["degenerate"]["n_kept"] == 0
    assert by_bucket["degenerate"]["score_lo"] is None
    # cos = 1.0 sits on the top edge and clamps into the LAST bin
    assert by_bucket["19"]["n_pairs"] == 2  # pairs 1 and 4
    assert by_bucket["19"]["n_kept"] == 2
    # cos = -1.0 -> first bin; below threshold
    assert by_bucket["0"]["n_pairs"] == 1
    assert by_bucket["0"]["n_kept"] == 0
    # cos = 0 -> bin 10 boundary (floor((0+1)/2*20) = 10)
    assert by_bucket["10"]["n_pairs"] == 1
    # kept mass across bins == what the gate keeps (threshold 0.5)
    assert sum(r["n_kept"] for r in rows) == 3


def test_alignment_report_is_bounded_and_single_agg(pairs):
    from etl_global_mobility_spark.operators.alignment import (
        alignment_report,
    )

    df = alignment_report(pairs, n_bins=20)
    assert df.count() <= 21
    plan = _plan(df)
    # one keyed aggregation on the bounded bin key; the only join is
    # the broadcast 1-row total
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "SortMergeJoin" not in plan
