"""k-anonymity operators (operators/privacy.py): audit semantics, the
suppress⊨audit consistency property, and the single-aggregation plan."""

from __future__ import annotations

import pytest


def _rows(spark):
    data = [
        # (id, lang, region): class (en, eu) has 3 rows; (en, us) 2;
        # (fr, eu) 1 — so k=3 keeps exactly the first class
        (1, "en", "eu"),
        (2, "en", "eu"),
        (3, "en", "eu"),
        (4, "en", "us"),
        (5, "en", "us"),
        (6, "fr", "eu"),
    ]
    return spark.createDataFrame(data, "id long, lang string, region string")


def test_k_anonymity_report_classes_and_shares(spark):
    from etl_global_mobility_spark.operators.privacy import (
        k_anonymity_report,
    )

    df = _rows(spark)
    rep = {
        (r["lang"], r["region"]): r
        for r in k_anonymity_report(df, ["lang", "region"], k=3).collect()
    }
    assert rep[("en", "eu")]["n_rows"] == 3
    assert rep[("en", "eu")]["at_risk"] is False
    assert rep[("en", "us")]["at_risk"] is True
    assert rep[("fr", "eu")]["at_risk"] is True
    assert abs(sum(r["row_share"] for r in rep.values()) - 1.0) < 1e-12
    with pytest.raises(ValueError, match="k must be >= 2"):
        k_anonymity_report(df, ["lang"], k=1)
    with pytest.raises(ValueError, match="quasi_cols"):
        k_anonymity_report(df, [], k=3)


def test_k_suppress_consistent_with_report(spark):
    """Every released row's class must audit as NOT at risk, and the
    released table must itself be k-anonymous (re-audit finds zero
    at-risk classes)."""
    from etl_global_mobility_spark.operators.privacy import (
        k_anonymity_report,
        k_anonymity_suppress,
    )

    df = _rows(spark)
    kept = k_anonymity_suppress(df, ["lang", "region"], k=3)
    assert sorted(r["id"] for r in kept.collect()) == [1, 2, 3]
    re_audit = k_anonymity_report(kept, ["lang", "region"], k=3)
    assert re_audit.filter("at_risk").count() == 0


def test_k_anonymity_plans_single_keyed_pass(spark):
    """Audit = one hash agg + broadcast 1-row total; suppress (round
    8) = mergeable class-size agg + LEFT-SEMI join back — the shape
    AQE can skew-split when one equivalence class dominates, unlike
    the previous count-over-window which moved a giant class to one
    sorting task. The agg must combine map-side and the join must be
    semi (rows pass through once, never duplicated)."""
    from etl_global_mobility_spark.operators.privacy import (
        k_anonymity_report,
        k_anonymity_suppress,
    )

    df = _rows(spark)
    audit_plan = (
        k_anonymity_report(df, ["lang", "region"], 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in audit_plan
    assert "BroadcastExchange" in audit_plan  # the 1-row total
    sup_plan = (
        k_anonymity_suppress(df, ["lang", "region"], 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in sup_plan  # hot-key window shape retired
    assert "LeftSemi" in sup_plan
    assert "partial_count" in sup_plan  # class sizes combine map-side
    assert "CartesianProduct" not in sup_plan


def test_k_suppress_rejects_meaningless_k(spark):
    """Review r7: k=1 suppresses nothing — the sibling audit already
    rejects it; suppress must too, not hand the full table downstream
    as a 'privacy release'."""
    from etl_global_mobility_spark.operators.privacy import (
        k_anonymity_suppress,
    )

    df = _rows(spark)
    with pytest.raises(ValueError, match="k must be >= 2"):
        k_anonymity_suppress(df, ["lang"], k=1)


def test_k_suppress_null_quasi_values_form_a_class(spark):
    """Round-8 join-back regression guard: groupBy puts NULL quasi
    values in ONE class (as the old window's partitionBy did), so the
    null-safe semi join must keep a NULL class that reaches k and drop
    one that doesn't — a plain '=' join would silently drop every
    NULL-attribute row regardless of class size."""
    from etl_global_mobility_spark.operators.privacy import (
        k_anonymity_suppress,
    )

    rows = [
        (1, None, "r1"), (2, None, "r1"), (3, None, "r1"),  # NULL class, n=3
        (4, None, "r2"),                                    # NULL class, n=1
        (5, "en", "r1"), (6, "en", "r1"), (7, "en", "r1"),
    ]
    df = spark.createDataFrame(rows, "id long, lang string, region string")
    kept = {
        r["id"] for r in k_anonymity_suppress(df, ["lang", "region"], 3).collect()
    }
    assert kept == {1, 2, 3, 5, 6, 7}
