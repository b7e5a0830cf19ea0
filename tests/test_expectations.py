"""Declarative expectations engine: planted violations are counted per
rule; FK orphans and duplicate keys detected; conservative NULL
handling (unevaluable rule = violation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.expectations import validation_report


def test_planted_violations_counted(spark):
    rows = [
        (1, 10.0, "O"),
        (2, -5.0, "O"),     # positive_price violation
        (2, 7.0, "X"),      # duplicate key + unknown status
        (None, 3.0, "F"),   # null key -> not_null violation
        (9, None, "F"),     # NULL price -> unevaluable -> violation
    ]
    df = spark.createDataFrame(rows, "k long, price double, status string")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    rep = {
        r["rule"]: (r["n_violations"], r["ok"])
        for r in validation_report(
            df,
            row_rules={
                "not_null_k": F.col("k").isNotNull(),
                "positive_price": F.col("price") > 0,
                "known_status": F.col("status").isin("O", "F"),
            },
            unique_key="k",
            fk=(parent, "k", "pk"),
        ).collect()
    }
    assert rep["not_null_k"] == (1, False)
    assert rep["positive_price"] == (2, False)  # -5 and NULL
    assert rep["known_status"] == (1, False)
    assert rep["unique_k"] == (1, False)  # k=2 twice
    assert rep["fk_k"] == (1, False)  # k=9 has no parent
    assert len(rep) == 5


def test_clean_table_all_ok(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    rep = validation_report(
        df, row_rules={"v_pos": F.col("v") > 0}, unique_key="k"
    ).collect()
    assert all(r["ok"] and r["n_violations"] == 0 for r in rep)


def test_requires_some_expectation(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        validation_report(df, row_rules={})


def test_fk_only_report(spark):
    """fk alone (row_rules={} and no unique_key) must produce a
    one-row report, not crash on an empty stack()."""
    df = spark.createDataFrame([(1,), (9,)], "k long")
    parent = spark.createDataFrame([(1,)], "pk long")
    rep = validation_report(df, row_rules={}, fk=(parent, "k", "pk")).collect()
    assert len(rep) == 1
    assert rep[0]["rule"] == "fk_k"
    assert rep[0]["n_violations"] == 1 and rep[0]["ok"] is False
