"""Custom Python Data Source (Spark 4.x API): partition planning,
determinism, and schema contract."""

from __future__ import annotations

from etl_global_mobility_spark.sources.pysource import (
    SyntheticEventsReader,
    register,
)


def _load(spark, n_rows=500, n_partitions=4):
    register(spark)
    return (
        spark.read.format("synthetic_events")
        .option("n_rows", n_rows)
        .option("n_partitions", n_partitions)
        .load()
    )


def test_schema_and_rowcount(spark):
    df = _load(spark)
    assert df.schema.simpleString() == (
        "struct<event_id:bigint,user_id:bigint,bucket:int,value:double>"
    )
    assert df.count() == 500


def test_partition_planning(spark):
    assert _load(spark, 1000, 8).rdd.getNumPartitions() == 8
    # ragged division: ceil(10/3)=4 → partitions of 4,4,2
    parts = SyntheticEventsReader({"n_rows": "10", "n_partitions": "3"}).partitions()
    assert [(p.start, p.end) for p in parts] == [(0, 4), (4, 8), (8, 10)]


def test_rows_are_closed_form_and_deterministic(spark):
    rows = {r["event_id"]: r for r in _load(spark).collect()}
    assert len(rows) == 500
    for i in (0, 97, 499):
        assert rows[i]["user_id"] == i % 97
        assert rows[i]["bucket"] == i % 8
        assert rows[i]["value"] == (i * 31 % 1000) / 8.0
    # re-read yields identical rows (no hidden RNG state)
    again = {r["event_id"]: r for r in _load(spark).collect()}
    assert rows == again


def test_partition_count_does_not_change_content(spark):
    a = sorted(map(tuple, _load(spark, 300, 2).collect()))
    b = sorted(map(tuple, _load(spark, 300, 7).collect()))
    assert a == b
