"""as-of join semantics: backward-inclusive match, tie-break, no-match
NULLs, struct-carried payload consistency, single-shuffle plan."""

from __future__ import annotations

import datetime as dt

from etl_global_mobility_spark.operators.temporal import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),  # matches r2 (exact tie, incl.)
            (2, 10, _ts("2024-01-01 09:00:00")),  # matches r1
            (3, 10, _ts("2024-01-01 08:00:00")),  # before all rights → NULL
            (4, 20, _ts("2024-01-01 12:00:00")),  # key with no rights → NULL
        ],
        "lid long, k long, lt timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 08:30:00"), "a"),
            (101, 10, _ts("2024-01-01 10:00:00"), "b"),  # tie ts with lid=1
            (102, 10, _ts("2024-01-01 10:00:00"), "c"),  # same ts, larger id wins
            (103, 10, _ts("2024-01-01 11:00:00"), "d"),  # after every left
        ],
        "rid long, k long, rt timestamp, tag string",
    )
    out = asof_join(
        left, right, on="k", left_time="lt", right_time="rt",
        right_cols=["rid", "tag"], tiebreak="rid",
    )
    got = {r.lid: (r.asof_rid, r.asof_tag) for r in out.collect()}
    assert got == {
        1: (102, "c"),   # inclusive at equal ts; rid 102 > 101 wins the tie
        2: (100, "a"),
        3: (None, None),
        4: (None, None),
    }
    assert out.count() == 4  # every left row survives exactly once


def test_asof_join_single_shuffle(spark):
    """The merge-asof must cost one exchange on the key (plus the
    union), never a pair-exploding range join."""
    left = spark.range(10).selectExpr(
        "id AS lid", "id % 3 AS k", "timestamp_micros(id * 1000000) AS lt"
    )
    right = spark.range(10).selectExpr(
        "id AS rid", "id % 3 AS k", "timestamp_micros(id * 500000) AS rt"
    )
    out = asof_join(
        left, right, on="k", left_time="lt", right_time="rt",
        right_cols=["rid"], tiebreak="rid",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # union+window, not a join


def test_resample_ffill_semantics(spark):
    """Hand-built series: grid bounds, carry-forward, exact-instant
    observation wins at its own grid point, leading NULL before the
    first observation."""
    from etl_global_mobility_spark.operators.temporal import resample_ffill

    rows = [
        # user 1: obs at 00:30 (v=1.0), 02:00 sharp (v=2.0), 02:45 (v=3.0)
        (1, "2024-01-01 00:30:00", 1.0, 10),
        (1, "2024-01-01 02:00:00", 2.0, 11),
        (1, "2024-01-01 02:45:00", 3.0, 12),
    ]
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        rows, "user_id long, ts string, value double, event_id long"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        str(r.grid_ts): r.value_ffill
        for r in resample_ffill(ev).collect()
    }
    assert out == {
        "2024-01-01 00:00:00": None,  # grid starts at trunc(min); no obs yet
        "2024-01-01 01:00:00": 1.0,  # carried forward
        "2024-01-01 02:00:00": 2.0,  # obs at the exact instant wins
    }


def test_sessionize_single_exchange_and_boundary(spark):
    """Stacked lag+cumsum windows share one shuffle, and an event at
    exactly `gap` after the previous one starts a NEW session (matching
    Spark's exclusive session_window end)."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.temporal import sessionize
    from tests.test_plans import plan_of

    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:04:59"),  # < gap → same session
        (1, "2024-01-01 00:09:59"),  # exactly 5 min after → NEW session
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = sessionize(ev, gap="5 minutes").orderBy("ts").collect()
    assert [r.session_id for r in out] == [0, 0, 1]
    assert plan_of(sessionize(ev)).count("Exchange") == 1


def test_grid_nearest_neighbor_contract(spark):
    """Spatial grid join semantics: nearest within the 3x3 cell
    neighborhood only (an isolated point emits NOTHING — the documented
    radius contract), squared-degree distances, neighbor-id tie-break."""
    from etl_global_mobility_spark.operators.spatial import (
        grid_nearest_neighbor,
    )

    pts = spark.createDataFrame(
        [
            (1, 0.0, 0.0),
            (2, 0.0, 1.0),     # 1's nearest (d2 = 1.0)
            (3, 0.0, 3.0),     # nearer to 2 than to 1
            (4, 50.0, 50.0),   # isolated: no point within one cell ring
            (5, 0.0, -1.0),    # ties with 2 for point 1? d2 = 1.0 -> id wins
        ],
        "id long, lat double, lon double",
    )
    out = {r.id: r for r in grid_nearest_neighbor(pts, cell_deg=5.0).collect()}
    assert 4 not in out  # isolated point emits nothing
    # 1 has two candidates at d2=1.0 (ids 2 and 5): tie-break on id -> 2
    assert out[1].nearest_id == 2 and out[1].d2 == 1.0
    assert out[2].nearest_id == 1
    assert out[3].nearest_id == 2 and out[3].d2 == 4.0
    assert out[5].nearest_id == 1


def test_interval_overlap_join_exactly_once_and_touching(spark):
    """Bucketized interval overlap: a pair overlapping across MANY
    shared buckets emits exactly once; touching endpoints count
    (closed intervals); disjoint intervals emit nothing; the
    partition key scopes candidates."""
    from etl_global_mobility_spark.operators.temporal import (
        interval_overlap_join,
    )

    iv = spark.createDataFrame(
        [
            ("d1", 1, 0, 100),    # spans buckets 0..10 at width 10
            ("d1", 2, 5, 95),     # overlaps 1 across ~9 shared buckets
            ("d1", 3, 100, 120),  # touches 1 at 100 (closed -> counts)
            ("d1", 4, 200, 210),  # disjoint
            ("d2", 5, 0, 100),    # same span, different partition key
        ],
        "day string, user_id long, start long, end long",
    )
    out = interval_overlap_join(
        iv, iv, bucket_width=10, partition_cols=["day"]
    ).filter("a_user_id < b_user_id")
    pairs = sorted(
        (r.a_user_id, r.b_user_id, r.overlap_amount) for r in out.collect()
    )
    # exactly one row per overlapping pair, despite many shared buckets
    assert pairs == [(1, 2, 90), (1, 3, 0)]


def test_ohlc_downsample_tie_breaks_by_event_id(spark):
    """Two events sharing the bar-opening timestamp: open_v must be
    the value of the LOWER event_id (the padded (epoch, id) ordering
    key), identically in any partition layout; plain min/max are
    unaffected."""
    from etl_global_mobility_spark.corpus.relational import q_ohlc_downsample
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 9, 0, 0), 7, "trade", 100.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 9, 0, 0), 7, "trade", 50.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 17, 0, 0), 7, "trade", 80.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 17, 0, 0), 7, "trade", 90.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import tempfile

    for n_parts in (1, 5):
        with tempfile.TemporaryDirectory() as d:
            df.repartition(n_parts).write.parquet(f"{d}/events.parquet")
            (out,) = q_ohlc_downsample(spark, d).collect()
            assert out.open_v == 100.0   # min key: id 1 wins the ts tie
            assert out.close_v == 90.0   # max key: id 4 wins at close
            assert out.high_v == 100.0 and out.low_v == 50.0
            assert out.n_events == 4


def test_event_order_key_no_truncation_at_13_digit_ids(spark):
    """Regression: the 19-digit id pad must not truncate large ids —
    with the old 12-digit pad, two 13-digit ids sharing a prefix
    collided and the arg-extrema tie-break went nondeterministic."""
    from etl_global_mobility_spark.operators.temporal import (
        event_order_key,
        ohlc_aggregates,
    )
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        (1234567890123, t, "trade", 5.0),   # shares 12-char prefix...
        (1234567890129, t, "trade", 9.0),   # ...with this one
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    (out,) = df.groupBy("event_type").agg(*ohlc_aggregates()).collect()
    assert out.open_v == 5.0 and out.close_v == 9.0
    keys = df.select(event_order_key().alias("k")).collect()
    assert len({r.k for r in keys}) == 2 and all(len(r.k) == 38 for r in keys)
