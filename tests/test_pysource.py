"""Custom Python Data Source (Spark 4.x API): partition planning,
determinism, and schema contract."""

from __future__ import annotations

import pytest

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


def test_streaming_source_drains_across_batches(spark):
    """The stream advances one offset-batch per trigger; the drained
    complete-mode aggregate must equal the batch read's — proving
    offsets never skip or replay rows."""
    from etl_global_mobility_spark.streaming.ops import run_stream_until_idle

    register(spark)
    sdf = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", 500)
        .option("batch_size", 120)  # 5 micro-batches (120x4 + 20)
        .load()
    )
    out = run_stream_until_idle(sdf.groupBy("bucket").count(), "complete")
    got = {r["bucket"]: r["count"] for r in out.collect()}
    want = {
        r["bucket"]: r["count"]
        for r in _load(spark, 500, 4).groupBy("bucket").count().collect()
    }
    assert got == want
    assert sum(got.values()) == 500


def test_stream_reader_offsets_are_replayable():
    """readBetweenOffsets must re-derive exactly the rows read()
    produced for the same offset pair (the exactly-once contract)."""
    from etl_global_mobility_spark.sources.pysource import (
        SyntheticEventsStreamReader,
    )

    r = SyntheticEventsStreamReader({"n_rows": "50", "batch_size": "20"})
    start = r.initialOffset()
    first, mid = r.read(start)
    assert mid == {"pos": 20}
    assert list(r.readBetweenOffsets(start, mid)) == list(
        r.read(start)[0]
    )
    # bounded: offsets stop advancing at n_rows
    _, end = r.read({"pos": 40})
    assert end == {"pos": 50}
    _, end2 = r.read(end)
    assert end2 == {"pos": 50}


def test_writer_two_phase_commit(spark, tmp_path):
    import json
    import os

    register(spark)
    out = str(tmp_path / "sink")
    df = _load(spark, 100, 3)
    df.write.format("synthetic_events").option("path", out).mode("append").save()
    files = sorted(os.listdir(out))
    assert "_SUCCESS" in files
    assert [f for f in files if f.startswith("part-")] and not [
        f for f in files if f.endswith(".tmp")
    ]
    rows = []
    for f in files:
        if f.startswith("part-"):
            with open(os.path.join(out, f)) as fh:
                rows += [json.loads(line) for line in fh]
    assert len(rows) == 100
    with open(os.path.join(out, "_SUCCESS")) as fh:
        assert json.load(fh)["n_rows"] == 100
    assert sorted(r["event_id"] for r in rows) == list(range(100))


def test_writer_abort_leaves_no_visible_files(spark, tmp_path):
    """A failing task must abort the write: temp files removed, no
    _SUCCESS manifest, nothing a tmp-ignoring reader would see."""
    import os

    import pytest as _pytest

    register(spark)
    out = str(tmp_path / "sink_abort")
    from pyspark.sql.functions import udf
    from pyspark.sql.types import LongType

    @udf(LongType())
    def boom(x):
        if x == 30:
            raise RuntimeError("boom")
        return x

    bad = _load(spark, 50, 2).withColumn("event_id", boom("event_id"))
    with _pytest.raises(Exception):
        bad.write.format("synthetic_events").option("path", out).mode(
            "append"
        ).save()
    leftover = os.listdir(out) if os.path.exists(out) else []
    assert "_SUCCESS" not in leftover
    assert not [f for f in leftover if f.startswith("part-")]


def test_filter_pushdown_prunes_partitions(spark):
    """event_id range predicates must reach the reader: the filtered
    scan returns correct rows AND the reader-level interval shrinks
    (the custom-source analogue of min/max data skipping)."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from etl_global_mobility_spark.sources.pysource import (
        SyntheticEventsReader,
    )

    # reader-level: bounds tighten and partition planning follows
    r = SyntheticEventsReader({"n_rows": "1000", "n_partitions": "8"})
    rest = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("event_id",), 900),
                LessThan(("event_id",), 950),
                GreaterThanOrEqual(("user_id",), 0),  # unsupported
            ]
        )
    )
    assert (r.lo, r.hi) == (900, 950)
    assert len(rest) == 1  # the user_id filter is handed back
    parts = r.partitions()
    assert sum(p.end - p.start for p in parts) == 50

    # end-to-end: Spark result over the pruned scan is exact
    df = _load(spark, 1000, 8).filter("event_id >= 900 AND event_id < 950")
    rows = df.collect()
    assert len(rows) == 50
    assert sorted(r["event_id"] for r in rows) == list(range(900, 950))


def test_filter_pushdown_contradiction_plans_empty(spark):
    from pyspark.sql.datasource import GreaterThan, LessThan

    from etl_global_mobility_spark.sources.pysource import (
        SyntheticEventsReader,
    )

    r = SyntheticEventsReader({"n_rows": "100", "n_partitions": "4"})
    list(r.pushFilters([GreaterThan(("event_id",), 80), LessThan(("event_id",), 20)]))
    parts = r.partitions()
    assert sum(p.end - p.start for p in parts) == 0
    assert _load(spark, 100, 4).filter(
        "event_id > 80 AND event_id < 20"
    ).count() == 0


@pytest.mark.slow
def test_stream_writer_exactly_once_across_restart(spark, tmp_path):
    """Custom Python STREAMING sink: drain the synthetic stream into the
    JSON-dir stream writer with availableNow; every committed batch has
    a marker and deterministic file names; restarting on the same
    checkpoint reprocesses nothing; a second (fresh-checkpoint) run into
    the same dir overwrites its batches byte-identically instead of
    appending duplicates."""
    import glob
    import json
    import os

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run(checkpoint):
        # the pull-per-trigger SimpleDataSourceStreamReader advances one
        # offset batch per trigger, so Trigger.AvailableNow would stop
        # after batch 0 — drain on a zero-interval trigger and stop only
        # when the engine's own status flags report idle (stopping on
        # stale lastProgress would interrupt an in-flight batch)
        from etl_global_mobility_spark.streaming.ops import drain_until_idle

        register(spark)
        sdf = (
            spark.readStream.format("synthetic_events")
            .option("n_rows", 1000)
            .option("batch_size", 250)
            .load()
        )
        q = (
            sdf.writeStream.format("synthetic_events")
            .option("path", out)
            .option("checkpointLocation", checkpoint)
            .trigger(processingTime="0 seconds")
            .start()
        )
        drain_until_idle(q)

    def committed_rows():
        rows = []
        for marker in sorted(glob.glob(os.path.join(out, "_batch-*._SUCCESS"))):
            bid = json.load(open(marker))["batch_id"]
            for p in glob.glob(os.path.join(out, f"part-{bid:05d}-*.json")):
                rows += [json.loads(line) for line in open(p)]
        return rows

    run(ckpt)
    first = committed_rows()
    assert len(first) == 1000
    assert {r["event_id"] for r in first} == set(range(1000))
    # spot-check the closed form survived the sink
    by_id = {r["event_id"]: r for r in first}
    assert by_id[5]["value"] == (5 * 31 % 1000) / 8.0
    n_markers = len(glob.glob(os.path.join(out, "_batch-*._SUCCESS")))
    assert n_markers == 4  # 1000 rows / 250 per batch

    # restart on the SAME checkpoint: bounded stream already drained →
    # no new batches, no new files, no duplicated rows
    run(ckpt)
    assert len(committed_rows()) == 1000
    assert len(glob.glob(os.path.join(out, "_batch-*._SUCCESS"))) == n_markers

    # replay with a FRESH checkpoint into the same dir: batch ids and
    # file names repeat, so the sink overwrites itself — still 1000
    run(str(tmp_path / "ckpt2"))
    assert len(committed_rows()) == 1000
    assert not glob.glob(os.path.join(out, ".part-*.tmp"))  # no staged leftovers


@pytest.mark.slow
def test_stream_upsert_to_parquet_converges_to_batch_answer(spark, tmp_path):
    """Streaming MERGE effect contract: per-bucket counts/sums streamed
    in update mode through upsert-per-batch equal the batch aggregation
    of the whole source; a same-checkpoint restart changes nothing; no
    staging directories survive."""
    import glob

    from pyspark.sql import functions as F

    from etl_global_mobility_spark.streaming.ops import stream_upsert_to_parquet

    register(spark)
    target = str(tmp_path / "profiles")
    ckpt = str(tmp_path / "ckpt")

    def run(checkpoint):
        sdf = (
            spark.readStream.format("synthetic_events")
            .option("n_rows", 2000)
            .option("batch_size", 500)
            .load()
        )
        agg = sdf.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_v"),
        )
        stream_upsert_to_parquet(agg, target, checkpoint, keys=["bucket"])

    run(ckpt)
    got = {
        r.bucket: (r.n, float(r.sum_v))
        for r in spark.read.parquet(target).collect()
    }
    batch = (
        spark.read.format("synthetic_events")
        .option("n_rows", 2000)
        .load()
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_v"),
        )
    )
    want = {r.bucket: (r.n, float(r.sum_v)) for r in batch.collect()}
    assert got == want and len(got) == 8

    run(ckpt)  # restart: drained stream, no new batches, no change
    again = {
        r.bucket: (r.n, float(r.sum_v))
        for r in spark.read.parquet(target).collect()
    }
    assert again == want
    assert not glob.glob(str(tmp_path / "profiles__upsert-*"))


def test_stream_upsert_recovers_stranded_backup(spark, tmp_path):
    """Crash-window recovery: a previous swap that died between parking
    the old table at ``<target>__old__`` and promoting its staged copy
    leaves NO live target. The next batch must RESTORE the backup and
    merge into it — not silently rebuild the table from one
    micro-batch — and must drop the backup after promoting."""
    import os

    from pyspark.sql import functions as F

    from etl_global_mobility_spark.streaming.ops import stream_upsert_to_parquet

    register(spark)
    target = str(tmp_path / "profiles")
    backup = target + "__old__"
    # Simulate the stranded state: prior table parked at the fixed
    # backup path, target absent. bucket=999 exists ONLY here — if
    # recovery failed, the rebuilt table could not contain it.
    spark.createDataFrame(
        [(999, 7, 123.5)], "bucket int, n bigint, sum_v double"
    ).write.parquet(backup)
    assert not os.path.exists(target)

    sdf = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", 500)
        .option("batch_size", 500)
        .load()
    )
    agg = sdf.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    stream_upsert_to_parquet(
        agg.select("bucket", "n", F.lit(0.0).alias("sum_v")),
        target,
        str(tmp_path / "ckpt_recover"),
        keys=["bucket"],
    )
    rows = {r.bucket: r.n for r in spark.read.parquet(target).collect()}
    assert rows.get(999) == 7, "parked pre-crash state was lost"
    assert len(rows) == 9  # 8 stream buckets upserted alongside it
    assert not os.path.exists(backup)


def test_writer_commit_sweeps_unclaimed_tmps(spark, tmp_path):
    """A losing/failed attempt's attempt-unique tmp file never appears
    in any commit message; commit must sweep it so stale hidden files
    don't accumulate in the sink directory forever."""
    import os

    register(spark)
    out = str(tmp_path / "sink_sweep")
    os.makedirs(out)
    stale = os.path.join(out, ".part-00042-31337.json.tmp")
    with open(stale, "w") as f:
        f.write('{"half": "written"\n')
    _load(spark, 50, 2).write.format("synthetic_events").option(
        "path", out
    ).mode("append").save()
    files = sorted(os.listdir(out))
    assert not [f for f in files if f.endswith(".tmp")], files
    assert "_SUCCESS" in files


def test_stream_upsert_sweeps_stranded_staged_dirs(spark, tmp_path):
    """ADVICE r6: a crash after merged.write but before the
    park/promote strands a randomly-suffixed <target>__upsert-<hex>
    directory that nothing ever promotes; the next batch's recovery
    preamble must sweep such leftovers so repeated crashes don't
    accumulate full table copies."""
    import os

    from pyspark.sql import functions as F

    from etl_global_mobility_spark.streaming.ops import stream_upsert_to_parquet

    register(spark)
    target = str(tmp_path / "profiles")
    stranded = target + "__upsert-deadbeef"
    spark.createDataFrame(
        [(1, 1, 0.0)], "bucket int, n bigint, sum_v double"
    ).write.parquet(stranded)

    sdf = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", 500)
        .option("batch_size", 500)
        .load()
    )
    agg = sdf.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    stream_upsert_to_parquet(
        agg.select("bucket", "n", F.lit(0.0).alias("sum_v")),
        target,
        str(tmp_path / "ckpt_sweep"),
        keys=["bucket"],
    )
    assert os.path.exists(target)
    leftovers = [
        d for d in os.listdir(tmp_path) if d.startswith("profiles__upsert-")
    ]
    assert not leftovers, leftovers
    assert spark.read.parquet(target).count() == 8
