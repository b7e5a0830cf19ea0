"""Streaming operators over the events table.

Design notes (scale): file-source streams partition per file; watermarks
bound state size (late data beyond the watermark is dropped rather than
accumulating unbounded per-window state); ``availableNow`` gives
replay-deterministic batch-equivalent results, which the tests and the
corpus oracle rely on.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file → one
    micro-batch under availableNow), ``ts`` normalized to TimestampType.

    readStream requires an explicit schema, but the driver has shipped
    two physical layouts for ``ts`` (TIMESTAMP(NANOS) → LONG under the
    legacy conf, vs plain timestamp[us] → TIMESTAMP_NTZ), so probe the
    footer with a batch read (driver-side, footer-only) and mirror
    whatever layout this sf_dir actually has — the normalization logic
    lives in :func:`~etl_global_mobility_spark.corpus.base.load_events`.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = batch.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_window_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts + decimal-exact value sums per
    (window, event_type)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding (overlapping) windows: each event lands in
    window/slide windows (2 here)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n",
        )
    )


def session_window_counts(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows per user: a session closes after `gap` of
    inactivity (stateful, watermark-bounded)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("sess_start"),
            "user_id",
            "n_events",
        )
    )


def streaming_dedup_keys(
    events: DataFrame, keys: list[str], watermark: str = "10 minutes"
) -> DataFrame:
    """Stateful dedup on `keys` within the watermark horizon; emits the
    key columns only, so the result is the distinct key set regardless
    of which physical row was first encountered."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )


def neardup_bucket_owners_stream(
    docs: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_parallelism: int | str | None = "auto",
) -> DataFrame:
    """Streaming near-dup ownership state — the MinHash band bucket as
    the dedup key, the contamination-guard shape a live ingestion
    pipeline needs (``dropDuplicatesWithinWatermark`` only covers
    EXACT keys; near-dups share buckets, not bytes).

    Per micro-batch the banding is map-only (signature + bucket per
    document, no shuffle); the stateful step keeps MIN(id) per
    (band, bucket). Min is order- and batch-split-invariant, so the
    completed stream equals the batch aggregation bit-for-bit no
    matter how documents split into micro-batches — the property the
    oracle checks. State size ∝ distinct buckets (≤ bands × docs),
    the honest cost of remembering what's been seen; RocksDB state
    store carries it at scale.

    Finalize with :func:`neardup_survivors` after the drain.
    """
    from etl_global_mobility_spark.operators.dedup import minhash_band_index
    from etl_global_mobility_spark.operators.parallelism import (
        ensure_stream_compute_parallelism,
    )

    # per-batch compute fan-out: a one-file micro-batch is ONE task,
    # so the md5-per-shingle banding ran single-core per trigger; the
    # batch guard can't introspect a streaming frame, hence the
    # streaming twin (cost: one rebalance of the batch's bytes).
    # ``min_parallelism`` is plumbed through (ADVICE r14): the
    # rebalance is unconditional per trigger, so a deployment whose
    # batches already arrive well-partitioned (maxFilesPerTrigger >
    # cores) passes None to skip the per-trigger shuffle.
    banded = minhash_band_index(
        ensure_stream_compute_parallelism(docs, min_parallelism),
        text_col, id_col, n_hashes, bands, k, min_parallelism=None,
    )
    return banded.groupBy("band", "bucket").agg(F.min("id").alias("owner_id"))


def neardup_survivors(
    owners: DataFrame,
    docs: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Resolve the keep set against drained ownership state: a document
    SURVIVES iff it owns (is the minimum id of) every band bucket it
    occupies — first-arrival-wins near-dup dedup. A later doc sharing
    ≥1 bucket with an earlier one lost that bucket and is dropped.

    Returns ``(doc_id, n_bands, n_owned, kept)``. One map-only banding
    pass over the docs + a join against the bucket-owner state + one
    per-doc aggregation.
    """
    from etl_global_mobility_spark.operators.dedup import minhash_band_index

    banded = minhash_band_index(docs, text_col, id_col, n_hashes, bands, k)
    j = banded.join(owners, ["band", "bucket"])
    return (
        j.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bands"),
            F.sum((F.col("owner_id") == F.col("id")).cast("int"))
            .cast("bigint")
            .alias("n_owned"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_bands",
            "n_owned",
            (F.col("n_owned") == F.col("n_bands")).alias("kept"),
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    max_gap: str = "6 hours",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream INNER interval join: pairs of events
    with the same ``key`` where the right event lands in
    ``[left.ts, left.ts + max_gap]``.

    The watermark plus the explicit time-range condition is what makes
    this feasible at scale: Spark derives a state eviction bound from
    them (a buffered left row can be dropped once the right watermark
    passes ``left.ts + max_gap``), so join state is bounded by the gap
    window instead of growing with the stream. Inner-join matches emit
    as soon as both sides arrive — the completed bounded run equals the
    batch join (the corpus oracle checks exactly that).
    """
    a = left.withWatermark("ts", watermark).select(
        F.col(key).alias("a_key"),
        F.col("ts").alias("a_ts"),
        F.col("event_type").alias("a_type"),
    )
    b = right.withWatermark("ts", watermark).select(
        F.col(key).alias("b_key"),
        F.col("ts").alias("b_ts"),
        F.col("event_type").alias("b_type"),
    )
    return a.join(
        b,
        (F.col("a_key") == F.col("b_key"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {max_gap}")),
        "inner",
    ).select(F.col("a_key").alias("user_id"), "a_ts", "b_ts")


def run_stream_foreach_batch_parquet(
    df: DataFrame, path: str, checkpoint: str
) -> None:
    """foreachBatch sink: append-mode stream → parquet, exactly-once.

    Each micro-batch writes into its own ``_batch_id=N`` partition with
    dynamic partition overwrite, so a batch replayed after a failure
    (foreachBatch is at-least-once) overwrites its own partition instead
    of duplicating rows — the standard idempotent-sink recipe when the
    target isn't transactional (with Delta, ``txnVersion``/``txnAppId``
    does this instead). Restart-safety comes from the checkpoint: a
    finished stream restarted with the same checkpoint reprocesses
    nothing.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(path)
        )

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_upsert_to_parquet(
    df: DataFrame,
    target_path: str,
    checkpoint: str,
    keys: list[str],
) -> None:
    """Streaming MERGE: an update-mode aggregation streamed into a
    keyed parquet target — each micro-batch's changed rows UPSERT into
    the table (operators.merge.upsert: anti-join out superseded
    versions, union the new), committed via staged-swap renames so a
    crash never leaves a HALF-WRITTEN target: the old table is parked
    at a DETERMINISTIC sibling backup path (``<target>__old__``) before
    the staged table is promoted, and every batch begins by restoring
    that backup if a previous swap died between park and promote — so
    every crash point leaves either the old or the new table intact
    AND reachable on restart.

    Idempotency without a transaction log: update-mode emits each
    key's CURRENT aggregate state, and upserting identical rows by key
    is a no-op — a batch replayed after a failure (foreachBatch is
    at-least-once) converges to the same table.

    Scale note: plain parquet has no row-level MERGE, so each batch
    rewrites the whole target — cost ∝ target size per trigger, which
    is fine for bounded keyed state (per-user profiles: rows ∝ keys)
    and wrong for fact tables; the 100 TB fact path is the Delta/
    Iceberg MERGE of sinks/writer.py or the per-batch-partition sink
    above (cost ∝ batch). This operator completes the streaming sink
    matrix with the keyed-state shape.
    """
    import uuid

    from etl_global_mobility_spark.operators.merge import upsert
    from etl_global_mobility_spark.sinks.writer import _fs

    base = target_path.rstrip("/")
    # DETERMINISTIC backup path: recovery must be able to FIND the
    # parked table after a crash. A random suffix would strand the old
    # table at a name nothing looks for, and the next batch's "target
    # missing → merged = batch_df" branch would silently rebuild the
    # table from a single micro-batch.
    backup = f"{base}__old__"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fs = _fs(spark, target_path)
        # Crash recovery BEFORE reading state. The fixed backup name
        # makes the two interrupted-swap shapes distinguishable:
        #   target missing + backup present → died between park and
        #     promote: restore the old table (that swap's staged copy
        #     may be half-written, so it is never promoted here —
        #     at-least-once replay re-derives the merge);
        #   target present + backup present → died between promote and
        #     cleanup: the new table is live, drop the leftover backup.
        if fs.exists(backup):
            if not fs.exists(target_path):
                fs.rename(backup, target_path)
            else:
                fs.delete(backup)
        # Also sweep staged directories stranded by a crash AFTER
        # merged.write but BEFORE the park/promote: their random
        # suffix means nothing ever promotes them, so repeated crashes
        # would accumulate full table copies. Safe to remove — a
        # staged dir is only ever promoted within the same batch that
        # wrote it, and this sink is single-writer (one query per
        # checkpoint), so anything still named __upsert-* here is
        # garbage by construction.
        parent, sep, leaf = base.rpartition("/")
        if sep and fs.exists(parent):
            for entry in fs.listdir(parent):
                if entry.startswith(f"{leaf}__upsert-"):
                    fs.delete(f"{parent}/{entry}")
        if fs.exists(target_path):
            current = spark.read.parquet(target_path)
            merged = upsert(current, batch_df, keys)
        else:
            merged = batch_df
        staged = f"{base}__upsert-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(staged)
        # Swap order matters for crash safety: park the old target at a
        # SIBLING backup path (never inside staged — renaming staged
        # into place must not carry the old data along), promote
        # staged, then drop the backup. A crash after step 1 leaves the
        # backup recoverable at the fixed path the preamble above
        # restores from; after step 2 the new target is already live.
        had_old = fs.exists(target_path)
        if had_old:
            fs.rename(target_path, backup)
        fs.rename(staged, target_path)
        if had_old:
            fs.delete(backup)

    q = (
        df.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime="0 seconds")
        .start()
    )
    drain_until_idle(q)


def drain_until_idle(q, idle_checks: int = 3, timeout_s: float = 120.0) -> None:
    """Stop a pull-per-trigger bounded stream once genuinely drained.

    ``lastProgress`` alone CANNOT detect idleness: it only updates when
    a batch finishes, so "batchId unchanged" is indistinguishable from
    "a slow batch is still running" — stopping on it interrupts the
    in-flight batch mid-write (observed as an InterruptedException
    inside foreachBatch). The engine's own status flags are the safe
    signal: drained = some data has flowed AND ``isDataAvailable`` /
    ``isTriggerActive`` are both false ``idle_checks`` times in a row
    (the run_stream_until_idle recipe, reusable for any sink).
    """
    import time as _time

    t0 = _time.time()
    deadline = t0 + timeout_s
    quiet = 0
    seen_any = False
    while quiet < idle_checks:
        if _time.time() > deadline:  # pragma: no cover - hang guard
            q.stop()
            raise TimeoutError(f"stream not drained in {timeout_s}s")
        p = q.lastProgress
        if p is not None and p["numInputRows"] > 0:
            seen_any = True
        st = q.status
        # a restart on a fully-drained checkpoint never sees data at
        # all — after a 5s grace of continuous idle flags, that counts
        # as drained too (seen_any alone would spin to the timeout)
        settled = seen_any or (_time.time() - t0) > 5.0
        if (
            settled
            and not st["isDataAvailable"]
            and not st["isTriggerActive"]
        ):
            quiet += 1
        else:
            quiet = 0
        _time.sleep(0.1)
    q.stop()
    q.awaitTermination()


def run_stream_to_memory(
    df: DataFrame, output_mode: str = "complete", state_partitions: int | None = 8
) -> DataFrame:
    """Run a (bounded) streaming frame to completion with
    Trigger.AvailableNow into a memory sink; return the final table.

    complete mode re-emits full state at the last batch, so the result
    equals the batch computation — the replay-determinism property the
    corpus oracle checks.

    ``state_partitions`` sizes the state store: each shuffle partition
    of a stateful stream carries its own state-store instance (and, for
    applyInPandasWithState, its own Python worker round per batch), so
    partitions ≫ distinct keys is pure per-batch overhead — measured
    8.7s → 1.8s at sf0.1 going 32 → 8 for 150 keys. At cluster scale
    SIZE IT UP to throughput instead; it is fixed per checkpoint once
    chosen. The conf is set only for this bounded run and restored
    (state partitioning binds at stream start, not plan build).
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    name = f"mem_{uuid.uuid4().hex[:10]}"
    try:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return df.sparkSession.table(name)


def run_stream_until_idle(
    df: DataFrame,
    output_mode: str = "complete",
    state_partitions: int | None = 8,
    idle_batches: int = 2,
    timeout_s: float = 120.0,
) -> DataFrame:
    """Drain a BOUNDED micro-batch stream whose source advances one
    offset-batch per trigger (e.g. a Python Data Source
    SimpleDataSourceStreamReader), then return the memory-sink table.

    Trigger.AvailableNow snapshots the offsets visible at start — for a
    pull-per-trigger source that is a single batch — so instead the
    query runs on a continuous zero-interval trigger and is stopped
    after ``idle_batches`` consecutive empty micro-batches (the bounded
    source has reported "no new rows" repeatedly → drained). The final
    state is deterministic regardless of how the rows split into
    batches; only the batch COUNT is timing-dependent.
    """
    import json as _json
    import time as _time

    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    name = f"mem_{uuid.uuid4().hex[:10]}"
    try:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = _time.time() + timeout_s
        quiet = 0
        seen_any = False
        while quiet < idle_batches:
            if _time.time() > deadline:  # pragma: no cover - hang guard
                q.stop()
                raise TimeoutError(f"stream not drained in {timeout_s}s")
            p = q.lastProgress
            if p is not None and p["numInputRows"] > 0:
                seen_any = True
            st = q.status
            # drained = data has flowed, and the engine reports nothing
            # pending twice in a row (it skips triggers with no new
            # offsets, so empty batches never materialize)
            if (
                seen_any
                and not st["isDataAvailable"]
                and not st["isTriggerActive"]
            ):
                quiet += 1
            else:
                quiet = 0
            _time.sleep(0.1)
        q.stop()
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def ohlc_bars_stream(
    events: DataFrame, window: str = "1 day", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window OHLC bars — the streaming twin of
    corpus.relational.q_ohlc_downsample: open/close are ARG-extrema
    (min_by/max_by on the unique zero-padded (epoch_micros, event_id)
    key, deterministic under timestamp ties), high/low plain extrema,
    count + decimal-exact sum. min_by/max_by are mergeable declarative
    aggregates, so partial state merges across micro-batches exactly
    like batch partial aggregation — the stream≡batch invariant holds
    bit-for-bit and is enforced by the shared SQL oracle. Key and
    aggregate definitions are SHARED with the batch twin
    (operators.temporal.event_order_key / ohlc_aggregates) so the
    invariant rests on one definition, not four synchronized copies."""
    from etl_global_mobility_spark.operators.temporal import ohlc_aggregates

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(*ohlc_aggregates())
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "open_v",
            "high_v",
            "low_v",
            "close_v",
            "n_events",
            "sum_value",
        )
    )
