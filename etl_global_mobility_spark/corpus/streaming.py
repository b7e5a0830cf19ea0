"""Streaming corpus: Structured Streaming queries run to completion
(availableNow) so the final memory-sink table equals the batch answer —
each is oracle-checked against plain SQL over the same events.

These exercise: file-source streaming scan, watermarks, tumbling
windows, session windows, and stateful dedup within the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from etl_global_mobility_spark.corpus.base import (
    QuerySpec,
    load_table,
    spark_round_sql,
)
from etl_global_mobility_spark.corpus.relational import OHLC_AGGS_SQL
from etl_global_mobility_spark.streaming.ops import (
    interval_join_streams,
    ohlc_bars_stream,
    run_stream_to_memory,
    session_window_counts,
    sliding_window_counts,
    stream_events,
    streaming_dedup_keys,
    tumbling_window_counts,
)


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    return run_stream_to_memory(tumbling_window_counts(ev), "complete")


def q_stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLC bars: arg-extrema (min_by/max_by) inside a
    watermarked tumbling window — partial min_by state merges across
    micro-batches exactly like batch partial aggregation, so the
    completed run hash-matches the batch SQL oracle."""
    ev = stream_events(spark, sf_dir)
    return run_stream_to_memory(ohlc_bars_stream(ev), "complete")


def q_stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k per window: the watermarked tumbling aggregation
    runs AS the stream (mergeable state, the expensive part); the
    top-3-per-window rank runs on the completed, bounded result frame
    — ranking is not a mergeable streaming aggregate, so the honest
    shape is stream-the-counts + rank-the-snapshot, exactly what a
    per-trigger foreachBatch reporter does. The rank window partitions
    on win_start (bounded groups), ties break on event_type."""
    from pyspark.sql import Window

    ev = stream_events(spark, sf_dir)
    counts = run_stream_to_memory(tumbling_window_counts(ev), "complete")
    w = Window.partitionBy("win_start").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("win_start", "win_end", "event_type", "n", "rk")
    )


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    return run_stream_to_memory(session_window_counts(ev), "complete")


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    return run_stream_to_memory(sliding_window_counts(ev), "complete")


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    return run_stream_to_memory(
        streaming_dedup_keys(ev, ["user_id", "event_type"]), "append"
    )


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: view events joined to the same
    user's purchase events within 6 hours (two independent file-source
    streams; watermark + range condition bound the join state)."""
    a = stream_events(spark, sf_dir).filter("event_type = 'view'")
    b = stream_events(spark, sf_dir).filter("event_type = 'purchase'")
    return run_stream_to_memory(interval_join_streams(a, b), "append")


def q_stream_stateful_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running profile carried across micro-batches."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.streaming.stateful import user_profile_stream

    ev = stream_events(spark, sf_dir).withColumn("ts_us", F.unix_micros("ts"))
    return run_stream_to_memory(user_profile_stream(ev), "update")


def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join — the standard streaming enrichment pattern
    (and the missing third join shape next to stream-stream and
    batch): each micro-batch of events joins a static dimension
    (customer segment keyed by user id), then aggregates per (segment,
    event_type). The static side is stateless — no watermark, no join
    state; Spark broadcasts it into every micro-batch, so at 100 TB of
    stream this costs one dim broadcast per trigger and nothing grows
    with stream history. Counts + decimal-exact sums → batch-equal."""
    ev = stream_events(spark, sf_dir)
    seg = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    enriched = ev.join(F.broadcast(seg), "user_id")
    agg = enriched.groupBy("segment", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )
    return run_stream_to_memory(agg, "complete")


def q_stream_scd2_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming POINT-IN-TIME enrichment against a versioned (SCD2)
    dimension: each event joins the dim version VALID AT ITS EVENT
    TIME — ``user matches AND vstart <= ts < vend`` — not the current
    version (the classic correctness bug in streaming enrichment:
    joining today's attributes onto last month's events). The versioned
    dim is static per micro-batch (broadcast, stateless, non-equi
    condition allowed for stream-static inner joins); version validity
    uses half-open intervals so no event matches two versions.

    The dim here: every customer flips segment at a fixed boundary
    inside the event window, so both versions provably receive rows.
    """
    boundary = "2024-01-15 00:00:00"
    ev = stream_events(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    v1 = c.select(
        F.col("c_custkey").alias("d_uid"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1900-01-01 00:00:00").cast("timestamp").alias("vstart"),
        F.lit(boundary).cast("timestamp").alias("vend"),
    )
    v2 = c.select(
        F.col("c_custkey").alias("d_uid"),
        F.concat(F.col("c_mktsegment"), F.lit("_V2")).alias("segment"),
        F.lit(boundary).cast("timestamp").alias("vstart"),
        F.lit("2100-01-01 00:00:00").cast("timestamp").alias("vend"),
    )
    dim = v1.unionByName(v2)
    joined = ev.join(
        F.broadcast(dim),
        (ev.user_id == dim.d_uid)
        & (ev.ts >= dim.vstart)
        & (ev.ts < dim.vend),
    )
    agg = joined.groupBy("segment", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )
    return run_stream_to_memory(agg, "complete")


def q_stream_medallion_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming medallion pipeline's stream≡batch invariant as an
    ORACLE row (previously pytest-effect-only): lineitem is projected
    into the reference's raw-CSV shape with deterministic planted
    defects (every quality rule + filter edge fires), landed as CSV
    files, drained through the FULL streaming bronze→silver→split flow
    (streaming/medallion.py — the same `bronze_transform` /
    `silver_transform` / `split_clean_quarantine` expression objects
    the batch pipeline runs), and the committed depurado parquet is
    read back. The DuckDB oracle recomputes the whole pipeline
    independently from lineitem, so any drift in the streaming path —
    CSV schema handling, micro-batch commit, partition overwrite,
    column derivation — breaks the hash.

    Deterministic: injectable `load_ts` clock, literal `origen_datos`,
    whitespace-damaged-but-parseable dates plus unparseable ones
    (dropped by the bronze range filter), case/space unit and
    delivery-type variants.
    """
    import os
    import shutil

    from etl_global_mobility_spark.corpus.relational import _scratch_dir

    # _scratch_dir keys by (query, sf digest, pid) AND prunes dead-pid
    # siblings on the way in — a bare pid-suffixed path under .tmp
    # leaked one checkpoint/landing layout per dead process forever
    # (ADVICE r11)
    base = _scratch_dir("medallion_stream", sf_dir)
    # fresh checkpoint every run: a stale checkpoint would see the
    # re-written raw files as already-processed and emit nothing new
    shutil.rmtree(base, ignore_errors=True)
    raw_dir = os.path.join(base, "raw")
    depurado = os.path.join(base, "depurado")
    obs = os.path.join(base, "obs")
    checkpoint = os.path.join(base, "checkpoint")

    li = load_table(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber")
    raw = li.select(
        F.when(F.col("l_returnflag") == "R", F.lit("EC"))
        .when(F.col("l_returnflag") == "A", F.lit("PE"))
        .otherwise(F.lit("CO"))
        .alias("pais"),
        F.when(F.col("l_orderkey") % 251 == 0, F.lit("notadate"))
        .otherwise(
            F.concat(F.lit("  "), F.date_format("l_shipdate", "yyyyMMdd"), F.lit(" "))
        )
        .alias("fecha_proceso"),
        F.concat(F.lit("TR-"), F.col("l_suppkey").cast("string")).alias("transporte"),
        F.concat(F.lit("R-"), (F.col("l_partkey") % 100).cast("string")).alias("ruta"),
        F.when(ln % 3 == 0, F.lit("ZPRE"))
        .when(ln % 3 == 1, F.lit(" z04 "))
        .otherwise(F.lit("Z99"))
        .alias("tipo_entrega"),
        F.when(F.col("l_partkey") % 97 == 0, F.lit(None))
        .otherwise(F.col("l_partkey").cast("string"))
        .alias("material"),
        F.when(F.col("l_suppkey") % 13 == 0, F.lit(None).cast("double"))
        .when(F.col("l_discount") >= 0.09, -F.col("l_extendedprice"))
        .otherwise(F.col("l_extendedprice"))
        .alias("precio"),
        F.when(F.col("l_orderkey") % 101 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("l_quantity") - 3)
        .alias("cantidad"),
        F.when(ln % 4 == 0, F.lit("CS"))
        .when(ln % 4 == 1, F.lit(" st "))
        .when(ln % 4 == 2, F.lit("zz"))
        .otherwise(F.lit("Cs"))
        .alias("unidad"),
    )
    (
        raw.coalesce(4)
        .write.mode("overwrite")
        .option("header", True)
        # the CSV WRITER trims values by default — the whitespace-
        # damaged dates and ' st ' unit variants must survive verbatim
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(raw_dir)
    )

    from etl_global_mobility_spark.streaming.medallion import (
        run_streaming_medallion,
    )

    run_streaming_medallion(
        spark,
        raw_dir,
        depurado,
        obs,
        checkpoint,
        country="EC",
        start_date="1994-01-01",
        end_date="1996-12-31",
        unit_factors={"CS": 20.0, "ST": 1.0},
        routine=["ZPRE"],
        bonus=["Z04"],
        origen_datos="corpus_stream",
        load_ts="2025-01-01 00:00:00",
    )

    try:
        out = spark.read.parquet(depurado).drop("_batch_id")
    except Exception:
        # no micro-batch ever committed (an EMPTY source is a legal
        # stream state): the contract schema with zero rows, straight
        # from the silver DDL the sink writes (round-10 empty-input
        # sweep — an unguarded read of the never-created directory
        # fails schema inference)
        from etl_global_mobility_spark.schemas import SILVER_SCHEMA

        out = spark.createDataFrame([], SILVER_SCHEMA)
    return out.select(
        "cod_pais",
        "fec_proceso",
        "cod_transporte",
        "cod_ruta",
        "cod_tipo_entrega",
        "cod_material",
        F.col("precio_unitario_unidades").cast("double").alias("precio_unitario_unidades"),
        F.col("mto_venta").cast("double").alias("mto_venta"),
        F.col("cant_uni_medida").cast("double").alias("cant_uni_medida"),
        "cod_uni_medida",
        F.col("cant_unidades").cast("double").alias("cant_unidades"),
        "ind_rutina",
        "ind_bonificacion",
        "origen_datos",
        "fec_actualizacion_registro",
    )


def q_stream_neardup_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming NEAR-dup dedup — the contamination-guard bridge
    between the streaming and dedup surfaces:
    ``dropDuplicatesWithinWatermark`` (stream_dedup_keys) covers exact
    keys only, while live ingestion needs to drop documents that are
    near-copies of anything already seen. The MinHash band bucket is
    the dedup key: documents land as four parquet files and stream in
    one-file micro-batches; each batch bands map-only and a stateful
    aggregation keeps MIN(doc_id) per (band, bucket) — min merges
    across batches order-invariantly, so the drained state equals the
    batch aggregation exactly. Finalize: a document is KEPT iff it
    owns every bucket it occupies (first-arrival-wins). The oracle
    recomputes the whole thing — signatures, buckets, owners,
    survivor rule — in DuckDB from the documents table."""
    import os
    import shutil

    from etl_global_mobility_spark.streaming.ops import (
        neardup_bucket_owners_stream,
        neardup_survivors,
    )

    from etl_global_mobility_spark.corpus.relational import _scratch_dir

    # per-(query, sf, pid) with dead-pid pruning — see q_medallion
    base = _scratch_dir("neardup_stream", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    land = os.path.join(base, "docs")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # any file split works: the min-ownership state is split-invariant
    d.repartition(4).write.mode("overwrite").parquet(land)
    sdf = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(land)
    )
    from etl_global_mobility_spark.streaming.ops import run_stream_to_memory

    owners = run_stream_to_memory(
        neardup_bucket_owners_stream(sdf), "complete"
    )
    return neardup_survivors(owners, d)


def q_stream_ivf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental ANN ingest — the availableNow twin of
    llm_ivf_incremental, mirroring how stream_neardup_dedup twins
    llm_incremental_neardup: the new-vector shard (vec_id % 10 == 0)
    lands as four parquet files and streams in one-file micro-batches;
    the coarse quantizer is resolved once from the EXISTING snapshot,
    persisted via save_ann_artifacts and re-LOADED (the save→load→probe
    loop proven by construction), and the existing corpus is assigned
    to cells ONCE (operators/similarity.py ivf_assign_cells) into a
    parquet cell index PARTITIONED BY CELL. Each micro-batch then
    probes that index via ivf_topk(preassigned=...): the probe side is
    broadcast and joins on the partition column, so dynamic partition
    pruning reads only the probed cells — per-batch cost is bounded by
    the batch and its nprobe cells, never the corpus, and nothing is
    retrained. Stream ≡ batch because each query vector's top-k is
    computed entirely within its own micro-batch against the static
    index; the per-batch parquet commit is the idempotent
    dynamic-overwrite-by-batch-id recipe. Oracle: identical to
    llm_ivf_incremental's (the whole path recomputed in DuckDB)."""
    import os
    import shutil

    from etl_global_mobility_spark.corpus.relational import _scratch_dir
    from etl_global_mobility_spark.operators.similarity import (
        deterministic_seed_centroids,
        ivf_assign_cells,
        ivf_topk,
        load_ann_artifacts,
        save_ann_artifacts,
    )

    base = _scratch_dir("ivf_ingest_stream", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    land = os.path.join(base, "shard")
    sink = os.path.join(base, "topk")
    ckpt = os.path.join(base, "ckpt")
    art = os.path.join(base, "ann_artifact")
    index_path = os.path.join(base, "cell_index")

    e = load_table(spark, sf_dir, "embeddings")
    existing = e.filter(F.col("vec_id") % 10 != 0)
    shard = e.filter(F.col("vec_id") % 10 == 0)
    # deterministic quantizer over the EXISTING snapshot — the SAME
    # helper the batch twin uses, so the shared oracle can't drift
    cents = deterministic_seed_centroids(existing, n_cells=16)
    if not cents:  # empty snapshot: nothing to index or probe
        return ivf_topk(existing, shard, n_cells=16, nprobe=2, k=5)
    save_ann_artifacts(spark, art, centroids=cents)
    centroids, _codebook = load_ann_artifacts(spark, art)
    # one-time corpus cell index, partitioned by cell so per-batch
    # probes prune to their nprobe cells. repartition("cell") first:
    # a straight partitionBy write fans every task across every cell
    # (measured 994 files at sf0.1 — 32 tasks x 16 cells), and the
    # per-batch probes then pay file-listing + tiny-file scans five
    # times over; clustering by cell writes ONE compact file per cell,
    # the layout a real index maintenance job would produce
    ivf_assign_cells(existing, n_cells=16, centroids=centroids).repartition(
        "cell"
    ).write.mode("overwrite").partitionBy("cell").parquet(index_path)
    index = spark.read.parquet(index_path)

    shard.repartition(4).write.mode("overwrite").parquet(land)
    sdf = (
        spark.readStream.schema(shard.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(land)
    )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        out = ivf_topk(
            existing,
            batch_df,
            n_cells=16,
            nprobe=2,
            k=5,
            centroids=centroids,
            preassigned=index,
        )
        (
            out.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(sink)
        )

    q = (
        sdf.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # An EMPTY shard (non-empty snapshot, no vec_id % 10 == 0 rows)
    # lands zero data files, availableNow plans zero micro-batches,
    # foreachBatch never fires, and the sink dir is never created —
    # spark.read would throw PATH_NOT_FOUND where the batch twin
    # returns its empty contract frame. Mirror the empty-centroids
    # early return (r13 advice finding).
    if not os.path.isdir(sink):
        return ivf_topk(existing, shard, n_cells=16, nprobe=2, k=5,
                        centroids=centroids).limit(0)
    # Explicit contract schema: an all-empty ingest (every shard vector
    # degenerate) still CREATES the sink dir — dynamic-overwrite
    # commits zero partitions but writes _SUCCESS — so schema
    # inference would fail exactly when the batch twin returns its
    # empty contract frame (r13 review finding).
    return spark.read.schema(
        "q_id long, rank int, c_id long, score double, _batch_id int"
    ).parquet(sink).select("q_id", "rank", "c_id", "score")


def _stream_ivf_ingest_sql() -> str:
    """The batch twin's oracle verbatim: stream ≡ batch by
    construction (per-query top-k is micro-batch-local against the
    static index), so the DuckDB recomputation is the same."""
    from etl_global_mobility_spark.corpus.llm import _ivf_incremental_sql

    return _ivf_incremental_sql()


def q_stream_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source STREAM (sources/pysource.py): the
    deterministic generator read as offset-tracked micro-batches and
    drained; complete-mode aggregation equals the batch answer —
    values are dyadic rationals (k/8), so the sums are exact under any
    batch split."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.sources.pysource import register
    from etl_global_mobility_spark.streaming.ops import run_stream_until_idle

    register(spark)
    sdf = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", 10_000)
        .option("batch_size", 2_500)
        .load()
    )
    return run_stream_until_idle(
        sdf.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        ),
        "complete",
    )


def q_stream_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift quarantine STREAM — the streaming twin of
    rel_csv_corrupt_records (reference quarantine split, NB:655-667):
    three JSON-lines files arrive as separate micro-batches — one
    conforming, one with TYPE drift (int key serialized as a string:
    the upstream-producer change that silently breaks ingestion), one
    structurally malformed (truncated lines). PERMISSIVE parsing with
    an explicit schema quarantines instead of dying, and the drift
    TRIAGE — ok / type_drift (corrupt record still valid JSON, so the
    drifted payload is recoverable) / malformed — is a complete-mode
    streaming aggregation. At scale this is the always-on guard in
    front of a bronze table: counts per drift kind, key mass of the
    clean rows; schema inference (a full extra scan, and a moving
    target under drift) is never an option."""
    import os

    from pyspark.sql import types as T

    from etl_global_mobility_spark.corpus.relational import _scratch_dir

    out = _scratch_dir("stream_schema_drift", sf_dir)
    os.makedirs(out, exist_ok=True)
    n = (
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
        .collect()  # bounded: 25 rows at any SF
    )
    with open(os.path.join(out, "b1_conforming.json"), "w") as f:
        for r in n:
            f.write(
                f'{{"n_nationkey": {r["n_nationkey"]}, '
                f'"n_name": "{r["n_name"]}"}}\n'
            )
    with open(os.path.join(out, "b2_type_drift.json"), "w") as f:
        for r in n:
            f.write(
                f'{{"n_nationkey": "key-{r["n_nationkey"]}", '
                f'"n_name": "{r["n_name"]}"}}\n'
            )
    with open(os.path.join(out, "b3_malformed.json"), "w") as f:
        for r in n:
            f.write(f'{{"n_nationkey": {r["n_nationkey"]}, "n_name:\n')

    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    triaged = sdf.select(
        F.when(F.col("_corrupt_record").isNull(), F.lit("ok"))
        .when(
            F.get_json_object("_corrupt_record", "$.n_name").isNotNull(),
            F.lit("type_drift"),
        )
        .otherwise(F.lit("malformed"))
        .alias("drift_kind"),
        "n_nationkey",
    )
    agg = triaged.groupBy("drift_kind").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum("n_nationkey").alias("key_sum"),
    )
    return run_stream_to_memory(agg, "complete")


_SCHEMA_DRIFT_SQL = """
    SELECT 'ok' AS drift_kind, CAST(count(*) AS BIGINT) AS n_records,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation
    UNION ALL
    SELECT 'type_drift', CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT)
    FROM nation
    UNION ALL
    SELECT 'malformed', CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT)
    FROM nation
"""


# DuckDB mirror of the full medallion pipeline over lineitem: raw-CSV
# projection → bronze (date parse + country/range filter) → silver
# derivations → clean split. Factor map and quality rules follow the
# proven parity-corpus SQL shapes (corpus/parity.py).
_MED_FACTOR = (
    "CASE upper(trim(cod_uni_medida)) WHEN 'CS' THEN 20.0 WHEN 'ST' THEN 1.0 END"
)
_MED_MOTIVO = f"""NULLIF(concat_ws('|',
      CASE WHEN cant_uni_medida IS NULL THEN 'ERR_CANT_NULL' END,
      CASE WHEN cant_uni_medida IS NOT NULL AND cant_uni_medida <= 0
           THEN 'ERR_CANT_NO_POSITIVA' END,
      CASE WHEN cod_material IS NULL THEN 'ERR_SIN_MATERIAL_CONOCIDO' END,
      CASE WHEN ({_MED_FACTOR}) IS NULL THEN 'ERR_UNIDAD_DESCONOCIDA' END,
      CASE WHEN mto_venta IS NOT NULL AND mto_venta <= 0
           THEN 'ERR_VENTA_NO_POSITIVA' END,
      CASE WHEN upper(trim(cod_tipo_entrega)) NOT IN ('ZPRE','Z04')
           THEN 'ERR_TIPO_ENTREGA_NO_CONSIDERADA' END
    ), '')"""
_MED_PU = spark_round_sql(
    "CAST(mto_venta AS DOUBLE) / (CAST(cant_uni_medida AS DOUBLE) * "
    f"CAST(({_MED_FACTOR}) AS DOUBLE))",
    3,
)
MEDALLION_PARITY_SQL = f"""
WITH raw AS (
  SELECT
    CASE WHEN l_returnflag = 'R' THEN 'EC'
         WHEN l_returnflag = 'A' THEN 'PE' ELSE 'CO' END AS pais,
    CASE WHEN l_orderkey % 251 = 0 THEN 'notadate'
         ELSE '  ' || strftime(l_shipdate, '%Y%m%d') || ' ' END AS fecha_proceso,
    'TR-' || CAST(l_suppkey AS VARCHAR) AS transporte,
    'R-' || CAST(l_partkey % 100 AS VARCHAR) AS ruta,
    CASE WHEN l_linenumber % 3 = 0 THEN 'ZPRE'
         WHEN l_linenumber % 3 = 1 THEN ' z04 ' ELSE 'Z99' END AS tipo_entrega,
    CASE WHEN l_partkey % 97 = 0 THEN NULL
         ELSE CAST(l_partkey AS VARCHAR) END AS material,
    CASE WHEN l_suppkey % 13 = 0 THEN NULL
         WHEN l_discount >= 0.09 THEN -l_extendedprice
         ELSE l_extendedprice END AS precio,
    CASE WHEN l_orderkey % 101 = 0 THEN NULL ELSE l_quantity - 3 END AS cant,
    CASE WHEN l_linenumber % 4 = 0 THEN 'CS'
         WHEN l_linenumber % 4 = 1 THEN ' st '
         WHEN l_linenumber % 4 = 2 THEN 'zz' ELSE 'Cs' END AS unidad
  FROM lineitem
), bronze AS (
  SELECT pais AS cod_pais,
         CAST(try_strptime(regexp_replace(fecha_proceso, '\\s+', '', 'g'),
                           '%Y%m%d') AS DATE) AS fec_proceso,
         transporte AS cod_transporte,
         ruta AS cod_ruta,
         tipo_entrega AS cod_tipo_entrega,
         material AS cod_material,
         CAST(precio AS DECIMAL(21,2)) AS mto_venta,
         CAST(cant AS DECIMAL(21,2)) AS cant_uni_medida,
         unidad AS cod_uni_medida
  FROM raw WHERE pais = 'EC'
), br AS (
  SELECT * FROM bronze
  WHERE fec_proceso >= DATE '1994-01-01' AND fec_proceso <= DATE '1996-12-31'
)
SELECT cod_pais, fec_proceso, cod_transporte, cod_ruta, cod_tipo_entrega,
       cod_material,
       CAST(CASE WHEN ({_MED_FACTOR}) IS NOT NULL AND cant_uni_medida IS NOT NULL
                 AND cant_uni_medida > 0 AND mto_venta IS NOT NULL
            THEN {_MED_PU} END AS DOUBLE) AS precio_unitario_unidades,
       CAST(CAST(round(mto_venta, 2) AS DECIMAL(21,2)) AS DOUBLE) AS mto_venta,
       CAST(CAST(round(cant_uni_medida, 2) AS DECIMAL(21,2)) AS DOUBLE)
         AS cant_uni_medida,
       cod_uni_medida,
       CAST(CASE WHEN ({_MED_FACTOR}) IS NOT NULL AND cant_uni_medida IS NOT NULL
                 AND cant_uni_medida > 0
            THEN CAST(round(cant_uni_medida * ({_MED_FACTOR}), 2) AS DECIMAL(21,2))
            END AS DOUBLE) AS cant_unidades,
       CASE WHEN upper(trim(cod_tipo_entrega)) IN ('ZPRE') THEN true
            WHEN upper(trim(cod_tipo_entrega)) IN ('Z04') THEN false
            END AS ind_rutina,
       CASE WHEN upper(trim(cod_tipo_entrega)) IN ('Z04') THEN true
            WHEN upper(trim(cod_tipo_entrega)) IN ('ZPRE') THEN false
            END AS ind_bonificacion,
       'corpus_stream' AS origen_datos,
       '2025-01-01 00:00:00' AS fec_actualizacion_registro
FROM br WHERE ({_MED_MOTIVO}) IS NULL
"""

def _stream_neardup_sql(n_hashes: int = 16, bands: int = 4, k: int = 3) -> str:
    from etl_global_mobility_spark.corpus.llm import _minhash_banded_cte

    return f"""
    WITH {_minhash_banded_cte(n_hashes, bands, k)}, owners AS (
      SELECT band, bucket, min(id) AS owner_id
      FROM banded GROUP BY band, bucket
    )
    SELECT b.id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_bands,
           CAST(sum(CASE WHEN o.owner_id = b.id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_owned,
           count(*) = sum(CASE WHEN o.owner_id = b.id THEN 1 ELSE 0 END)
             AS kept
    FROM banded b JOIN owners o
      ON b.band = o.band AND b.bucket = o.bucket
    GROUP BY b.id
    """


SPECS = [
    QuerySpec(
        "stream_neardup_dedup",
        q_stream_neardup_dedup,
        _stream_neardup_sql(),
        doc="streaming near-dup dedup: MinHash band bucket as the dedup "
        "key, MIN(id)-per-bucket state merged across micro-batches "
        "(split-invariant ⇒ stream ≡ batch), first-arrival-wins keep "
        "set; oracle recomputes signatures→owners→survivors in SQL",
    ),
    QuerySpec(
        "stream_ivf_ingest",
        q_stream_ivf_ingest,
        _stream_ivf_ingest_sql(),
        doc="streaming incremental ANN ingest: shard micro-batches probe "
        "a persisted cell-partitioned IVF index (assign once, DPP-pruned "
        "per-batch probes; stream ≡ batch) — the availableNow twin of "
        "llm_ivf_incremental",
    ),
    QuerySpec(
        "stream_schema_drift",
        q_stream_schema_drift,
        _SCHEMA_DRIFT_SQL,
        doc="schema-drift quarantine stream: PERMISSIVE JSON micro-"
        "batches triaged ok / type_drift (corrupt record still valid "
        "JSON) / malformed — the streaming twin of "
        "rel_csv_corrupt_records",
    ),
    QuerySpec(
        "stream_static_join",
        q_stream_static_join,
        """SELECT c_mktsegment AS segment, event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
           FROM events JOIN customer ON user_id = c_custkey
           GROUP BY 1, 2""",
        doc="stream-static enrichment join (stateless dim broadcast per "
        "micro-batch) + windowless aggregation, batch-equal",
    ),
    QuerySpec(
        "stream_scd2_enrichment",
        q_stream_scd2_enrichment,
        """WITH dim AS (
             SELECT c_custkey AS d_uid, c_mktsegment AS segment,
                    TIMESTAMP '1900-01-01' AS vstart,
                    TIMESTAMP '2024-01-15' AS vend
             FROM customer
             UNION ALL
             SELECT c_custkey, c_mktsegment || '_V2',
                    TIMESTAMP '2024-01-15', TIMESTAMP '2100-01-01'
             FROM customer
           )
           SELECT segment, event_type, count(*) AS n,
                  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    AS sum_value
           FROM events JOIN dim
             ON user_id = d_uid AND ts >= vstart AND ts < vend
           GROUP BY 1, 2""",
        doc="streaming point-in-time enrichment vs an SCD2 versioned dim "
        "(event joins the version valid at its event time, not the "
        "current one; half-open validity intervals)",
    ),
    QuerySpec(
        "stream_medallion_batch_parity",
        q_stream_medallion_parity,
        MEDALLION_PARITY_SQL,
        doc="stream≡batch invariant of the medallion pipeline as an oracle "
        "row: CSV file-stream → bronze→silver→split → idempotent parquet "
        "commit, read back and hash-matched against an independent "
        "recomputation",
    ),
    QuerySpec(
        "stream_ohlc_bars",
        q_stream_ohlc,
        f"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start,
               CAST(date_trunc('day', ts) + INTERVAL 1 DAY AS TIMESTAMP)
                 AS win_end,
               event_type,
               {OHLC_AGGS_SQL}
            FROM events GROUP BY 1, 2, 3""",
        doc="streaming OHLC bars: mergeable arg-extrema (min_by/max_by) "
        "in a watermarked tumbling window, stream≡batch by oracle",
    ),
    QuerySpec(
        "stream_tumbling_counts",
        q_stream_tumbling,
        """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
               CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS win_end,
               event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2, 3""",
        doc="watermarked tumbling-window streaming aggregation",
    ),
    QuerySpec(
        "stream_windowed_topk",
        q_stream_windowed_topk,
        """WITH c AS (
             SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
                    CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR
                         AS TIMESTAMP) AS win_end,
                    event_type, count(*) AS n,
                    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                      AS sum_value
             FROM events GROUP BY 1, 2, 3
           )
           SELECT win_start, win_end, event_type, n, rk FROM (
             SELECT *, row_number() OVER (PARTITION BY win_start
                        ORDER BY n DESC, event_type) AS rk
             FROM c)
           WHERE rk <= 3""",
        doc="streaming top-k per window: mergeable windowed counts run "
        "as the stream, bounded per-window rank on the snapshot",
    ),
    QuerySpec(
        "stream_session_windows",
        q_stream_session,
        """WITH flagged AS (
             SELECT user_id, ts,
                    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                              >= INTERVAL 5 MINUTE OR
                              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         THEN 1 ELSE 0 END AS new_sess
             FROM events
           ), sessioned AS (
             SELECT user_id, ts,
                    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sess_id
             FROM flagged
           )
           SELECT CAST(min(ts) AS TIMESTAMP) AS sess_start, user_id,
                  count(*) AS n_events
           FROM sessioned GROUP BY user_id, sess_id""",
        doc="session windows (5 min gap) vs SQL sessionization",
    ),
    QuerySpec(
        "stream_sliding_counts",
        q_stream_sliding,
        """WITH starts AS (
             SELECT event_type,
                    unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                            date_trunc('hour', ts)]) AS win_start
             FROM events)
           SELECT CAST(win_start AS TIMESTAMP) AS win_start, event_type,
                  count(*) AS n
           FROM starts GROUP BY 1, 2""",
        doc="sliding 2h/1h windows (each event in 2 windows)",
    ),
    QuerySpec(
        "stream_dedup_keys",
        q_stream_dedup,
        "SELECT DISTINCT user_id, event_type FROM events",
        doc="dropDuplicatesWithinWatermark stateful dedup",
    ),
    QuerySpec(
        "stream_stream_join",
        q_stream_stream_join,
        """SELECT a.user_id,
               CAST(a.ts AS TIMESTAMP) AS a_ts,
               CAST(b.ts AS TIMESTAMP) AS b_ts
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND a.event_type = 'view' AND b.event_type = 'purchase'
             AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR""",
        doc="watermarked stream-stream interval join (state bounded by gap)",
    ),
    QuerySpec(
        "stream_stateful_profile",
        q_stream_stateful_profile,
        """SELECT user_id,
               count(*) AS n_events,
               CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
                 AS total_value_millis,
               min(epoch_ns(ts) // 1000) AS first_us,
               max(epoch_ns(ts) // 1000) AS last_us
            FROM events GROUP BY user_id""",
        doc="custom stateful operator via applyInPandasWithState",
    ),
    QuerySpec(
        "stream_python_source",
        q_stream_python_source,
        """SELECT CAST(i % 8 AS INT) AS bucket,
               count(*) AS n_events,
               sum(CAST((i * 31) % 1000 AS DOUBLE) / 8.0) AS sum_value
           FROM range(10000) t(i) GROUP BY 1""",
        doc="custom Python streaming source (offset-tracked micro-batches, "
        "replayable readBetweenOffsets) drained to its batch answer",
    ),
]
