"""SparkSession factory.

Local testing runs on ``local[N]`` (single JVM); the configuration is
written for a real multi-executor cluster: AQE on (runtime coalesce, skew
join, join-strategy switch), Arrow for any pandas exchange, UTC session
timezone (oracle comparability), and shuffle partitions sized to the
environment rather than Spark's default 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "etl_global_mobility_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    On a real cluster, pass ``master=None`` and let spark-submit decide;
    locally defaults to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = default_parallelism()
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_session_state(
    spark: SparkSession, settle_secs: float = 2.0, drop_sql_cache: bool = True
) -> None:
    """Long-lived-session hygiene: release executor state that
    accumulates across queries in ONE SparkSession (a nightly batch, a
    bench suite, a notebook). Call between queries — never inside a
    timed region.

    **drop_sql_cache=True requires a BARRIER: no query may be in
    flight on any thread.** This is a CORRECTNESS rule, not a
    performance caveat — ``clearCache()`` racing a running AQE query
    can produce a silently EMPTY (wrong) result, not an error.
    Measured in this repo (round 10, tests/test_concurrency.py's
    racing soak caught it live): a query joining against a
    ``.persist()``-ed frame had its cache entry cleared between stage
    materialization and AQE's runtime-stats read; the
    TableCacheQueryStage then reported zero rows and AQE's
    empty-relation propagation rewrote the join to ``EmptyRelation``
    — the executed final plan shows ``EmptyRelation Join LeftOuter``
    over an initial SortMergeJoin on an InMemoryTableScan, and the
    query "succeeds" with 0 rows. Iterative operators that converge
    on a no-change condition (dedup_components, label_propagation)
    then return an empty frame as if converged. From concurrent query
    threads, call with ``drop_sql_cache=False``: the GC→detach→
    cleaner chain only ever releases DEAD objects (an in-flight job
    holds strong JVM references to every RDD it executes, including
    localCheckpointed ones), so it is safe to race; only explicitly
    leaked ``.persist()`` entries then wait for the next barrier
    pass.

    What accumulates, and why Spark doesn't release it on its own:
    lineage-truncating operators (``localCheckpoint``) leave RDD
    blocks in the BlockManager until the DRIVER garbage-collects the
    Python proxy AND the JVM object, at which point the
    ContextCleaner's weak-reference queue finally unpersists them.
    Shuffle files and broadcast blocks follow the same
    weak-ref + GC-trigger lifecycle. Spark's own periodic-GC safety
    net fires every 30 MINUTES (``spark.cleaner.periodicGC.interval``)
    and a 16 GiB driver heap may never trigger a full GC by pressure
    alone — so a multi-query session can sit on gigabytes of dead
    blocks and thousands of dead shuffle files indefinitely.

    The release chain has a py4j step that is easy to miss (measured
    in this repo, round 10): a dead Python ``DataFrame`` proxy does
    NOT detach its JVM object synchronously — py4j's FinalizerWorker
    thread drains detach commands on a ~1 s idle cadence, and until it
    does, the JVM-side gateway binding keeps the whole Dataset →
    LogicalRDD → checkpointed-RDD chain STRONGLY reachable, so a
    ``System.gc()`` fired too early reclaims nothing. Sequence:

    1. ``clearCache()`` — drop SQL-cache entries (CacheManager holds
       strong references; GC alone can never release a cached plan);
       skipped under ``drop_sql_cache=False`` (see the barrier rule
       above);
    2. ``gc.collect()`` — collect dead Python proxies, which ENQUEUES
       their py4j detach commands;
    3. drain the FinalizerWorker deque (bounded by ``settle_secs``);
    4. ``System.gc()`` — now the JVM objects are weakly reachable and
       the ContextCleaner unpersists blocks / removes shuffle files
       (itself async, ~1 s; callers that must OBSERVE the release —
       e.g. the session-lifetime soak test — poll
       ``getRDDStorageInfo`` afterwards).

    Cost: one driver full GC plus up to ``settle_secs`` of drain wait
    — amortize over every N queries, not per query.
    """
    import gc
    import time

    if drop_sql_cache:
        spark.catalog.clearCache()
    gc.collect()

    def _drain_detach_queue() -> None:
        try:
            deque = spark.sparkContext._gateway._gateway_client.finalizer_deque
            deadline = time.time() + settle_secs
            while deque and time.time() < deadline:
                time.sleep(0.05)
            time.sleep(0.1)  # grace for the popped-but-not-yet-sent command
        except AttributeError:
            # plain JavaGateway (PYSPARK_PIN_THREAD=false) detaches
            # synchronously on __del__ — no deque to drain
            pass

    _drain_detach_queue()
    spark.sparkContext._jvm.System.gc()
    # SECOND drain + GC cycle: a detach command that the worker popped
    # after the first System.gc() leaves its Dataset → LogicalRDD →
    # checkpointed-RDD chain strongly reachable through that whole
    # cycle, so the last-released query reliably kept ONE block past
    # the pass (measured round 12: every HEAVY query retained exactly
    # its final checkpoint RDD, 4-550 KB, and one more System.gc()
    # cleared it). Weak-ref release chains routinely need two
    # collections; the extra driver GC costs ~tens of ms on this heap.
    _drain_detach_queue()
    spark.sparkContext._jvm.System.gc()
