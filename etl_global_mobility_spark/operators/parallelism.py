"""Compute-parallelism guard for CPU-heavy map phases.

Spark sizes file-scan partitions by BYTES (``maxPartitionBytes``), which
is right for I/O-bound relational work but wrong for compute-bound
operators: a 1 MB single-row-group parquet file of 5k documents arrives
as ONE partition, and a minhash/regex/dot-product pass over it runs on
one core while 31 idle (measured: the sf0.1 ``documents`` table is one
row group → the whole MinHash pipeline was single-threaded, 6.5 s vs
3.6 s after fanning out).

``ensure_compute_parallelism`` round-robin-repartitions an input UP to
the cluster's default parallelism — and is an explicit no-op when the
input already has at least that many partitions, which is the normal
state at 100 TB (thousands of file splits ≫ cores). So the guard only
ever fires in the small-input + heavy-compute corner, where the extra
exchange costs a few MB of shuffle and buys a cores-times speedup.

Round-robin (not hash) partitioning on purpose: the goal is balance,
not co-location, and every operator using this guard is
partition-layout-invariant by construction (asserted by tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Sentinel: size the fan-out to ``sparkContext.defaultParallelism``.
AUTO = "auto"

#: Edge count below which an iterative graph operator (connected
#: components, label propagation) runs its single-task fast path —
#: one Arrow-batched job over the coalesced edge list — instead of
#: distributed join+aggregate rounds whose per-round micro-jobs cost
#: more than the whole graph (measured ~4.4 s of round scheduling vs
#: ~0.3 s at sf0.1 on local[32], identical labels). The same bound
#: previously gated only coalesce(1); a pair graph over the bound
#: takes the distributed rounds unchanged, which is the normal state
#: at 100 TB. Module constant (not a parameter) so tests can pin the
#: distributed path by monkeypatching it to 0.
SINGLE_TASK_MAX_EDGES = 100_000

#: Word-table cap below which the unigram-LM trainer runs its EM loop
#: driver-side over the collected (word, freq) table instead of ~6-8
#: distributed E-step jobs (pandas_udf + DECIMAL agg + collect each) —
#: the same scheduling-dominates argument as SINGLE_TASK_MAX_EDGES:
#: the trainer ALREADY collects vocab-scale rows every E-step, and a
#: ``max_words``-capped table is bounded by the CALLER's parameter,
#: not the corpus, so the collect is artifact-scale at any SF. Gated
#: on the parameter (not a count job): callers training beyond the
#: bound keep the distributed E-step unchanged. Module constant so
#: tests can pin either path by monkeypatching.
SINGLE_TASK_MAX_WORDS = 100_000


def ensure_compute_parallelism(
    df: DataFrame, min_parallelism: int | str | None = AUTO
) -> DataFrame:
    """Repartition ``df`` up to ``min_parallelism`` slices if (and only
    if) it currently has fewer. ``None`` disables the guard (used by
    plan tests that pin the at-scale, no-extra-exchange shape);
    :data:`AUTO` targets the session's default parallelism.
    """
    if min_parallelism is None:
        return df
    target = (
        df.sparkSession.sparkContext.defaultParallelism
        if min_parallelism == AUTO
        else int(min_parallelism)
    )
    if target <= 1 or df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def ensure_grouped_compute_parallelism(
    df: DataFrame,
    keys: list[str] | tuple[str, ...],
    min_parallelism: int | str | None = AUTO,
) -> DataFrame:
    """Keyed twin of :func:`ensure_compute_parallelism` for pandas
    grouped/cogrouped transforms: hash-partition ``df`` BY THE GROUP
    KEY into at least ``min_parallelism`` slices before
    ``groupBy(keys).applyInPandas(...)``.

    Why the row guard isn't enough: the grouped transform introduces
    its own ENSURE_REQUIREMENTS shuffle, and AQE coalesces THAT
    shuffle's output by BYTES — but per-group pandas cost scales with
    GROUP COUNT, not bytes, so a few-MB orders table with 15k customer
    groups lands on 2 tasks and serializes 15k Python invocations
    (measured 14 s → 2.5 s at sf0.1 on local[32]). An explicit
    ``repartition(n, keys)`` (REPARTITION_BY_NUM origin) satisfies the
    grouped-map ClusteredDistribution — so it REPLACES the implicit
    shuffle rather than adding one — and AQE never coalesces a
    user-specified partition count.

    ``AUTO`` targets max(defaultParallelism, spark.sql.shuffle
    .partitions): the same count the replaced shuffle would have used
    at scale, so the at-100 TB plan is unchanged; only the
    small-input + many-groups corner gains cores. ``None`` disables
    (plan tests pin the implicit-shuffle shape)."""
    if min_parallelism is None:
        return df
    if min_parallelism == AUTO:
        sess = df.sparkSession
        target = max(
            sess.sparkContext.defaultParallelism,
            int(sess.conf.get("spark.sql.shuffle.partitions", "200")),
        )
    else:
        target = int(min_parallelism)
    if target <= 1:
        return df
    return df.repartition(target, *keys)


def ensure_stream_compute_parallelism(
    df: DataFrame, min_parallelism: int | str | None = AUTO
) -> DataFrame:
    """Streaming twin of :func:`ensure_compute_parallelism` for
    CPU-heavy per-batch map phases: a file-source micro-batch arrives
    with one partition PER FILE (``maxFilesPerTrigger=1`` → every
    batch is a single task), so a compute-bound pass — md5-per-shingle
    banding, CSV parse + quality derivations — runs one core per
    batch while the rest idle (measured: the neardup banding stream
    3.3 s → 2.2 s at sf0.1 on local[32] from this one exchange).

    Unlike the batch guard this cannot be conditional: a streaming
    frame has no ``.rdd`` to introspect, so the repartition is
    unconditional — one rebalance of the BATCH's bytes per trigger,
    the standard recipe for compute-bound micro-batches (cost ∝
    batch, never the corpus). ``None`` disables."""
    if min_parallelism is None:
        return df
    target = (
        df.sparkSession.sparkContext.defaultParallelism
        if min_parallelism == AUTO
        else int(min_parallelism)
    )
    if target <= 1:
        return df
    return df.repartition(target)


def driver_rows_df(spark, rows: list, schema: str) -> DataFrame:
    """DataFrame from a SMALL driver-local row list in ONE partition.

    The dual of the fan-out guard above: ``spark.createDataFrame(rows)``
    slices local data into ``defaultParallelism`` pickle partitions, so
    the artifact-writer idiom ``createDataFrame(rows).coalesce(1)``
    makes its single write task consume 32 python partitions
    SEQUENTIALLY — one python-worker IPC round-trip each (measured on
    local[32]: ~5 s to write 1024 centroid rows vs 0.4 s from one
    slice; the cost scales with CORES, not data, so it silently grows
    with the cluster). One slice from the start is the right shape for
    KB-sized artifact frames — never use this for corpus data.
    """
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
