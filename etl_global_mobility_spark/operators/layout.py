"""Data-layout management: Z-order clustering and small-file compaction.

Two maintenance operators a 100 TB lakehouse needs that no query
operator provides:

* **Z-order clustering** — multi-dimensional data skipping. A table
  range-partitioned and sorted on a Morton (bit-interleaved) key keeps
  rows that are close in EVERY clustered dimension inside the same few
  files, so parquet min/max file statistics prune scans for predicates
  on ANY of the dimensions (a plain sort only helps its leading
  column). The key is built from pure JVM bit arithmetic — shiftright/
  and/shiftleft sums — so it stays inside WholeStageCodegen; the only
  driver-side data is one min/max pair per clustered column.

* **Compaction** — streaming ingestion and fine-grained replaceWhere
  writes accumulate small files; at scale the file-listing and
  per-file open cost dominates scan time. ``compact_partitions``
  rewrites each date-partition directory into ``ceil(bytes/target)``
  files via the same staged-write + parked-rename swap the
  replaceWhere sink uses (crash never loses a partition).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_global_mobility_spark.sinks.writer import _fs


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton key of already-scaled NON-NEGATIVE integer columns: bit b
    of column i lands at position ``b * len(cols) + i``. Pure codegen
    arithmetic — ``bits × len(cols)`` shift/and/or terms, no UDF.

    Callers scale values into ``[0, 2**bits)`` first (see
    :func:`zorder_repartition` for min/max scaling); values outside the
    range would interleave garbage high bits, so they are masked.
    """
    n = len(cols)
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    mask = (1 << bits) - 1
    terms = []
    for i, c in enumerate(cs):
        v = c.cast("long").bitwiseAND(F.lit(mask))
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return sum(terms[1:], terms[0]).alias("zorder_key")


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The identical Morton key as ANSI SQL (DuckDB-compatible), for
    oracle checking: same masking, same bit layout."""
    n = len(cols)
    mask = (1 << bits) - 1
    # every term fully parenthesized: DuckDB/PostgreSQL give |, &, <<
    # equal precedence (left-assoc), so an unparenthesized `a << 1 | b`
    # parses as `(a << 1) | b` but `a | b << 1` as `(a | b) << 1`.
    terms = [
        f"(((({c} & {mask}) >> {b}) & 1) << {b * n + i})"
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    n_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional data skipping: min/max-scale
    each column into ``[0, 2**bits)``, range-partition on the Morton key
    and sort within partitions, so a subsequent parquet write yields
    files whose min/max statistics are tight in EVERY clustered column.

    One bounded aggregate (2 values per column) reaches the driver; the
    clustering itself is a single range shuffle — exactly what a plain
    global sort costs, but skip-effective in all dimensions.
    """
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = float(stats[f"mn_{c}"]), float(stats[f"mx_{c}"])
        span = (mx - mn) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top)
                .cast("long"),
            )
        )
    keyed = df.withColumn("_z", zorder_key(scaled, bits))
    return (
        keyed.repartitionByRange(n_partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_col: str | None = None,
) -> dict[str, tuple[int, int]]:
    """Rewrite each partition directory of a parquet table into
    ``ceil(dir_bytes / target_bytes)`` files (never more files than
    before). Returns {partition_dir: (files_before, files_after)}.

    Only directories whose file count exceeds the target count are
    rewritten — already-compact partitions are untouched, so repeated
    runs are cheap and the cost is proportional to the small-file
    backlog, not the table. Each rewrite stages to a sibling dir and
    swaps with the parked-rename ordering of the replaceWhere sink
    (crash-safe: the old directory survives in staging until the swap
    completes).
    """
    import uuid

    fs = _fs(spark, path)
    if partition_col is not None:
        dirs = [
            d for d in fs.listdir(path) if d.startswith(f"{partition_col}=")
        ]
    else:
        dirs = [d for d in fs.listdir(path) if "=" in d and not d.startswith(("_", "."))]
        if not dirs:
            dirs = [""]  # unpartitioned table: compact the root

    result: dict[str, tuple[int, int]] = {}
    for d in dirs:
        full = f"{path.rstrip('/')}/{d}" if d else path.rstrip("/")
        files = [
            f
            for f in fs.listdir(full)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        if not files:
            continue
        size = sum(fs.size(f"{full}/{f}") for f in files)
        n_target = max(1, math.ceil(size / target_bytes))
        if len(files) <= n_target:
            continue
        staged = f"{full}__compact-{uuid.uuid4().hex[:8]}"
        spark.read.parquet(full).coalesce(n_target).write.mode("overwrite").parquet(staged)
        try:
            fs.rename(full, f"{staged}/__old__")
            fs.rename(staged, full)
        finally:
            fs.delete(f"{full}/__old__")
            fs.delete(f"{full}/_SUCCESS")
        result[d or "."] = (len(files), n_target)
    return result


def export_training_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int = 100_000,
    token_col: str | None = None,
) -> dict:
    """Export a curated dataset as TRAINING SHARDS with a manifest —
    the hand-off point from the Spark pipeline to a training loader.

    Loaders want (a) bounded, similar-sized files they can assign to
    workers, and (b) a manifest saying how many examples/tokens each
    shard holds WITHOUT opening it. ``maxRecordsPerFile`` bounds shard
    size at write (no extra shuffle beyond an even repartition); the
    manifest is then built from one metadata-cheap pass over the
    written files using the hidden ``_metadata.file_name`` column —
    counting rows per physical file costs a scan of just the counted
    columns, never a driver-side collect of row data.

    Writes ``_manifest.json`` next to the shards:
    ``{"n_shards", "n_rows", "total_tokens" (if token_col), "shards":
    {file_name: {"rows", "tokens"?}}}``. Returns the manifest dict.
    Manifest size ∝ shard count — bounded by construction.
    """
    import json
    import math as _math

    spark = df.sparkSession
    n_rows = df.count()
    n_parts = max(1, _math.ceil(n_rows / rows_per_shard))
    (
        df.repartition(n_parts)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_shard)
        .parquet(path)
    )
    cols = [F.col("_metadata.file_name").alias("shard")]
    agg_cols = [F.count(F.lit(1)).alias("rows")]
    read_cols = []
    if token_col is not None:
        read_cols = [token_col]
        # coalesce: a shard whose token_col is entirely NULL must report
        # 0 tokens, not a null that poisons the manifest totals
        agg_cols.append(
            F.coalesce(F.sum(token_col), F.lit(0)).cast("long").alias("tokens")
        )
    written = spark.read.parquet(path).select(*read_cols, *cols)
    per_shard = written.groupBy("shard").agg(*agg_cols).collect()  # bounded:
    # one row per shard file
    shards = {}
    for r in per_shard:
        entry = {"rows": r["rows"]}
        if token_col is not None:
            entry["tokens"] = r["tokens"]
        shards[r["shard"]] = entry
    manifest = {
        "n_shards": len(shards),
        "n_rows": sum(e["rows"] for e in shards.values()),
        "shards": dict(sorted(shards.items())),
    }
    if token_col is not None:
        manifest["total_tokens"] = sum(e["tokens"] for e in shards.values())
    # through the Hadoop FS wrapper (like compact_partitions' swaps) so
    # a remote shard path gets its manifest next to the shards, not on
    # the driver's local disk
    _fs(spark, path).write_text(
        f"{path.rstrip('/')}/_manifest.json",
        json.dumps(manifest, indent=1, sort_keys=True),
    )
    return manifest
