"""Bucketed table sink: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a fact-fact join (e.g. lineitem ⋈ orders)
is the shuffle of both sides on the join key. Hive-style bucketing pays
that shuffle ONCE at write time: each side is written pre-hashed into
the same number of buckets on the join key, and every later join or
aggregation on that key runs with NO Exchange on either side — Spark's
FileSourceScanExec exposes the bucket spec as its output partitioning,
so SortMergeJoin consumes the scans directly (bucket-pruned too, when
the key is filtered to a literal).

This is the standard Spark answer to "co-locate repeated big joins";
the writer below is a thin, opinionated wrapper:

* buckets are also sort-ordered by the key (``sortBy``) so the
  sort-merge join skips the per-task sort when
  ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``, and
  compaction/min-max stats stay tight either way;
* bucket counts must MATCH on both sides for a shuffle-free join —
  callers pass the same ``n_buckets`` for co-joined tables (Spark can
  also coalesce k·n → n bucket mismatches when
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is set);
* ``saveAsTable`` is required (bucket metadata lives in the
  metastore); plain ``.parquet(path)`` writes silently drop the spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_global_mobility_spark.sinks.writer import _HadoopFS


def _managed_location(spark: SparkSession, table: str) -> str:
    db, _, name = table.rpartition(".")
    base = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    return f"{base}/{db}.db/{name}" if db else f"{base}/{name}"


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) managed table.

    One shuffle on ``bucket_cols`` now; zero shuffles for every later
    join/groupBy on those columns.

    Idempotent across sessions: with an in-memory catalog, a previous
    process can leave the managed table's directory on disk with no
    catalog entry, and ``saveAsTable`` then fails with
    LOCATION_ALREADY_EXISTS — so the table AND any orphaned location
    are removed first.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    loc = _managed_location(spark, table)
    _HadoopFS(spark, loc).delete(loc)
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).bucketBy(n_buckets, *cols)
    if sort:
        w = w.sortBy(*cols)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog scan of a bucketed table (the bucket spec only survives a
    read-by-name; reading the files by path loses it)."""
    return spark.read.table(table)
