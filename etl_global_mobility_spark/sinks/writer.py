"""Idempotent selective-overwrite sink.

The reference writes every table with
`format("delta").mode("overwrite").option("replaceWhere", <pred>)`
(notebooks/ETL_Entregas_Base.ipynb:502-507, 639-645, 672-678): re-running
one (country, date-range) replaces exactly those rows, leaving other
countries/partitions untouched.

delta-spark is not on the classpath here, so the engine abstracts the
semantics behind one function:

  * if delta is importable → the native `replaceWhere` writer;
  * else (parquet fallback) → delete-matching + append, scoped to the
    touched date partitions only:
      1. read ONLY the date partitions the predicate covers (partition
         pruning — at 100 TB this touches the re-processed range, never
         the table),
      2. keep rows NOT matching the predicate (the other countries
         sharing those dates),
      3. overwrite those partitions dynamically with keep ∪ new
         (`partitionOverwriteMode=dynamic` leaves all other partitions
         untouched).

The fallback is the standard big-data "partition merge" pattern: cost is
proportional to the replaced date range, not table size, so it scales.
It also fixes the reference defect where bronze `replaceWhere` covers
`pais = ...` but the table is partitioned only by date (NB:505-506) —
here other countries' rows in the same dates genuinely survive.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - delta not in this environment
    from delta.tables import DeltaTable  # noqa: F401

    _HAS_DELTA = True
except Exception:  # noqa: BLE001
    _HAS_DELTA = False


def has_delta() -> bool:
    return _HAS_DELTA


def write_replace_where(
    df: DataFrame,
    path: str,
    partition_col: str,
    predicate: Column,
    partition_values: list | None = None,
) -> None:
    """Write `df` to `path` replacing exactly the rows matching
    `predicate`, preserving everything else.

    partition_values: the distinct `partition_col` values the predicate
    can touch. If None they are computed from `df` (one small job over
    the incoming frame — cheap relative to the write).
    """
    spark = df.sparkSession
    if _HAS_DELTA:  # pragma: no cover
        (
            df.write.format("delta")
            .mode("overwrite")
            .option("replaceWhere", predicate._jc.toString())
            .partitionBy(partition_col)
            .save(path)
        )
        return

    if not _path_exists(spark, path):
        df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
        return

    if partition_values is None:
        partition_values = [
            r[0] for r in df.select(partition_col).distinct().collect()
        ]
    if not partition_values:
        return

    # 1-2: survivors from the touched partitions only (partition-pruned scan)
    existing = (
        spark.read.parquet(path)
        .filter(F.col(partition_col).isin(partition_values))
        .filter(~predicate)
    )
    out = existing.unionByName(df)
    # 3: dynamic overwrite replaces only the touched date partitions.
    # Stage through a temp dir because out reads from `path` itself.
    tmp = path.rstrip("/") + "__staging"
    out.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
    staged = spark.read.parquet(tmp)
    (
        staged.write.mode("overwrite")
        .partitionBy(partition_col)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )
    _rm_tree(tmp)


def _path_exists(spark: SparkSession, path: str) -> bool:
    if "://" not in path:
        return os.path.exists(path)
    jvm = spark.sparkContext._jvm  # pragma: no cover - remote FS
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def _rm_tree(path: str) -> None:
    import shutil

    if "://" not in path:
        shutil.rmtree(path, ignore_errors=True)
