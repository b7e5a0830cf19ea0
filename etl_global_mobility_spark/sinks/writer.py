"""Idempotent selective-overwrite sink.

The reference writes every table with
`format("delta").mode("overwrite").option("replaceWhere", <pred>)`
(notebooks/ETL_Entregas_Base.ipynb:502-507, 639-645, 672-678): re-running
one (country, date-range) replaces exactly those rows, leaving other
countries/partitions untouched.

delta-spark is not on the classpath here, so the engine abstracts the
semantics behind one function:

  * if delta is importable → the native `replaceWhere` writer, with the
    predicate passed as a SQL string (built by the caller from its
    country/date values, like the reference's f-string — NB:505, 642);
  * else (parquet fallback) → a single-write partition swap, scoped to
    the touched date partitions only:
      1. list the date partitions the predicate covers in the existing
         table (partition-pruned scan — at 100 TB this touches the
         re-processed range, never the table),
      2. survivors = rows in those partitions NOT matching the predicate
         (other countries sharing the dates),
      3. write survivors ∪ new ONCE to a staging dir, then swap the
         touched partition directories into place via paired renames
         (no second data write, no re-read of staging). Each old dir
         is parked inside the staging dir before its replacement is
         renamed in, so a crash mid-swap never loses a partition: old
         data stays recoverable under the staging dir until the swap
         completes, at which point staging (and the parked dirs) are
         deleted.

Cost is one write proportional to the replaced date range. Partitions
whose rows are all replaced by nothing (a corrected re-run producing
zero rows) are deleted, matching Delta replaceWhere semantics. This also
fixes the reference defect where bronze `replaceWhere` covers
`pais = ...` but the table is partitioned only by date (NB:505-506) —
here other countries' rows in the same dates genuinely survive.
"""

from __future__ import annotations

import os
import shutil
import uuid

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
    partition_bounds: tuple | None = None,
    predicate_sql: str | None = None,
) -> None:
    """Write `df` to `path` replacing exactly the rows matching
    `predicate`, preserving everything else.

    predicate_sql: SQL-string form of `predicate` for Delta's
    `replaceWhere` option (a Column can't be rendered reliably —
    `_jc.toString()` drops string-literal quotes and breaks under
    Spark Connect). Callers build it from the same country/date values.

    partition_bounds: (lo, hi) range the predicate constrains
    `partition_col` to. Callers always know it (it IS the re-processed
    date range), so no job over the incoming frame is needed; the
    existing-table scans below are partition-pruned to this range —
    cost ∝ replaced range, never table size.
    """
    spark = df.sparkSession
    if _HAS_DELTA and predicate_sql is not None:  # pragma: no cover
        (
            df.write.format("delta")
            .mode("overwrite")
            .option("replaceWhere", predicate_sql)
            .partitionBy(partition_col)
            .save(path)
        )
        return

    fs = _fs(spark, path)
    if not fs.exists(path):
        df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
        return

    if partition_bounds is not None:
        lo, hi = partition_bounds
        in_range = (F.col(partition_col) >= lo) & (F.col(partition_col) <= hi)
    else:  # degenerate fallback: whole-table rewrite range
        in_range = F.lit(True)
    existing = spark.read.parquet(path).filter(in_range)

    # Dates currently holding rows the predicate replaces — needed so a
    # re-run producing ZERO rows for a date still deletes the stale ones
    # (Delta replaceWhere parity). Pruned scan, bounded by #days.
    matched_dirs = {
        f"{partition_col}={_fmt_partition_value(r[0])}"
        for r in existing.filter(predicate).select(partition_col).distinct().collect()
    }

    # Survivors: rows in the range NOT matching (other countries sharing
    # the dates). One write of survivors ∪ new into staging, then swap
    # partition dirs into place — metadata renames, no second data write.
    out = existing.filter(~predicate).unionByName(df)
    tmp = f"{path.rstrip('/')}__staging-{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
    try:
        staged = {
            name: f"{tmp}/{name}"
            for name in fs.listdir(tmp)
            if name.startswith(f"{partition_col}=")
        }
        # Swap order matters for crash safety: the old partition dir is
        # renamed ASIDE (into the staging dir) before the replacement is
        # renamed in, so at no point does a partition's data exist
        # nowhere — a crash mid-swap leaves the old data recoverable
        # under <staging>/__old__/ and the replacement in <staging>/.
        # The happy path deletes the staging dir (and the parked old
        # dirs with it) once every swap has completed.
        for name in sorted(set(staged) | matched_dirs):
            dst = f"{path.rstrip('/')}/{name}"
            if fs.exists(dst):
                fs.rename(dst, f"{tmp}/__old__{name}")
            if name in staged:
                fs.rename(staged[name], dst)
    finally:
        fs.delete(tmp)


def _fmt_partition_value(v) -> str:
    """Directory-name encoding of a partition value (Spark's format)."""
    return "__HIVE_DEFAULT_PARTITION__" if v is None else str(v)


class _LocalFS:
    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def listdir(self, p: str) -> list[str]:
        return os.listdir(p)

    def size(self, p: str) -> int:
        return os.path.getsize(p)

    def delete(self, p: str) -> None:
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif os.path.exists(p):
            os.remove(p)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def write_text(self, p: str, text: str) -> None:
        with open(p, "w") as f:
            f.write(text)

    def read_text(self, p: str) -> str:
        with open(p) as f:
            return f.read()

    def mkdirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)


class _HadoopFS:  # covered via file:// in tests/test_writer.py
    """Thin wrapper over org.apache.hadoop.fs.FileSystem, so staging
    swap/cleanup works on object stores too (no silent no-op)."""

    def __init__(self, spark: SparkSession, path: str):
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        self._jvm = jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(path).getFileSystem(conf)

    def exists(self, p: str) -> bool:
        return self._fs.exists(self._Path(p))

    def listdir(self, p: str) -> list[str]:
        return [s.getPath().getName() for s in self._fs.listStatus(self._Path(p))]

    def size(self, p: str) -> int:
        return self._fs.getFileStatus(self._Path(p)).getLen()

    def delete(self, p: str) -> None:
        if self.exists(p):
            self._fs.delete(self._Path(p), True)

    def rename(self, src: str, dst: str) -> None:
        self._fs.rename(self._Path(src), self._Path(dst))

    def write_text(self, p: str, text: str) -> None:
        out = self._fs.create(self._Path(p), True)
        try:
            out.write(bytearray(text, "utf-8"))
        finally:
            out.close()

    def read_text(self, p: str) -> str:
        # Drain through Hadoop's own org.apache.hadoop.io.IOUtils
        # (hadoop-common — Spark always ships it) instead of
        # commons-io, which is only a TRANSITIVE dependency and could
        # be shaded/absent; py4j returns the byte[] as a Python
        # bytearray by value, so collect into a JVM-side buffer.
        stream = self._fs.open(self._Path(p))
        out = self._jvm.java.io.ByteArrayOutputStream()
        try:
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, out, 4096, False
            )
            return bytes(out.toByteArray()).decode("utf-8")
        finally:
            stream.close()

    def mkdirs(self, p: str) -> None:
        self._fs.mkdirs(self._Path(p))


def _fs(spark: SparkSession, path: str):
    return _HadoopFS(spark, path) if "://" in path else _LocalFS()
