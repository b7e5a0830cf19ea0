"""Custom Python Data Source (Spark 4.x Data Source API).

The reference consumes exactly one source format (a CSV with a fixed
schema, NB:419-429, 477-480). A complete engine also needs the escape
hatch for sources Spark has no built-in reader for — REST feeds,
proprietary binary logs, synthetic generators. Spark 4's Python Data
Source API (`pyspark.sql.datasource`) makes those first-class: the
source declares its schema and partitioning, and Spark plans/schedules
the partition reads like any other scan.

Here: a deterministic synthetic-events generator, the standard tool
for scale-testing a pipeline without 100 TB of input. Every value is
closed-form arithmetic in the global row id, so

* any row is reproducible from (n_rows, n_partitions) alone — no RNG
  state, no seed files;
* the full output is recomputable by an independent SQL engine
  (``range()`` + the same arithmetic), so even the *custom source* is
  oracle-checkable;
* partitions are equal-width id ranges → uniform task sizes at any
  parallelism.

`pushFilters` is deliberately not implemented: the generator is
map-side-trivial, and Spark applies residual filters after the scan.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SCHEMA_DDL = "event_id BIGINT, user_id BIGINT, bucket INT, value DOUBLE"

#: Closed-form row for global id i (mirrored in SQL oracles):
#:   user_id = i % 97          (co-prime with row counts → even spread)
#:   bucket  = i % 8
#:   value   = (i * 31 % 1000) / 8.0   (exact: /8 is a binary scale)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    """Batch reader with real FILTER PUSHDOWN: ``event_id`` range
    predicates tighten the generated id interval BEFORE partition
    planning, so filtered scans plan fewer/smaller partitions instead
    of generating everything and filtering after — the custom-source
    analogue of parquet min/max data skipping.

    CORRECTNESS CONTRACT (PySpark 4.x ``pushFilters``): filters NOT
    yielded back are treated as FULLY HANDLED — Spark does not
    re-evaluate them post-scan. Every consumed branch below must
    therefore enforce its predicate EXACTLY; the lo/hi interval
    arithmetic is exact for these five comparison shapes (that is why
    only they are consumed). Never "loosen" a consumed bound as an
    optimization — that silently returns wrong rows. Unsupported
    filters are yielded back and Spark evaluates them post-scan."""

    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.lo = 0  # inclusive id bound after pushdown
        self.hi = self.n_rows  # exclusive

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if getattr(f, "attribute", None) == ("event_id",):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(f.value))
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
            yield f  # unsupported → Spark evaluates it post-scan

    def partitions(self) -> Sequence[InputPartition]:
        span = max(0, self.hi - self.lo)
        if span == 0:
            return [_RangePartition(self.lo, self.lo)]
        n = min(self.n_partitions, span)
        step = -(-span // n)  # ceil div
        return [
            _RangePartition(lo, min(lo + step, self.hi))
            for lo in range(self.lo, self.hi, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (i, i % 97, i % 8, (i * 31 % 1000) / 8.0)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the source: the same closed-form rows emitted
    in offset-tracked micro-batches. Offsets are plain row positions
    ({"pos": n}), so

    * ``read(start)`` advances by ``batch_size`` rows and never past
      ``n_rows`` (a bounded stream — Trigger.AvailableNow drains it);
    * ``readBetweenOffsets`` re-derives any batch from its offset pair
      alone — the replay contract that gives exactly-once downstream
      (rows are a pure function of position; no side state to lose).
    """

    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 1000))
        self.batch_size = int(options.get("batch_size", 100))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _rows(self, start: int, end: int) -> Iterator[tuple]:
        # a LIST iterator, not a generator: Spark's prefetch cache both
        # advances (next) and copies (copy.copy) the returned iterator —
        # list_iterator supports both, generators neither
        return iter(
            [
                (i, i % 97, i % 8, (i * 31 % 1000) / 8.0)
                for i in range(start, end)
            ]
        )

    def read(self, start: dict):
        pos = start["pos"]
        end = min(pos + self.batch_size, self.n_rows)
        return self._rows(pos, end), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return self._rows(start["pos"], end["pos"])


@dataclass
class _WroteFile(WriterCommitMessage):
    path: str
    n_rows: int
    pid: int


def _sweep_stale_tmps(path: str) -> None:
    """Remove staged files no commit message claimed.

    Attempt-unique tmp names (needed so retried/speculative attempts
    never race on one path) mean a LOSING attempt's file is never
    renamed by commit() nor listed in abort()'s messages — without this
    sweep it would sit in the sink directory forever. Runs after the
    winners have been promoted/removed, so every remaining ``*.tmp``
    is garbage by construction; unlinking one a straggler still holds
    open is safe (the write continues into the unlinked inode).
    """
    import glob

    for stale in glob.glob(os.path.join(path, ".part-*.json.tmp")):
        try:
            os.remove(stale)
        except OSError:
            pass


class JsonDirWriter(DataSourceWriter):
    """Writer half of the Data Source API with the two-phase commit
    contract made visible: each task writes a ``.part-*.json.tmp``
    file and reports it in its commit message; ``commit`` atomically
    renames every reported temp file into place and drops a
    ``_SUCCESS`` manifest; ``abort`` removes the temps. A reader that
    ignores ``*.tmp`` therefore never observes a partial write — the
    same staged-rename idempotency recipe as sinks/writer.py's
    replaceWhere fallback (reference NB:502-507).
    """

    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, it: Iterator) -> _WroteFile:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # Stage under an ATTEMPT-specific name: a retried or speculative
        # attempt of the same task must never write the same path a
        # concurrent attempt holds open. Only the attempt whose message
        # reaches commit() gets renamed to the final name.
        tmp = os.path.join(
            self.path, f".part-{pid:05d}-{ctx.taskAttemptId()}.json.tmp"
        )
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(tmp, "w") as f:
            for row in it:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _WroteFile(path=tmp, n_rows=n, pid=pid)

    def commit(self, messages: Sequence[_WroteFile]) -> None:
        total = 0
        for m in messages:
            final = os.path.join(self.path, f"part-{m.pid:05d}.json")
            os.replace(m.path, final)
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(json.dumps({"n_rows": total}))
        _sweep_stale_tmps(self.path)

    def abort(self, messages: Sequence[_WroteFile]) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
        _sweep_stale_tmps(self.path)


class JsonDirStreamWriter(DataSourceStreamWriter):
    """STREAMING sink half of the Data Source API — completes the
    source/sink matrix (batch read, stream read, batch write, and now
    stream write), with exactly-once spelled out:

    * each micro-batch's tasks stage ``.part-<pid>-<attempt>.json.tmp``
      files (attempt-specific, so a retried/speculative attempt never
      races a concurrent attempt on the same path) and report them in
      commit messages;
    * ``commit(messages, batchId)`` renames them to the DETERMINISTIC
      final names ``part-<batchId>-<pid>.json`` and drops a per-batch
      marker ``_batch-<batchId>._SUCCESS``. Names are a pure function
      of (batchId, partitionId), so a REPLAYED batch (restart between
      sink commit and checkpoint commit — foreachBatch's classic
      double-write window) overwrites its own files byte-identically
      instead of appending duplicates;
    * ``abort`` removes the staged temps — a failed batch leaves
      nothing a marker-respecting reader can see.

    A reader that takes only ``part-*.json`` files whose batch marker
    exists observes each committed batch exactly once.
    """

    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, it: Iterator) -> _WroteFile:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # Attempt-specific staging (see JsonDirWriter.write): concurrent
        # attempts of one task each own a distinct tmp path; commit()
        # renames only the reported winner to the deterministic
        # (batchId, pid) final name.
        tmp = os.path.join(
            self.path, f".part-{pid:05d}-{ctx.taskAttemptId()}.json.tmp"
        )
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(tmp, "w") as f:
            for row in it:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _WroteFile(path=tmp, n_rows=n, pid=pid)

    def commit(self, messages: Sequence[_WroteFile], batchId: int) -> None:
        total = 0
        for m in messages:
            final = os.path.join(
                self.path, f"part-{batchId:05d}-{m.pid:05d}.json"
            )
            os.replace(m.path, final)
            total += m.n_rows
        marker = os.path.join(self.path, f"_batch-{batchId:05d}._SUCCESS")
        with open(marker, "w") as f:
            f.write(json.dumps({"batch_id": batchId, "n_rows": total}))
        _sweep_stale_tmps(self.path)

    def abort(self, messages: Sequence[_WroteFile], batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
        _sweep_stale_tmps(self.path)


class SyntheticEventsSource(DataSource):
    """``spark.read.format("synthetic_events")`` after
    ``spark.dataSource.register(SyntheticEventsSource)`` — batch read,
    streaming read (offset-tracked), two-phase-commit batch write, and
    exactly-once streaming write."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> JsonDirWriter:
        return JsonDirWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> JsonDirStreamWriter:
        return JsonDirStreamWriter(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering is a no-op upsert).
    Enables Python-source filter pushdown — a reader implementing
    ``pushFilters`` hard-fails at plan time if the conf is off."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsSource)
