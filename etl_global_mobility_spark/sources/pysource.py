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

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        step = -(-self.n_rows // self.n_partitions)  # ceil div
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (i, i % 97, i % 8, (i * 31 % 1000) / 8.0)


class SyntheticEventsSource(DataSource):
    """``spark.read.format("synthetic_events")`` after
    ``spark.dataSource.register(SyntheticEventsSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering is a no-op upsert)."""
    spark.dataSource.register(SyntheticEventsSource)
