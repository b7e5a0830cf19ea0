"""Idempotent table sinks (replaceWhere semantics, parquet fallback)."""

from etl_global_mobility_spark.sinks.writer import write_replace_where  # noqa: F401
