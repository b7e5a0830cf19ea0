"""Streaming medallion ingestion: the reference's batch bronze→silver
pipeline re-expressed as ONE Structured Streaming flow.

The reference (notebooks/ETL_Entregas_Base.ipynb:469-683) lands a raw
CSV, types/filters it into bronze, derives silver columns, evaluates
the 6-rule quality engine, and splits clean/quarantine — as a batch
re-run per country. This module runs the SAME column pipeline (the
exact `bronze_transform` + `silver_transform` + `split_clean_quarantine`
expressions — zero semantic drift possible) over a CSV *file stream*:
new files land, micro-batches flow, both outputs commit idempotently.

Exactly-once with two sinks: each micro-batch writes its own
``_batch_id=N`` partition on BOTH outputs with dynamic partition
overwrite (foreachBatch is at-least-once; a replayed batch overwrites
itself — streaming/ops.py:152 recipe), and the checkpoint guarantees a
restarted stream reprocesses nothing. At 100 TB this is continuous
ingestion: cost per trigger ∝ new files, state = none (the pipeline is
stateless row logic), and the quality split shares one micro-batch
scan via persist exactly like the batch silver stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_global_mobility_spark.pipeline.bronze import bronze_transform
from etl_global_mobility_spark.pipeline.quality import (
    silver_transform,
    split_clean_quarantine,
)
from etl_global_mobility_spark.schemas import RAW_CSV_SCHEMA


def run_streaming_medallion(
    spark: SparkSession,
    raw_dir: str,
    depurado_path: str,
    obs_path: str,
    checkpoint: str,
    *,
    country: str,
    start_date: str,
    end_date: str,
    unit_factors: dict[str, float],
    routine: list[str],
    bonus: list[str],
    origen_datos: str,
    load_ts: str | None = None,
) -> None:
    """Drain all currently-available raw CSV files through the full
    bronze→silver→split pipeline into idempotent parquet sinks."""
    raw = (
        spark.readStream.schema(RAW_CSV_SCHEMA)
        .option("header", True)
        .csv(raw_dir)
    )
    bronze = bronze_transform(raw, country, start_date, end_date)
    derived = silver_transform(
        bronze, unit_factors, routine, bonus, origen_datos, load_ts
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            clean, obs = split_clean_quarantine(batch_df)
            for frame, path in ((clean, depurado_path), (obs, obs_path)):
                (
                    frame.withColumn("_batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("_batch_id")
                    .parquet(path)
                )
        finally:
            batch_df.unpersist()

    q = (
        derived.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
