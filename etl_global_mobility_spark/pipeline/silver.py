"""Silver stage: bronze → depurado (clean) + obs (quarantine) + path copy.

Parity with `procesar_pais_udv` (notebooks/ETL_Entregas_Base.ipynb:580-683)
with the documented defect fixed: the reference fans out one derived frame
into THREE write actions with no cache (NB:639, 647, 672), recomputing the
whole plan (and re-evaluating current_timestamp) per action. This engine
persists the derived frame once, so the fan-out costs one scan and all
sinks see identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from etl_global_mobility_spark.pipeline.quality import (
    silver_transform,
    split_clean_quarantine,
)
from etl_global_mobility_spark.sinks.writer import write_replace_where


def read_bronze(spark: SparkSession, bronze_path: str, country: str, start_date: str, end_date: str) -> DataFrame:
    """Bronze scan + country/date filter (NB:582-586). The date filter
    lands on the partition column → partition-pruned scan."""
    return spark.read.parquet(bronze_path).filter(
        (F.col("pais") == country)
        & (F.col("fecha_proceso") >= start_date)
        & (F.col("fecha_proceso") <= end_date)
    )


def run_silver(
    spark: SparkSession,
    bronze_path: str,
    depurado_path: str,
    obs_path: str,
    output_root: str | None,
    country: str,
    start_date: str,
    end_date: str,
    unit_factors: dict[str, float],
    routine: list[str],
    bonus: list[str],
    origen_datos: str,
    load_ts: str | None = None,
) -> None:
    bronze = read_bronze(spark, bronze_path, country, start_date, end_date)
    derived = silver_transform(bronze, unit_factors, routine, bonus, origen_datos, load_ts)
    # One materialization feeds all three sinks (fixes NB:639/647/672 defect).
    derived = derived.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        clean, obs = split_clean_quarantine(derived)

        clean_pred = (
            (F.col("cod_pais") == country)
            & (F.col("fec_proceso") >= start_date)
            & (F.col("fec_proceso") <= end_date)
        )
        clean_sql = (
            f"cod_pais = '{country}' AND fec_proceso >= DATE '{start_date}' "
            f"AND fec_proceso <= DATE '{end_date}'"
        )  # NB:642 shape
        write_replace_where(
            clean, depurado_path, "fec_proceso", clean_pred,
            partition_bounds=(start_date, end_date), predicate_sql=clean_sql
        )  # NB:639-645
        if output_root:  # path copy of depurado (NB:647-653, RM:174)
            write_replace_where(
                clean, output_root, "fec_proceso", clean_pred,
                partition_bounds=(start_date, end_date), predicate_sql=clean_sql
            )

        # obs is all-STRING; its date predicate compares stringified dates
        # lexicographically — valid because the format is yyyy-MM-dd (NB:675).
        obs_pred = (
            (F.col("cod_pais") == country)
            & (F.col("fec_proceso") >= start_date)
            & (F.col("fec_proceso") <= end_date)
        )
        obs_sql = (
            f"cod_pais = '{country}' AND fec_proceso >= '{start_date}' "
            f"AND fec_proceso <= '{end_date}'"
        )  # NB:675: stringified-date comparison
        write_replace_where(
            obs, obs_path, "fec_proceso", obs_pred,
            partition_bounds=(start_date, end_date), predicate_sql=obs_sql
        )  # NB:672-678
    finally:
        derived.unpersist()
