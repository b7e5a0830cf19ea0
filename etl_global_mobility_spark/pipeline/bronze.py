"""Bronze ingest: raw delivery CSV → typed, filtered, date-partitioned table.

Parity with `procesar_pais_rdv` (notebooks/ETL_Entregas_Base.ipynb:474-510):

    CSV scan (explicit schema, header, no inference)     NB:477-480
      → parse fecha_proceso (strip whitespace, yyyyMMdd) NB:484
      → cast precio/cantidad to DECIMAL(21,2)            NB:489-490
      → filter country = X AND date BETWEEN s AND e      NB:496-500
      → idempotent overwrite of (country, range)         NB:502-507

Scale notes: the filter is written directly over the scan so Catalyst
pushes the country equality into the CSV reader and prunes columns; the
date predicate sits above the to_date projection (can't push below a
parse — same as the reference). Output is partitioned by fecha_proceso,
which makes the silver stage's scan partition-pruned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_global_mobility_spark.pipeline.quality import parse_compact_date
from etl_global_mobility_spark.schemas import RAW_CSV_SCHEMA
from etl_global_mobility_spark.sinks.writer import write_replace_where


def read_raw_csv(spark: SparkSession, path: str) -> DataFrame:
    """Explicit-schema CSV scan (NB:477-480; schema NB:419-429)."""
    return (
        spark.read.schema(RAW_CSV_SCHEMA)
        .option("header", True)
        .option("inferSchema", False)
        .csv(path)
    )


def bronze_transform(raw: DataFrame, country: str, start_date: str, end_date: str) -> DataFrame:
    """Typed projection + country/date-range filter (NB:482-500)."""
    typed = raw.select(
        F.col("pais"),
        parse_compact_date("fecha_proceso").alias("fecha_proceso"),
        F.col("transporte"),
        F.col("ruta"),
        F.col("tipo_entrega"),
        F.col("material"),
        F.col("precio").cast("decimal(21,2)").alias("precio"),
        F.col("cantidad").cast("decimal(21,2)").alias("cantidad"),
        F.col("unidad"),
    )
    return typed.filter(
        (F.col("pais") == country)
        & (F.col("fecha_proceso") >= start_date)
        & (F.col("fecha_proceso") <= end_date)
    )


def write_bronze(df: DataFrame, path: str, country: str, start_date: str, end_date: str) -> None:
    """Idempotent (country ∧ date-range) overwrite, partitioned by date
    (NB:502-507). Unlike the reference defect (SURVEY §2A), other
    countries sharing the date range survive a re-run."""
    pred = (
        (F.col("pais") == country)
        & (F.col("fecha_proceso") >= start_date)
        & (F.col("fecha_proceso") <= end_date)
    )
    pred_sql = (
        f"pais = '{country}' AND fecha_proceso >= DATE '{start_date}' "
        f"AND fecha_proceso <= DATE '{end_date}'"
    )  # NB:505 shape
    write_replace_where(df, path, "fecha_proceso", pred,
                        partition_bounds=(start_date, end_date), predicate_sql=pred_sql)


def run_bronze(
    spark: SparkSession,
    raw_csv: str,
    bronze_path: str,
    country: str,
    start_date: str,
    end_date: str,
) -> None:
    raw = read_raw_csv(spark, raw_csv)
    df = bronze_transform(raw, country, start_date, end_date)
    write_bronze(df, bronze_path, country, start_date, end_date)
