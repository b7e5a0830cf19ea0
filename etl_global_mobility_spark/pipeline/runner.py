"""Multi-country run driver + run ledger.

Parity with the reference driver loop (notebooks/ETL_Entregas_Base.ipynb:
708-723): iterate configured countries, skip ones flagged processed, run
bronze → silver, record completion. Two reference defects are fixed by
default (SURVEY §2A "known defects"):

  * the reference swallows stage exceptions (NB:509-510, 682-683) and
    then unconditionally marks the country processed (NB:721) — here a
    failed country is logged, NOT marked, and (optionally) re-raised;
  * run state lives in a run-ledger parquet table, not by mutating the
    input config file (NB:552-558). `compat_config_state=True` restores
    the reference behavior of rewriting the YAML.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import Row, SparkSession

from etl_global_mobility_spark.config import EngineConfig, mark_country_processed
from etl_global_mobility_spark.logging_utils import build_logger, close_logger
from etl_global_mobility_spark.pipeline.bronze import run_bronze
from etl_global_mobility_spark.pipeline.silver import run_silver


@dataclass
class RunPaths:
    bronze: str
    depurado: str
    obs: str
    output_root: str | None = None
    ledger: str | None = None


def _ledger_done(spark: SparkSession, ledger: str | None, country: str) -> bool:
    if not ledger or not os.path.exists(ledger):
        return False
    df = spark.read.parquet(ledger)
    return df.filter((df.country == country) & (df.status == "DONE")).limit(1).count() > 0


def _ledger_append(spark: SparkSession, ledger: str | None, country: str, status: str) -> None:
    if not ledger:
        return
    row = Row(country=country, status=status, ts=time.strftime("%Y-%m-%d %H:%M:%S"))
    spark.createDataFrame([row]).write.mode("append").parquet(ledger)


def run_all(
    spark: SparkSession,
    cfg: EngineConfig,
    paths: RunPaths,
    config_path: str | None = None,
    compat_config_state: bool = False,
    raise_on_error: bool = True,
    load_ts: str | None = None,
    log_dir: str | None = None,
) -> dict[str, str]:
    """Process every configured country; returns {country: status}."""
    logger = build_logger(log_dir)
    results: dict[str, str] = {}
    try:
        for p in cfg.params:
            if p.proccess == "YES" or _ledger_done(spark, paths.ledger, p.country):
                logger.info("skipping %s: already processed", p.country)
                results[p.country] = "SKIPPED"
                continue
            try:
                logger.info("bronze start %s %s..%s", p.country, p.start_date, p.end_date)
                run_bronze(spark, cfg.raw_csv, paths.bronze, p.country, p.start_date, p.end_date)
                logger.info("silver start %s", p.country)
                run_silver(
                    spark,
                    paths.bronze,
                    paths.depurado,
                    paths.obs,
                    paths.output_root,
                    p.country,
                    p.start_date,
                    p.end_date,
                    cfg.unit_factors,
                    cfg.routine,
                    cfg.bonus,
                    origen_datos=cfg.raw_csv,
                    load_ts=load_ts,
                )
                _ledger_append(spark, paths.ledger, p.country, "DONE")
                if compat_config_state and config_path:
                    mark_country_processed(cfg, p.country, config_path)
                results[p.country] = "DONE"
                logger.info("done %s", p.country)
            except Exception as exc:  # noqa: BLE001
                logger.error("country %s failed: %s", p.country, exc)
                _ledger_append(spark, paths.ledger, p.country, "FAILED")
                results[p.country] = "FAILED"
                if raise_on_error:
                    raise
    finally:
        close_logger(logger)
    return results
