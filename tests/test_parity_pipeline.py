"""Golden end-to-end: full pipeline on the synthetic delivery CSV,
hash-compared against an independent DuckDB recomputation, plus
invariants and idempotency/effect tests (SURVEY §5)."""

from __future__ import annotations

import os

import duckdb
import pytest

from etl_global_mobility_spark.config import load_config
from etl_global_mobility_spark.pipeline.runner import RunPaths, run_all
from tests.fixtures import write_fixture_config, write_fixture_csv

FROZEN_TS = "2025-07-01 00:00:00"

# Independent oracle: recompute the silver layer from the raw CSV in pure
# SQL (DuckDB), mirroring NB:482-677 semantics.
ORACLE_SQL = r"""
WITH raw AS (
  SELECT * FROM read_csv('{csv}', header=true, columns={{
    'pais': 'VARCHAR', 'fecha_proceso': 'VARCHAR', 'transporte': 'VARCHAR',
    'ruta': 'VARCHAR', 'tipo_entrega': 'VARCHAR', 'material': 'VARCHAR',
    'precio': 'DOUBLE', 'cantidad': 'DOUBLE', 'unidad': 'VARCHAR'}})
),
bronze AS (
  SELECT pais,
         TRY_STRPTIME(regexp_replace(fecha_proceso, '\s+', '', 'g'), '%Y%m%d')::DATE AS fecha_proceso,
         transporte, ruta, tipo_entrega, material,
         CAST(precio AS DECIMAL(21,2)) AS precio,
         CAST(cantidad AS DECIMAL(21,2)) AS cantidad,
         unidad
  FROM raw
  WHERE pais = '{country}'
    AND TRY_STRPTIME(regexp_replace(fecha_proceso, '\s+', '', 'g'), '%Y%m%d')::DATE
        BETWEEN DATE '{start}' AND DATE '{end}'
),
derived AS (
  SELECT pais AS cod_pais, fecha_proceso AS fec_proceso,
         transporte AS cod_transporte, ruta AS cod_ruta,
         tipo_entrega AS cod_tipo_entrega, material AS cod_material,
         precio AS mto_venta,
         CASE WHEN upper(trim(unidad)) IN ('CS','ST') AND cantidad IS NOT NULL
                   AND cantidad > 0 AND precio IS NOT NULL
              THEN CAST(round(precio / (cantidad * (CASE upper(trim(unidad)) WHEN 'CS' THEN 20.0 ELSE 1.0 END)), 3) AS DECIMAL(21,3))
         END AS precio_unitario_unidades,
         cantidad AS cant_uni_medida,
         unidad AS cod_uni_medida,
         CASE WHEN upper(trim(unidad)) IN ('CS','ST') AND cantidad IS NOT NULL AND cantidad > 0
              THEN CAST(round(cantidad * (CASE upper(trim(unidad)) WHEN 'CS' THEN 20.0 ELSE 1.0 END), 2) AS DECIMAL(21,2))
         END AS cant_unidades,
         CASE WHEN upper(trim(tipo_entrega)) IN ('ZPRE','ZVE1') THEN true
              WHEN upper(trim(tipo_entrega)) IN ('Z04','Z05') THEN false
         END AS ind_rutina,
         CASE WHEN upper(trim(tipo_entrega)) IN ('Z04','Z05') THEN true
              WHEN upper(trim(tipo_entrega)) IN ('ZPRE','ZVE1') THEN false
         END AS ind_bonificacion,
         '{csv}' AS origen_datos,
         NULLIF(concat_ws('|',
           CASE WHEN cantidad IS NULL THEN 'ERR_CANT_NULL' END,
           CASE WHEN cantidad IS NOT NULL AND cantidad <= 0 THEN 'ERR_CANT_NO_POSITIVA' END,
           CASE WHEN material IS NULL THEN 'ERR_SIN_MATERIAL_CONOCIDO' END,
           CASE WHEN unidad IS NULL OR upper(trim(unidad)) NOT IN ('CS','ST') THEN 'ERR_UNIDAD_DESCONOCIDA' END,
           CASE WHEN precio IS NOT NULL AND precio <= 0 THEN 'ERR_VENTA_NO_POSITIVA' END,
           CASE WHEN upper(trim(tipo_entrega)) NOT IN ('ZPRE','ZVE1','Z04','Z05')
                THEN 'ERR_TIPO_ENTREGA_NO_CONSIDERADA' END
         ), '') AS motivo_obs
  FROM bronze
)
SELECT * FROM derived
"""


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("parity")
    csv_path = str(root / "entregas.csv")
    write_fixture_csv(csv_path, n_rows=2000)
    cfg_path = str(root / "config.yaml")
    write_fixture_config(cfg_path, csv_path, str(root / "export"))
    cfg = load_config(cfg_path)
    paths = RunPaths(
        bronze=str(root / "bronze"),
        depurado=str(root / "depurado"),
        obs=str(root / "obs"),
        output_root=str(root / "export"),
        ledger=str(root / "ledger"),
    )
    results = run_all(spark, cfg, paths, config_path=cfg_path, load_ts=FROZEN_TS)
    return {"root": root, "csv": csv_path, "cfg": cfg, "paths": paths, "results": results}


def _oracle(csv_path: str, country: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW derived AS "
        + ORACLE_SQL.format(csv=csv_path, country=country, start="2025-01-01", end="2025-06-30")
    )
    return con


def test_countries_processed(pipeline_run):
    assert pipeline_run["results"] == {"EC": "DONE", "PE": "DONE", "CO": "SKIPPED"}


def test_depurado_matches_oracle(spark, pipeline_run):
    dep = spark.read.parquet(pipeline_run["paths"].depurado)
    cols = [c for c in dep.columns if c != "fec_actualizacion_registro"]
    got = sorted(
        tuple(str(x) for x in r) for r in dep.select(*sorted(cols)).collect()
    )
    want = []
    for country in ("EC", "PE"):
        con = _oracle(pipeline_run["csv"], country)
        rows = con.execute(
            f"SELECT {', '.join(sorted(cols))} FROM derived WHERE motivo_obs IS NULL"
        ).fetchall()
        want.extend(tuple("None" if x is None else str(x) for x in r) for r in rows)
    want.sort()
    assert len(got) == len(want) and got == want


def test_obs_matches_oracle_counts_and_reasons(spark, pipeline_run):
    obs = spark.read.parquet(pipeline_run["paths"].obs)
    got = {
        (r["motivo_obs"], r["cnt"])
        for r in obs.groupBy("motivo_obs").count().withColumnRenamed("count", "cnt").collect()
    }
    want = set()
    for country in ("EC", "PE"):
        con = _oracle(pipeline_run["csv"], country)
        for reason, cnt in con.execute(
            "SELECT motivo_obs, count(*) FROM derived WHERE motivo_obs IS NOT NULL GROUP BY 1"
        ).fetchall():
            want.add((reason, cnt))
    # merge the two countries' counts
    merged: dict[str, int] = {}
    for reason, cnt in want:
        merged[reason] = merged.get(reason, 0) + cnt
    got_merged: dict[str, int] = {}
    for reason, cnt in got:
        got_merged[reason] = got_merged.get(reason, 0) + cnt
    assert got_merged == merged


def test_union_invariant(spark, pipeline_run):
    """depurado ⊎ obs == filtered bronze input."""
    dep = spark.read.parquet(pipeline_run["paths"].depurado).count()
    obs = spark.read.parquet(pipeline_run["paths"].obs).count()
    bronze = spark.read.parquet(pipeline_run["paths"].bronze)
    n_bronze = bronze.filter(bronze.pais.isin(["EC", "PE"])).count()
    assert dep + obs == n_bronze


def test_out_of_scope_rows_absent(spark, pipeline_run):
    dep = spark.read.parquet(pipeline_run["paths"].depurado)
    assert dep.filter(~dep.cod_pais.isin(["EC", "PE"])).count() == 0
    assert dep.filter(
        (dep.fec_proceso < "2025-01-01") | (dep.fec_proceso > "2025-06-30")
    ).count() == 0


def test_duplicates_not_deduped(spark, pipeline_run):
    """The engine must NOT dedup duplicate business keys (ref doesn't)."""
    bronze = spark.read.parquet(pipeline_run["paths"].bronze)
    total = bronze.count()
    distinct = bronze.distinct().count()
    assert total > distinct  # fixture plants duplicates


def test_export_copy_equals_depurado(spark, pipeline_run):
    dep = spark.read.parquet(pipeline_run["paths"].depurado)
    exp = spark.read.parquet(pipeline_run["paths"].output_root)
    assert dep.count() == exp.count()
    assert dep.exceptAll(exp).count() == 0


@pytest.mark.slow
def test_idempotent_rerun(spark, pipeline_run):
    """Re-running EC with the same params leaves identical table state
    and does not disturb PE (replaceWhere semantics)."""
    paths = pipeline_run["paths"]
    cfg = pipeline_run["cfg"]
    before = sorted(
        tuple(str(x) for x in r) for r in spark.read.parquet(paths.depurado).collect()
    )
    for p in cfg.params:
        p.proccess = "NO" if p.country == "EC" else "YES"
    rerun_paths = RunPaths(  # no ledger: force the re-run despite DONE record
        bronze=paths.bronze,
        depurado=paths.depurado,
        obs=paths.obs,
        output_root=paths.output_root,
    )
    results = run_all(spark, cfg, rerun_paths, load_ts=FROZEN_TS)
    assert results["EC"] == "DONE"
    after = sorted(
        tuple(str(x) for x in r) for r in spark.read.parquet(paths.depurado).collect()
    )
    assert before == after


def test_ledger_records_runs(spark, pipeline_run):
    ledger = spark.read.parquet(pipeline_run["paths"].ledger)
    done = {r.country for r in ledger.filter(ledger.status == "DONE").collect()}
    assert {"EC", "PE"} <= done


def test_compat_config_state_rewrite(tmp_path, pipeline_run):
    """Compat shim rewrites YAML flipping proccess → YES (NB:552-558)."""
    from etl_global_mobility_spark.config import load_config as lc
    from etl_global_mobility_spark.config import mark_country_processed

    cfg_path = str(tmp_path / "c.yaml")
    write_fixture_config(cfg_path, "/tmp/a.csv", "/tmp/b")
    cfg = lc(cfg_path)
    mark_country_processed(cfg, "EC", cfg_path)
    cfg2 = lc(cfg_path)
    assert {p.country: p.proccess for p in cfg2.params}["EC"] == "YES"
    assert {p.country: p.proccess for p in cfg2.params}["PE"] == "NO"


def test_observe_counts_no_second_scan(spark, tmp_path):
    """observe() metrics arrive with the action itself — counts match
    the data without an extra count() job."""
    from etl_global_mobility_spark.logging_utils import observe_counts

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "id long, v string"
    )
    observed, obs = observe_counts(df, "stage_metrics", value_col="v")
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    assert obs.get == {"n_rows": 4, "n_null_v": 2}


def test_streaming_medallion_equals_batch_pipeline(spark, tmp_path):
    """The streaming ingestion mode runs the IDENTICAL bronze→silver→
    split expressions over a CSV file stream: the union of streamed
    micro-batch outputs must equal the batch pipeline row-for-row, and
    a restart on the same checkpoint must add nothing."""
    import csv as _csv
    import os

    from etl_global_mobility_spark.pipeline.bronze import bronze_transform
    from etl_global_mobility_spark.pipeline.quality import (
        silver_transform,
        split_clean_quarantine,
    )
    from etl_global_mobility_spark.schemas import RAW_CSV_SCHEMA
    from etl_global_mobility_spark.streaming.medallion import (
        run_streaming_medallion,
    )
    from fixtures import write_fixture_csv

    raw_dir = str(tmp_path / "raw_stream")
    os.makedirs(raw_dir)
    one_csv = str(tmp_path / "all.csv")
    write_fixture_csv(one_csv)
    # split the fixture into two files (header kept in both) so the
    # stream sees multiple input files
    with open(one_csv, newline="", encoding="utf-8") as f:
        rows = list(_csv.reader(f))
    header, body = rows[0], rows[1:]
    mid = len(body) // 2
    for i, chunk in enumerate((body[:mid], body[mid:])):
        with open(os.path.join(raw_dir, f"f{i}.csv"), "w", newline="", encoding="utf-8") as f:
            w = _csv.writer(f)
            w.writerow(header)
            w.writerows(chunk)

    params = dict(
        country="EC",
        start_date="2025-01-01",
        end_date="2025-06-30",
        unit_factors={"CS": 20.0, "ST": 1.0},
        routine=["ZPRE", "ZVE1"],
        bonus=["Z04", "Z05"],
        origen_datos="stream://fixture",
        load_ts="2025-07-01 00:00:00",
    )
    dep = str(tmp_path / "dep_stream")
    obs = str(tmp_path / "obs_stream")
    ckpt = str(tmp_path / "ckpt_stream")
    run_streaming_medallion(spark, raw_dir, dep, obs, ckpt, **params)

    raw_batch = (
        spark.read.schema(RAW_CSV_SCHEMA).option("header", True).csv(raw_dir)
    )
    derived = silver_transform(
        bronze_transform(
            raw_batch, params["country"], params["start_date"], params["end_date"]
        ),
        params["unit_factors"],
        params["routine"],
        params["bonus"],
        params["origen_datos"],
        params["load_ts"],
    )
    want_clean, want_obs = split_clean_quarantine(derived)

    got_clean = spark.read.parquet(dep).drop("_batch_id")
    got_obs = spark.read.parquet(obs).drop("_batch_id")

    def canon(df):
        return sorted(map(str, df.select(*sorted(df.columns)).collect()))

    assert canon(got_clean) == canon(want_clean)
    assert canon(got_obs) == canon(want_obs)
    assert got_clean.count() > 0 and got_obs.count() > 0

    # restart on the same checkpoint: nothing new to process
    run_streaming_medallion(spark, raw_dir, dep, obs, ckpt, **params)
    assert canon(spark.read.parquet(dep).drop("_batch_id")) == canon(want_clean)
