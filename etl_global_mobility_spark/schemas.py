"""Explicit schemas for the parity pipeline + DDL emission.

The reference declares every schema by hand and disables inference
(reference: notebooks/ETL_Entregas_Base.ipynb:419-429 CSV schema;
:300-312 bronze DDL; :336-355 silver DDL; :380-395 quarantine DDL).
This module is the single source of truth: the `StructType`s drive both
`spark.read.schema(...)` and generated `CREATE TABLE` DDL.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- raw CSV contract (NB:419-429): 9 columns, header, no inference ------
RAW_CSV_SCHEMA = T.StructType(
    [
        T.StructField("pais", T.StringType(), True),
        T.StructField("fecha_proceso", T.StringType(), True),  # yyyyMMdd text
        T.StructField("transporte", T.StringType(), True),
        T.StructField("ruta", T.StringType(), True),
        T.StructField("tipo_entrega", T.StringType(), True),
        T.StructField("material", T.StringType(), True),
        T.StructField("precio", T.DoubleType(), True),
        T.StructField("cantidad", T.DoubleType(), True),
        T.StructField("unidad", T.StringType(), True),
    ]
)

# --- bronze RDV.data_ventas (NB:300-312) ---------------------------------
# precio/cantidad land as DECIMAL(21,2); fecha_proceso parsed to DATE.
BRONZE_SCHEMA = T.StructType(
    [
        T.StructField("pais", T.StringType(), True),
        T.StructField("fecha_proceso", T.DateType(), True),
        T.StructField("transporte", T.StringType(), True),
        T.StructField("ruta", T.StringType(), True),
        T.StructField("tipo_entrega", T.StringType(), True),
        T.StructField("material", T.StringType(), True),
        T.StructField("precio", T.DecimalType(21, 2), True),
        T.StructField("cantidad", T.DecimalType(21, 2), True),
        T.StructField("unidad", T.StringType(), True),
    ]
)

# --- silver UDV.data_ventas_depurado (NB:336-355) ------------------------
# cod_*/fec_*/mto_*/cant_*/ind_* naming standard (NB:588-598, RM:28).
# fec_actualizacion_registro is a STRING timestamp — the DDL (NB:351) wins
# over the README's DATE claim (SURVEY §1.2).
SILVER_SCHEMA = T.StructType(
    [
        T.StructField("cod_pais", T.StringType(), True),
        T.StructField("fec_proceso", T.DateType(), True),
        T.StructField("cod_transporte", T.StringType(), True),
        T.StructField("cod_ruta", T.StringType(), True),
        T.StructField("cod_tipo_entrega", T.StringType(), True),
        T.StructField("cod_material", T.StringType(), True),
        T.StructField("precio_unitario_unidades", T.DecimalType(21, 3), True),
        T.StructField("mto_venta", T.DecimalType(21, 2), True),
        T.StructField("cant_uni_medida", T.DecimalType(21, 2), True),
        T.StructField("cod_uni_medida", T.StringType(), True),
        T.StructField("cant_unidades", T.DecimalType(21, 2), True),
        T.StructField("ind_rutina", T.BooleanType(), True),
        T.StructField("ind_bonificacion", T.BooleanType(), True),
        T.StructField("origen_datos", T.StringType(), True),
        T.StructField("fec_actualizacion_registro", T.StringType(), True),
    ]
)

# --- quarantine UDV.data_ventas_obs (NB:380-395) --------------------------
# 12-column quarantine shape: the 9 business columns + motivo_obs in
# position 10 + lineage columns, EVERY column type-erased to STRING
# (lossless capture of invalid values). Derived columns
# (precio_unitario_unidades, cant_unidades, ind_*) are excluded per DDL.
OBS_SCHEMA = T.StructType(
    [
        T.StructField(name, T.StringType(), True)
        for name in (
            "cod_pais",
            "fec_proceso",
            "cod_transporte",
            "cod_ruta",
            "cod_tipo_entrega",
            "cod_material",
            "mto_venta",
            "cant_uni_medida",
            "cod_uni_medida",
            "motivo_obs",
            "origen_datos",
            "fec_actualizacion_registro",
        )
    ]
)

# Partition column per table (NB:312, 354, 395): always the process date.
PARTITION_COLS = {
    "rdv.data_ventas": ["fecha_proceso"],
    "udv.data_ventas_depurado": ["fec_proceso"],
    "udv.data_ventas_obs": ["fec_proceso"],  # STRING-typed partition (NB:381,395)
}

TABLE_SCHEMAS = {
    "rdv.data_ventas": BRONZE_SCHEMA,
    "udv.data_ventas_depurado": SILVER_SCHEMA,
    "udv.data_ventas_obs": OBS_SCHEMA,
}

#: Bounded-length column overrides applied at DDL EMISSION only
#: (NB:301 ``pais VARCHAR(2)``, NB:309 ``unidad VARCHAR(2)``).
#: StructTypes keep plain StringType — VarcharType is not a valid
#: runtime read/cast schema in Spark; the catalog DDL is where the
#: length contract lives, and Spark 3.1+ enforces it on write
#: (``spark.sql.legacy.charVarcharAsString`` default false).
DDL_TYPE_OVERRIDES: dict[str, dict[str, str]] = {
    "rdv.data_ventas": {"pais": "VARCHAR(2)", "unidad": "VARCHAR(2)"},
}


def ddl_for(table: str, fmt: str = "parquet", location: str | None = None) -> str:
    """Emit `CREATE TABLE IF NOT EXISTS` DDL from the StructType.

    Mirrors the reference's hand-written DDL (NB:300-312, 336-355,
    380-395) but generated, so schema and DDL can't drift; bounded
    VARCHAR(n) columns come from DDL_TYPE_OVERRIDES.
    """
    schema = TABLE_SCHEMAS[table]
    parts = PARTITION_COLS[table]
    overrides = DDL_TYPE_OVERRIDES.get(table, {})
    cols = ",\n  ".join(
        f"{f.name} {overrides.get(f.name, f.dataType.simpleString().upper())}"
        for f in schema.fields
    )
    loc = f"\nLOCATION '{location}'" if location else ""
    return (
        f"CREATE TABLE IF NOT EXISTS {table} (\n  {cols}\n)\n"
        f"USING {fmt}\nPARTITIONED BY ({', '.join(parts)}){loc}"
    )


def schema_ddl(schema_name: str) -> str:
    """`CREATE SCHEMA IF NOT EXISTS` (NB:275-276)."""
    return f"CREATE SCHEMA IF NOT EXISTS {schema_name}"
