"""Catalog bootstrap: execute the generated DDL and read tables by name.

Parity with the reference's metastore usage: it creates schemas RDV/UDV
and three Delta tables via hand-written DDL (notebooks/
ETL_Entregas_Base.ipynb:275-276, 300-312, 336-355, 380-395) and reads
bronze back by TABLE NAME (``spark.read.table("RDV.data_ventas")``,
NB:582). Here the DDL is generated from the StructTypes
(schemas.ddl_for — schema and DDL cannot drift) and registered as
external parquet tables over the pipeline's paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_global_mobility_spark.schemas import TABLE_SCHEMAS, ddl_for, schema_ddl

# catalog table name → RunPaths attribute holding its storage location
TABLE_PATHS = {
    "rdv.data_ventas": "bronze",
    "udv.data_ventas_depurado": "depurado",
    "udv.data_ventas_obs": "obs",
}


def bootstrap_catalog(spark: SparkSession, locations: dict[str, str]) -> None:
    """Create schemas + external tables (idempotent, IF NOT EXISTS).

    locations: table name → storage path (e.g. from RunPaths).
    """
    for schema in ("rdv", "udv"):
        spark.sql(schema_ddl(schema))
    for table in TABLE_SCHEMAS:
        loc = locations.get(table)
        if loc:
            spark.sql(ddl_for(table, fmt="parquet", location=loc))


def refresh_partitions(spark: SparkSession, table: str) -> None:
    """Register partitions written directly to the table location
    (external parquet tables don't auto-discover new partition dirs)."""
    spark.sql(f"MSCK REPAIR TABLE {table}")


def read_table(spark: SparkSession, table: str, refresh: bool = True) -> DataFrame:
    """Catalog scan by name (NB:582 parity: read.table, not read.parquet)."""
    if refresh:
        refresh_partitions(spark, table)
    return spark.read.table(table)
