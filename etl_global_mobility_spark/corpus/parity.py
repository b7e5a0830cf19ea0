"""§2A parity surface re-expressed over the driver's test tables.

The reference's operator surface (rename projection, filters, casts,
date parse, map-literal lookup, unit conversion/price, rounding,
indicators, the 6-rule quality engine, null-split) is exercised over
``lineitem`` by projecting it into a "delivery-like" frame with
deterministic synthetic NULLs/negatives so every quality rule fires.

Each query reuses the engine's own expression builders
(etl_global_mobility_spark.pipeline.quality) — the corpus tests the
engine, not a re-implementation. Reference citations are in those
builders (notebooks/ETL_Entregas_Base.ipynb:561-633).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_global_mobility_spark.corpus.base import QuerySpec, load_table, spark_round_sql
from etl_global_mobility_spark.pipeline.quality import (
    factor_lookup,
    indicator_pair,
    norm,
    parse_compact_date,
    quality_reasons,
)

FACTORS = {"CS": 20.0, "ST": 1.0}
ROUTINE = ["NO"]  # normalized tipo values treated as routine
BONUS = ["RF"]  # ... and as bonus; everything else → rule 6


def delivery_frame(
    spark: SparkSession,
    sf_dir: str,
    min_parallelism: int | str | None = None,
) -> DataFrame:
    """lineitem → delivery-shaped columns with deterministic nulls:

    - cant NULL when l_orderkey % 101 = 0; shifted by -3 so some ≤ 0
    - mto NULL when l_suppkey % 13 = 0; negated when l_discount ≥ 0.09
    - material NULL when l_partkey % 97 = 0
    - unidad: R→'CS', A→'ST', N→' st '/'zz' (exercises trim/upper/unknown)
    - tipo: returnflag||linestatus ('NO' routine, 'RF' bonus, rest unknown)

    ``min_parallelism`` (default off) rebalances the RAW scan columns
    before any expression work — for the expression-dense consumers
    only: the test tables are single-row-group parquet, so the scan
    (and every expression Catalyst collapses into its task) decodes on
    ONE core however many splits the planner makes. Must stay None for
    consumers whose plan pins scan-filter pushdown (the exchange would
    sit between filter and scan); a no-op at real file counts."""
    from etl_global_mobility_spark.operators.parallelism import (
        ensure_compute_parallelism,
    )

    li = ensure_compute_parallelism(
        load_table(spark, sf_dir, "lineitem"), min_parallelism
    )
    return li.select(
        F.col("l_orderkey").alias("cod_pedido"),
        F.col("l_linenumber").alias("num_linea"),
        # try_cast, not cast: the reference notebook ran on non-ANSI
        # Spark where a DECIMAL(21,2) overflow silently yields NULL and
        # the row flows into the NULL-quarantine rules — under ANSI a
        # plain cast is a job-killing NUMERIC_VALUE_OUT_OF_RANGE on the
        # first hostile magnitude (round-10 adversarial-relational
        # sweep; 1e300 prices). The oracle mirrors with TRY_CAST.
        F.when(F.col("l_orderkey") % 101 == 0, F.lit(None))
        .otherwise((F.col("l_quantity") - 3).try_cast("decimal(21,2)"))
        .alias("cant"),
        F.when(F.col("l_suppkey") % 13 == 0, F.lit(None))
        .when(F.col("l_discount") >= 0.09, (-F.col("l_extendedprice")).try_cast("decimal(21,2)"))
        .otherwise(F.col("l_extendedprice").try_cast("decimal(21,2)"))
        .alias("mto"),
        F.when(F.col("l_partkey") % 97 == 0, F.lit(None))
        .otherwise(F.col("l_partkey").cast("string"))
        .alias("material"),
        F.when(F.col("l_returnflag") == "R", F.lit("CS"))
        .when(F.col("l_returnflag") == "A", F.lit("ST"))
        .when(F.col("l_linenumber") == 1, F.lit("zz"))
        .otherwise(F.lit(" st "))
        .alias("unidad"),
        F.concat(F.col("l_returnflag"), F.col("l_linestatus")).alias("tipo"),
        # compact yyyyMMdd date string with stray whitespace, as the
        # reference's CSV feed delivers dates (NB:482-492)
        F.concat(
            F.lit("  "), F.date_format("l_shipdate", "yyyyMMdd"), F.lit(" ")
        ).alias("fec_txt"),
    )


# Same frame as a DuckDB CTE — the oracle's independent recomputation.
DELIVERY_CTE = """
WITH delivery AS (
  SELECT l_orderkey AS cod_pedido,
         l_linenumber AS num_linea,
         CASE WHEN l_orderkey % 101 = 0 THEN NULL
              ELSE TRY_CAST(l_quantity - 3 AS DECIMAL(21,2)) END AS cant,
         CASE WHEN l_suppkey % 13 = 0 THEN NULL
              WHEN l_discount >= 0.09 THEN TRY_CAST(-l_extendedprice AS DECIMAL(21,2))
              ELSE TRY_CAST(l_extendedprice AS DECIMAL(21,2)) END AS mto,
         CASE WHEN l_partkey % 97 = 0 THEN NULL
              ELSE CAST(l_partkey AS VARCHAR) END AS material,
         CASE WHEN l_returnflag = 'R' THEN 'CS'
              WHEN l_returnflag = 'A' THEN 'ST'
              WHEN l_linenumber = 1 THEN 'zz'
              ELSE ' st ' END AS unidad,
         l_returnflag || l_linestatus AS tipo,
         '  ' || strftime(l_shipdate, '%Y%m%d') || ' ' AS fec_txt
  FROM lineitem
)
"""

# factor lookup as SQL (map-literal semantics: NULL for unknown keys)
FACTOR_SQL = (
    "CASE upper(trim(unidad)) WHEN 'CS' THEN 20.0 WHEN 'ST' THEN 1.0 END"
)

MOTIVO_SQL = f"""NULLIF(concat_ws('|',
      CASE WHEN cant IS NULL THEN 'ERR_CANT_NULL' END,
      CASE WHEN cant IS NOT NULL AND cant <= 0 THEN 'ERR_CANT_NO_POSITIVA' END,
      CASE WHEN material IS NULL THEN 'ERR_SIN_MATERIAL_CONOCIDO' END,
      CASE WHEN ({FACTOR_SQL}) IS NULL THEN 'ERR_UNIDAD_DESCONOCIDA' END,
      CASE WHEN mto IS NOT NULL AND mto <= 0 THEN 'ERR_VENTA_NO_POSITIVA' END,
      CASE WHEN upper(trim(tipo)) NOT IN ('NO','RF') THEN 'ERR_TIPO_ENTREGA_NO_CONSIDERADA' END
    ), '')"""


def _motivo_col() -> F.Column:
    return quality_reasons(
        F.col("cant"),
        F.col("material"),
        factor_lookup("unidad", FACTORS),
        F.col("mto"),
        F.col("tipo"),
        ROUTINE,
        BONUS,
    )


# ----------------------------------------------------------- queries ----
def q_rename_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: projection with col().alias() renames."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("cod_pedido"),
        F.col("l_linenumber").alias("num_linea"),
        F.col("l_returnflag").alias("cod_estado_devolucion"),
        F.col("l_linestatus").alias("cod_estado_linea"),
    )


def q_filter_eq_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: equality + date-range filter adjacent to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= "1994-01-01")
        & (F.col("l_shipdate") <= "1995-12-31")
    ).select("l_orderkey", "l_linenumber", "l_shipdate")


def q_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: normalized membership predicate + negation."""
    d = delivery_frame(spark, sf_dir)
    return d.filter(norm("unidad").isin("CS", "ST") & ~norm("tipo").isin(*ROUTINE, *BONUS)).select(
        "cod_pedido", "num_linea", "unidad", "tipo"
    )


def q_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: decimal casts + string type-erasure of decimal/int."""
    d = delivery_frame(spark, sf_dir)
    return d.select(
        "cod_pedido",
        "num_linea",
        F.col("cant").cast("string").alias("cant_str"),
        F.col("mto").cast("double").alias("mto_dbl"),
        F.col("num_linea").cast("string").alias("linea_str"),
    )


def q_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: whitespace-strip + compact yyyyMMdd parse (round-trip)."""
    o = load_table(spark, sf_dir, "orders")
    compact = F.concat(F.lit("  "), F.date_format("o_orderdate", "yyyyMMdd"), F.lit(" "))
    return o.select(
        "o_orderkey",
        parse_compact_date(compact).alias("fec_parsed"),
    )


def q_map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: map-literal build + element_at lookup (NULL on unknown)."""
    d = delivery_frame(spark, sf_dir)
    return d.select(
        "cod_pedido",
        "num_linea",
        "unidad",
        factor_lookup("unidad", FACTORS).alias("factor"),
    )


def q_unit_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: guarded round(cant*factor, 2) — NULL unless factor∧cant>0."""
    from etl_global_mobility_spark.pipeline.quality import cant_unidades

    d = delivery_frame(spark, sf_dir)
    return d.select(
        "cod_pedido",
        "num_linea",
        cant_unidades(F.col("cant"), factor_lookup("unidad", FACTORS))
        .cast("double")
        .alias("cant_unidades"),
    )


def q_unit_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: guarded round(mto/(cant*factor), 3), decimal(21,3)."""
    from etl_global_mobility_spark.pipeline.quality import precio_unitario_unidades

    d = delivery_frame(spark, sf_dir)
    return d.select(
        "cod_pedido",
        "num_linea",
        precio_unitario_unidades(
            F.col("mto"), F.col("cant"), factor_lookup("unidad", FACTORS)
        )
        .cast("double")
        .alias("precio_unitario"),
    )


def q_rounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: rounding normalization to decimal(21,2)."""
    d = delivery_frame(spark, sf_dir)
    return d.select(
        "cod_pedido",
        "num_linea",
        F.round(F.col("mto"), 2).cast("decimal(21,2)").cast("double").alias("mto_rounded"),
        F.round(F.col("cant"), 2).cast("decimal(21,2)").cast("double").alias("cant_rounded"),
    )


def q_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16: 3-valued boolean indicator pair."""
    d = delivery_frame(spark, sf_dir)
    ind_rut, ind_bon = indicator_pair(F.col("tipo"), ROUTINE, BONUS)
    return d.select(
        "cod_pedido",
        "num_linea",
        ind_rut.alias("ind_rutina"),
        ind_bon.alias("ind_bonificacion"),
    )


def q_derived_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9-A16 in one wide projection — the reference silver layer's full
    derivation block (NB:588-633) as a single query: membership
    indicator (A9), casts/string erasure (A10), compact date parse
    (A11), factor map lookup (A12), unit conversion (A13), unit price
    (A14), rounding normalization (A15), indicator pair (A16).

    One codegen stage over the scan — the point at scale: N derived
    columns cost one pass, not N. The pass is the corpus's most
    expression-dense (regex date parse, decimal try_casts, map
    lookups), so the single-row-group local scan gets the raw-column
    rebalance (measured 2.82 s → 1.23 s at sf0.1 on local[32]; a no-op
    at real file counts — see delivery_frame)."""
    from etl_global_mobility_spark.operators.parallelism import AUTO
    from etl_global_mobility_spark.pipeline.quality import (
        cant_unidades,
        precio_unitario_unidades,
    )

    d = delivery_frame(spark, sf_dir, min_parallelism=AUTO)
    factor = factor_lookup("unidad", FACTORS)
    ind_rut, ind_bon = indicator_pair(F.col("tipo"), ROUTINE, BONUS)
    return d.select(
        "cod_pedido",
        "num_linea",
        norm("unidad").isin("CS", "ST").alias("is_known_unit"),
        F.col("cant").cast("string").alias("cant_str"),
        parse_compact_date(F.col("fec_txt")).alias("fec_parsed"),
        factor.alias("factor"),
        cant_unidades(F.col("cant"), factor).cast("double").alias("cant_unidades"),
        precio_unitario_unidades(F.col("mto"), F.col("cant"), factor)
        .cast("double")
        .alias("precio_unitario"),
        F.round(F.col("mto"), 2).cast("decimal(21,2)").cast("double").alias("mto_rounded"),
        ind_rut.alias("ind_rutina"),
        ind_bon.alias("ind_bonificacion"),
    )


def q_quality_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17: the 6-rule engine, pipe-joined reasons in declaration order."""
    d = delivery_frame(spark, sf_dir)
    return d.select("cod_pedido", "num_linea", _motivo_col().alias("motivo_obs"))


def q_quality_rule_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17 aggregate view: rows per distinct motivo_obs combination."""
    d = delivery_frame(spark, sf_dir)
    return (
        d.select(_motivo_col().alias("motivo_obs"))
        .groupBy("motivo_obs")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_split_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: null-split, clean side (motivo IS NULL, column dropped)."""
    d = delivery_frame(spark, sf_dir)
    return (
        d.withColumn("motivo_obs", _motivo_col())
        .filter(F.col("motivo_obs").isNull())
        .drop("motivo_obs")
        .select("cod_pedido", "num_linea", F.col("mto").cast("double").alias("mto"))
    )


def q_split_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8+A10: quarantine side, business columns type-erased to STRING."""
    d = delivery_frame(spark, sf_dir)
    return (
        d.withColumn("motivo_obs", _motivo_col())
        .filter(F.col("motivo_obs").isNotNull())
        .select(
            F.col("cod_pedido").cast("string").alias("cod_pedido"),
            F.col("num_linea").cast("string").alias("num_linea"),
            F.col("cant").cast("string").alias("cant"),
            F.col("material").cast("string").alias("material"),
            F.col("motivo_obs"),
        )
    )


def q_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: explicit-schema CSV scan — the reference's entry point reads
    the delivery file as CSV with a declared StructType (no
    inferSchema: schema inference is an extra full pass over the data,
    never acceptable at scale; NB:477-480).

    The fixture CSV is round-tripped from ``nation`` into a repo-local
    gitignored tmp dir (bounded: 25 rows/SF-invariant), then read back
    with the explicit schema — exercising the CSV writer AND the
    schema'd reader in one query. The oracle reads the original table,
    so any quoting/parse defect breaks the hash.
    """
    from pyspark.sql import types as T

    from etl_global_mobility_spark.corpus.relational import _scratch_dir

    # per-(sf, process) scratch (round-11 isolation sweep): nation is
    # SF-invariant so a cross-process overwrite race would even write
    # identical bytes — but the reader can still list the deleted-and-
    # rewritten dir mid-swap, so the fixture path must be private
    out = _scratch_dir("csv_nation", sf_dir)
    n = load_table(spark, sf_dir, "nation")
    n.coalesce(1).write.mode("overwrite").option("header", True).csv(out)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    df = spark.read.schema(schema).option("header", True).csv(out)
    return df.select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        F.length("n_name").alias("name_len"),
    )


def q_catalog_table_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A21+A2: executed DDL (CREATE DATABASE / CREATE TABLE) and a
    read-back by table NAME through the catalog — the reference's
    metastore path (``spark.read.table("RDV.data_ventas")``, NB:582;
    DDL NB:275-395), here as an external parquet table."""
    from etl_global_mobility_spark.corpus.relational import _scratch_table

    # per-(sf, process) table name: a fixed one let a concurrent
    # process's DROP race this one's read-by-name (round-11 scratch
    # isolation sweep). External table — DROP never touches the data.
    tbl = _scratch_table(spark, "nation_ext", sf_dir)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(
        f"""CREATE TABLE {tbl}
            USING PARQUET LOCATION '{sf_dir}/nation.parquet'"""
    )
    n = spark.read.table(tbl)
    # Arrays are serialized at the query boundary (array_join) — the
    # driver's pandas canonicalizer cannot hash list-typed cells.
    return n.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("names"),
    )


SPECS = [
    QuerySpec(
        "parity_csv_scan",
        q_csv_scan,
        """SELECT n_nationkey, n_name, n_regionkey,
               CAST(len(n_name) AS INT) AS name_len
            FROM nation""",
        doc="A1: explicit-schema CSV scan (write+read round-trip)",
    ),
    QuerySpec(
        "parity_catalog_table_scan",
        q_catalog_table_scan,
        """SELECT n_regionkey, count(*) AS n_nations,
               array_to_string(list(n_name ORDER BY n_name), ',') AS names
            FROM nation GROUP BY n_regionkey""",
        doc="A21+A2: executed DDL + read-by-table-name catalog round-trip",
    ),
    QuerySpec(
        "parity_rename_project",
        q_rename_project,
        "SELECT l_orderkey AS cod_pedido, l_linenumber AS num_linea, "
        "l_returnflag AS cod_estado_devolucion, l_linestatus AS cod_estado_linea "
        "FROM lineitem",
        doc="A5 rename projection",
    ),
    QuerySpec(
        "parity_filter_eq_range",
        q_filter_eq_range,
        "SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem "
        "WHERE l_returnflag = 'R' AND l_shipdate >= '1994-01-01' "
        "AND l_shipdate <= '1995-12-31'",
        doc="A7 equality + date-range filter",
    ),
    QuerySpec(
        "parity_membership",
        q_membership,
        DELIVERY_CTE
        + "SELECT cod_pedido, num_linea, unidad, tipo FROM delivery "
        "WHERE upper(trim(unidad)) IN ('CS','ST') "
        "AND upper(trim(tipo)) NOT IN ('NO','RF')",
        doc="A9 membership + negation",
    ),
    QuerySpec(
        "parity_casts",
        q_casts,
        DELIVERY_CTE
        + "SELECT cod_pedido, num_linea, CAST(cant AS VARCHAR) AS cant_str, "
        "CAST(mto AS DOUBLE) AS mto_dbl, CAST(num_linea AS VARCHAR) AS linea_str "
        "FROM delivery",
        doc="A10 casts + string erasure",
    ),
    QuerySpec(
        "parity_date_parse",
        q_date_parse,
        "SELECT o_orderkey, CAST(strptime(regexp_replace("
        "'  ' || strftime(o_orderdate, '%Y%m%d') || ' ', '\\s+', '', 'g'), "
        "'%Y%m%d') AS DATE) AS fec_parsed FROM orders",
        doc="A11 compact date parse",
    ),
    QuerySpec(
        "parity_map_lookup",
        q_map_lookup,
        DELIVERY_CTE
        + f"SELECT cod_pedido, num_linea, unidad, {FACTOR_SQL} AS factor FROM delivery",
        doc="A12 map literal + element_at",
    ),
    QuerySpec(
        "parity_unit_conversion",
        q_unit_conversion,
        DELIVERY_CTE
        + f"""SELECT cod_pedido, num_linea,
            CAST(CASE WHEN ({FACTOR_SQL}) IS NOT NULL AND cant IS NOT NULL AND cant > 0
                 THEN TRY_CAST(round(cant * ({FACTOR_SQL}), 2) AS DECIMAL(21,2)) END
                 AS DOUBLE) AS cant_unidades
            FROM delivery""",
        doc="A13 unit conversion",
    ),
    QuerySpec(
        "parity_unit_price",
        q_unit_price,
        DELIVERY_CTE
        + f"""SELECT cod_pedido, num_linea,
            CAST(CASE WHEN ({FACTOR_SQL}) IS NOT NULL AND cant IS NOT NULL AND cant > 0
                      AND mto IS NOT NULL
                 THEN {spark_round_sql("CAST(mto AS DOUBLE) / (CAST(cant AS DOUBLE) * CAST((" + FACTOR_SQL + ") AS DOUBLE))", 3)}
                 END AS DOUBLE) AS precio_unitario
            FROM delivery""",
        doc="A14 unit price",
    ),
    QuerySpec(
        "parity_rounding",
        q_rounding,
        DELIVERY_CTE
        + "SELECT cod_pedido, num_linea, "
        "CAST(TRY_CAST(round(mto, 2) AS DECIMAL(21,2)) AS DOUBLE) AS mto_rounded, "
        "CAST(TRY_CAST(round(cant, 2) AS DECIMAL(21,2)) AS DOUBLE) AS cant_rounded "
        "FROM delivery",
        doc="A15 rounding normalization",
    ),
    QuerySpec(
        "parity_indicators",
        q_indicators,
        DELIVERY_CTE
        + """SELECT cod_pedido, num_linea,
            CASE WHEN upper(trim(tipo)) IN ('NO') THEN true
                 WHEN upper(trim(tipo)) IN ('RF') THEN false END AS ind_rutina,
            CASE WHEN upper(trim(tipo)) IN ('RF') THEN true
                 WHEN upper(trim(tipo)) IN ('NO') THEN false END AS ind_bonificacion
            FROM delivery""",
        doc="A16 indicator pair",
    ),
    QuerySpec(
        "parity_derived_all",
        q_derived_all,
        DELIVERY_CTE
        + f"""SELECT cod_pedido, num_linea,
            upper(trim(unidad)) IN ('CS','ST') AS is_known_unit,
            CAST(cant AS VARCHAR) AS cant_str,
            CAST(strptime(regexp_replace(fec_txt, '\\s+', '', 'g'), '%Y%m%d')
                 AS DATE) AS fec_parsed,
            {FACTOR_SQL} AS factor,
            CAST(CASE WHEN ({FACTOR_SQL}) IS NOT NULL AND cant IS NOT NULL AND cant > 0
                 THEN TRY_CAST(round(cant * ({FACTOR_SQL}), 2) AS DECIMAL(21,2)) END
                 AS DOUBLE) AS cant_unidades,
            CAST(CASE WHEN ({FACTOR_SQL}) IS NOT NULL AND cant IS NOT NULL AND cant > 0
                      AND mto IS NOT NULL
                 THEN {spark_round_sql("CAST(mto AS DOUBLE) / (CAST(cant AS DOUBLE) * CAST((" + FACTOR_SQL + ") AS DOUBLE))", 3)}
                 END AS DOUBLE) AS precio_unitario,
            CAST(TRY_CAST(round(mto, 2) AS DECIMAL(21,2)) AS DOUBLE) AS mto_rounded,
            CASE WHEN upper(trim(tipo)) IN ('NO') THEN true
                 WHEN upper(trim(tipo)) IN ('RF') THEN false END AS ind_rutina,
            CASE WHEN upper(trim(tipo)) IN ('RF') THEN true
                 WHEN upper(trim(tipo)) IN ('NO') THEN false END AS ind_bonificacion
            FROM delivery""",
        doc="A9-A16 combined: the silver layer's full derivation block in one projection",
    ),
    QuerySpec(
        "parity_quality_reasons",
        q_quality_reasons,
        DELIVERY_CTE
        + f"SELECT cod_pedido, num_linea, {MOTIVO_SQL} AS motivo_obs FROM delivery",
        doc="A17 6-rule quality engine",
    ),
    QuerySpec(
        "parity_quality_rule_counts",
        q_quality_rule_counts,
        DELIVERY_CTE
        + f"SELECT {MOTIVO_SQL} AS motivo_obs, count(*) AS n FROM delivery GROUP BY 1",
        doc="A17 rule combination counts",
    ),
    QuerySpec(
        "parity_split_clean",
        q_split_clean,
        DELIVERY_CTE
        + f"SELECT cod_pedido, num_linea, CAST(mto AS DOUBLE) AS mto FROM delivery "
        f"WHERE ({MOTIVO_SQL}) IS NULL",
        doc="A8 null-split clean side",
    ),
    QuerySpec(
        "parity_split_quarantine",
        q_split_quarantine,
        DELIVERY_CTE
        + f"""SELECT CAST(cod_pedido AS VARCHAR) AS cod_pedido,
            CAST(num_linea AS VARCHAR) AS num_linea,
            CAST(cant AS VARCHAR) AS cant,
            CAST(material AS VARCHAR) AS material,
            {MOTIVO_SQL} AS motivo_obs
            FROM delivery WHERE ({MOTIVO_SQL}) IS NOT NULL""",
        doc="A8/A10 quarantine side, string-erased",
    ),
]
