"""Silver-layer derivation expressions + the 6-rule quality engine.

Pure expression builders (no I/O): each function returns `Column`s, so the
same logic is unit-testable on hand-built rows and composes into the
pipeline. Semantics follow the reference bit-for-bit (SURVEY §2A "fine
print"); citations are raw lines of
notebooks/ETL_Entregas_Base.ipynb (NB:...).

Rule order IS part of the contract: motivo_obs concatenates fired rules
in declaration order with '|' (NB:566-577, 632).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Silver rename map, bronze → cod_*/fec_* standard (NB:588-598; RM:28).
RENAME_MAP = {
    "pais": "cod_pais",
    "fecha_proceso": "fec_proceso",
    "transporte": "cod_transporte",
    "ruta": "cod_ruta",
    "tipo_entrega": "cod_tipo_entrega",
    "material": "cod_material",
    "precio": "mto_venta",
    "cantidad": "cant_uni_medida",
    "unidad": "cod_uni_medida",
}

# Fixed rule order (NB:566-577). Each entry: (reason literal, predicate builder).
RULE_ORDER = [
    "ERR_CANT_NULL",
    "ERR_CANT_NO_POSITIVA",
    "ERR_SIN_MATERIAL_CONOCIDO",
    "ERR_UNIDAD_DESCONOCIDA",
    "ERR_VENTA_NO_POSITIVA",
    "ERR_TIPO_ENTREGA_NO_CONSIDERADA",
]


def norm(c: str | Column) -> Column:
    """upper(trim(col)) — normalization applied before every code
    comparison, on the data side (NB:563, 575, 624-629)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.upper(F.trim(col))


def parse_compact_date(c: str | Column) -> Column:
    """Strip ALL whitespace then parse yyyyMMdd (NB:484). Unparseable
    values yield NULL (the reference ran pre-ANSI Spark where to_date
    returns NULL on bad input; under Spark 4 ANSI mode that behavior is
    spelled try_to_date)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.try_to_date(F.regexp_replace(col, r"\s+", ""), "yyyyMMdd")


def factor_map_literal(unit_factors: dict[str, float]) -> Column:
    """MAP<STRING,DOUBLE> literal from config (NB:222-224). Built as a
    literal (constant-folded by Catalyst), NOT a join — scales to any
    data size because it ships with the plan, no shuffle/broadcast."""
    keys = [F.lit(k) for k in unit_factors]
    vals = [F.lit(float(v)) for v in unit_factors.values()]
    return F.map_from_arrays(F.array(*keys), F.array(*vals))


def factor_lookup(unit_col: str | Column, unit_factors: dict[str, float]) -> Column:
    """element_at(map, upper(trim(unit))) → factor or NULL for unknown
    unit (NB:561-564). The NULL is load-bearing: it feeds rule 4."""
    return F.element_at(factor_map_literal(unit_factors), norm(unit_col))


def cant_unidades(cant: Column, factor: Column) -> Column:
    """Unit conversion: round(cant * factor, 2) guarded (NB:619-623)."""
    return (
        F.when(
            factor.isNotNull() & cant.isNotNull() & (cant > 0),
            F.round(cant * factor, 2),
        )
        .otherwise(F.lit(None))
        # try_cast: reference semantics are non-ANSI Spark, where a
        # DECIMAL overflow yields NULL (and the row quarantines) rather
        # than killing the job (round-10 adversarial-relational sweep)
        .try_cast("decimal(21,2)")
    )


def precio_unitario_unidades(mto: Column, cant: Column, factor: Column) -> Column:
    """Unit price: round(mto / (cant * factor), 3) guarded (NB:606-615)."""
    return (
        F.when(
            factor.isNotNull() & cant.isNotNull() & (cant > 0) & mto.isNotNull(),
            F.round(mto / (cant * factor), 3),
        )
        .otherwise(F.lit(None))
        # try_cast: same non-ANSI reference semantics as cant_unidades
        .try_cast("decimal(21,3)")
    )


def indicator_pair(tipo: Column, routine: list[str], bonus: list[str]) -> tuple[Column, Column]:
    """3-valued ind_rutina / ind_bonificacion (NB:624-629): true if the
    normalized type is in `routine`, false if in `bonus`, else NULL."""
    t = F.upper(F.trim(tipo))
    ind_rutina = (
        F.when(t.isin(routine), F.lit(True))
        .when(t.isin(bonus), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )
    ind_bonificacion = (
        F.when(t.isin(bonus), F.lit(True))
        .when(t.isin(routine), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )
    return ind_rutina, ind_bonificacion


def quality_reasons(
    cant: Column,
    material: Column,
    factor: Column,
    mto: Column,
    tipo: Column,
    routine: list[str],
    bonus: list[str],
) -> Column:
    """motivo_obs: pipe-join of fired rules in fixed order (NB:566-577).

    concat_ws skips NULLs, so only fired rules appear; empty → NULL
    (NB:632). Fine print (SURVEY §2A):
      - rules 2 and 5 use `<= 0` with an isNotNull guard → NULL cant
        fires rule 1 only; NULL mto fires NOTHING (valid row with NULL
        unit price);
      - rule 6 fires when the normalized type is in neither list.
    """
    known = [*routine, *bonus]
    t = F.upper(F.trim(tipo))
    rules = [
        F.when(cant.isNull(), F.lit("ERR_CANT_NULL")),  # NB:568
        F.when(cant.isNotNull() & (cant <= 0), F.lit("ERR_CANT_NO_POSITIVA")),  # NB:569-570
        F.when(material.isNull(), F.lit("ERR_SIN_MATERIAL_CONOCIDO")),  # NB:571
        F.when(factor.isNull(), F.lit("ERR_UNIDAD_DESCONOCIDA")),  # NB:572
        F.when(mto.isNotNull() & (mto <= 0), F.lit("ERR_VENTA_NO_POSITIVA")),  # NB:573-574
        F.when(~t.isin(known), F.lit("ERR_TIPO_ENTREGA_NO_CONSIDERADA")),  # NB:575-576
    ]
    joined = F.concat_ws("|", *rules)
    return F.when(F.length(joined) == 0, F.lit(None)).otherwise(joined)


def silver_transform(
    bronze: DataFrame,
    unit_factors: dict[str, float],
    routine: list[str],
    bonus: list[str],
    origen_datos: str,
    load_ts: str | None = None,
) -> DataFrame:
    """bronze → fully-derived silver frame WITH motivo_obs still attached.

    Mirrors NB:588-633: rename to the cod_*/fec_* standard, derive unit
    conversion / unit price / indicators / lineage, evaluate the 6 rules.
    `load_ts` injects a frozen clock for deterministic tests; None uses
    wall-clock like the reference (NB:631).
    """
    df = bronze.select(
        *[F.col(a).alias(b) for a, b in RENAME_MAP.items()]
    )

    factor = factor_lookup("cod_uni_medida", unit_factors)
    mto = F.col("mto_venta")
    cant = F.col("cant_uni_medida")
    tipo = F.col("cod_tipo_entrega")
    ind_rut, ind_bon = indicator_pair(tipo, routine, bonus)
    ts_col = (
        F.lit(load_ts)
        if load_ts is not None
        else F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss")
    )

    df = df.select(
        F.col("cod_pais"),
        F.col("fec_proceso"),
        F.col("cod_transporte"),
        F.col("cod_ruta"),
        F.col("cod_tipo_entrega"),
        F.col("cod_material"),
        precio_unitario_unidades(mto, cant, factor).alias("precio_unitario_unidades"),  # NB:607-615
        # try_cast (not cast): non-ANSI reference semantics — overflow
        # → NULL → quarantine, never a job failure (round-10 sweep)
        F.round(mto, 2).try_cast("decimal(21,2)").alias("mto_venta"),  # NB:616
        F.round(cant, 2).try_cast("decimal(21,2)").alias("cant_uni_medida"),  # NB:617
        F.col("cod_uni_medida"),
        cant_unidades(cant, factor).alias("cant_unidades"),
        ind_rut.alias("ind_rutina"),
        ind_bon.alias("ind_bonificacion"),
        F.lit(origen_datos).alias("origen_datos"),  # NB:630
        ts_col.alias("fec_actualizacion_registro"),  # NB:631
        quality_reasons(cant, F.col("cod_material"), factor, mto, tipo, routine, bonus)
        .alias("motivo_obs"),
    )
    return df


def split_clean_quarantine(derived: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Null-split on motivo_obs (NB:635-637, 668-670).

    clean  = motivo_obs IS NULL, column dropped;
    obs    = the reference's 12-column quarantine shape (NB:655-667):
             the 9 business columns + motivo_obs (position 10) +
             origen_datos + fec_actualizacion_registro, every column
             cast to STRING (type erasure). Derived columns
             (precio_unitario_unidades, cant_unidades, ind_*) are
             explicitly excluded (NB:380-395 DDL).
    Invariant: clean ⊎ obs == input (by row, modulo obs's projection).
    """
    clean = derived.filter(F.col("motivo_obs").isNull()).drop("motivo_obs")
    obs_cols = [
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
    ]
    obs = derived.select(
        *[F.col(c).cast("string").alias(c) for c in obs_cols]
    ).filter(F.col("motivo_obs").isNotNull())
    return clean, obs
