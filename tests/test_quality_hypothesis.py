"""Hypothesis-randomized parity: the quality engine vs an independent
Python reimplementation of the reference semantics (NB:561-633), over
adversarial inputs (whitespace padding, case noise, NULLs, zeros,
negatives, unknown units/types)."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_global_mobility_spark.pipeline.quality import (
    factor_lookup,
    quality_reasons,
)
from pyspark.sql import functions as F

FACTORS = {"CS": 20.0, "ST": 1.0}
ROUTINE = ["ZPRE", "ZVE1"]
BONUS = ["Z04", "Z05"]

pad = st.sampled_from(["", " ", "  ", "\t"])
unit = st.one_of(
    st.none(),
    st.builds(
        lambda p1, u, p2: f"{p1}{u}{p2}",
        pad,
        st.sampled_from(["CS", "cs", "Cs", "ST", "st", "BX", "zz", ""]),
        pad,
    ),
)
tipo = st.builds(
    lambda p1, t, p2: f"{p1}{t}{p2}",
    pad,
    st.sampled_from(["ZPRE", "zpre", "ZVE1", "Z04", "z05", "XXX", ""]),
    pad,
)
money = st.one_of(
    st.none(),
    st.decimals(min_value=-1000, max_value=1000, places=2, allow_nan=False),
)
material = st.one_of(st.none(), st.sampled_from(["MAT1", "MAT2"]))

row_strategy = st.tuples(money, money, material, unit, tipo)


def _spark_trim(s: str) -> str:
    """Spark's trim() strips ONLY the space character (0x20), not tabs
    or other whitespace — the reference (F.trim, NB:563/575) inherits
    this, so the model must too (found by hypothesis: 'ZPRE\t' is an
    UNKNOWN delivery type, not ZPRE)."""
    return s.strip(" ")


def expected_motivo(cant, mto, mat, unidad, t) -> str | None:
    """Independent reimplementation of NB:566-577 + NB:632."""
    norm_u = _spark_trim(unidad or "").upper() if unidad is not None else None
    factor = FACTORS.get(norm_u) if norm_u else None
    if unidad is not None and norm_u in FACTORS:
        factor = FACTORS[norm_u]
    else:
        factor = None
    norm_t = _spark_trim(t).upper()
    fired = []
    if cant is None:
        fired.append("ERR_CANT_NULL")
    if cant is not None and cant <= 0:
        fired.append("ERR_CANT_NO_POSITIVA")
    if mat is None:
        fired.append("ERR_SIN_MATERIAL_CONOCIDO")
    if factor is None:
        fired.append("ERR_UNIDAD_DESCONOCIDA")
    if mto is not None and mto <= 0:
        fired.append("ERR_VENTA_NO_POSITIVA")
    if norm_t not in (*ROUTINE, *BONUS):
        fired.append("ERR_TIPO_ENTREGA_NO_CONSIDERADA")
    return "|".join(fired) if fired else None


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(row_strategy, min_size=1, max_size=40))
def test_quality_engine_matches_reference_semantics(spark, rows):
    df = spark.createDataFrame(
        [
            (
                Decimal(c).quantize(Decimal("0.01")) if c is not None else None,
                Decimal(m).quantize(Decimal("0.01")) if m is not None else None,
                mat,
                u,
                t,
            )
            for c, m, mat, u, t in rows
        ],
        "cant decimal(21,2), mto decimal(21,2), material string, unidad string, tipo string",
    )
    got = [
        r.motivo
        for r in df.select(
            quality_reasons(
                F.col("cant"),
                F.col("material"),
                factor_lookup("unidad", FACTORS),
                F.col("mto"),
                F.col("tipo"),
                ROUTINE,
                BONUS,
            ).alias("motivo")
        ).collect()
    ]
    want = [expected_motivo(*r) for r in rows]
    assert got == want
