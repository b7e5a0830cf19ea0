"""Unit tests of the silver derivations + 6-rule quality engine on
hand-built rows — every edge in SURVEY §2A's 'semantic fine print'."""

from __future__ import annotations

from datetime import date
from decimal import Decimal

import pytest

from etl_global_mobility_spark.pipeline.quality import (
    silver_transform,
    split_clean_quarantine,
)
from etl_global_mobility_spark.schemas import BRONZE_SCHEMA

UNIT_FACTORS = {"CS": 20.0, "ST": 1.0}
ROUTINE = ["ZPRE", "ZVE1"]
BONUS = ["Z04", "Z05"]

FROZEN_TS = "2025-07-01 00:00:00"


def _bronze(spark, rows):
    def row(pais="EC", fecha=date(2025, 3, 1), transporte="TR-1", ruta="R-1",
            tipo="ZPRE", material="MAT-1", precio="100.00", cantidad="10.00",
            unidad="ST"):
        return (
            pais, fecha, transporte, ruta, tipo, material,
            None if precio is None else Decimal(precio),
            None if cantidad is None else Decimal(cantidad),
            unidad,
        )

    return spark.createDataFrame([row(**r) for r in rows], BRONZE_SCHEMA)


def _derived(spark, rows):
    df = _bronze(spark, rows)
    return silver_transform(df, UNIT_FACTORS, ROUTINE, BONUS, "fixture.csv", FROZEN_TS)


def _one(spark, **row):
    return _derived(spark, [row]).collect()[0]


def test_clean_row_no_reason(spark):
    r = _one(spark)
    assert r.motivo_obs is None
    assert r.cant_unidades == Decimal("10.00")
    assert r.precio_unitario_unidades == Decimal("10.000")
    assert r.ind_rutina is True and r.ind_bonificacion is False


def test_cs_factor_conversion(spark):
    r = _one(spark, unidad="CS", cantidad="3.00", precio="120.00")
    assert r.cant_unidades == Decimal("60.00")  # 3 * 20
    assert r.precio_unitario_unidades == Decimal("2.000")  # 120 / 60


def test_unit_case_whitespace_normalized(spark):
    r = _one(spark, unidad=" cs ")
    assert r.motivo_obs is None
    assert r.cant_unidades == Decimal("200.00")


def test_null_cantidad_fires_rule1_only(spark):
    r = _one(spark, cantidad=None)
    assert r.motivo_obs == "ERR_CANT_NULL"
    assert r.cant_unidades is None and r.precio_unitario_unidades is None


@pytest.mark.parametrize("cant", ["0.00", "-5.00"])
def test_nonpositive_cantidad(spark, cant):
    r = _one(spark, cantidad=cant)
    assert r.motivo_obs == "ERR_CANT_NO_POSITIVA"


def test_null_material(spark):
    r = _one(spark, material=None)
    assert r.motivo_obs == "ERR_SIN_MATERIAL_CONOCIDO"


def test_unknown_unit(spark):
    r = _one(spark, unidad="BX")
    assert r.motivo_obs == "ERR_UNIDAD_DESCONOCIDA"
    assert r.cant_unidades is None


@pytest.mark.parametrize("precio", ["0.00", "-10.00"])
def test_nonpositive_venta(spark, precio):
    r = _one(spark, precio=precio)
    assert r.motivo_obs == "ERR_VENTA_NO_POSITIVA"


def test_null_precio_is_not_an_error(spark):
    """NULL mto_venta fires NOTHING; row lands in depurado with NULL
    unit price (NB:573-574, 606-615)."""
    r = _one(spark, precio=None)
    assert r.motivo_obs is None
    assert r.precio_unitario_unidades is None
    assert r.cant_unidades == Decimal("10.00")


def test_unknown_delivery_type(spark):
    r = _one(spark, tipo="Z99")
    assert r.motivo_obs == "ERR_TIPO_ENTREGA_NO_CONSIDERADA"
    assert r.ind_rutina is None and r.ind_bonificacion is None


def test_bonus_type_indicators(spark):
    r = _one(spark, tipo=" z04 ")
    assert r.motivo_obs is None
    assert r.ind_rutina is False and r.ind_bonificacion is True


def test_multi_rule_fixed_order_cant_unit(spark):
    r = _one(spark, cantidad=None, unidad="KG")
    assert r.motivo_obs == "ERR_CANT_NULL|ERR_UNIDAD_DESCONOCIDA"


def test_multi_rule_fixed_order_three(spark):
    r = _one(spark, material=None, tipo="ZXX", precio="-1.00")
    assert (
        r.motivo_obs
        == "ERR_SIN_MATERIAL_CONOCIDO|ERR_VENTA_NO_POSITIVA|ERR_TIPO_ENTREGA_NO_CONSIDERADA"
    )


def test_half_up_rounding(spark):
    # Spark round() is HALF_UP on decimals: 123.005/1 qty 7.005
    r = _one(spark, precio="123.005", cantidad="7.005")
    # bronze already stores decimal(21,2): inputs quantized before silver
    assert r.mto_venta == Decimal("123.01")
    assert r.cant_uni_medida == Decimal("7.01")


def test_split_disjoint_union(spark):
    rows = [
        {},
        {"cantidad": None},
        {"material": None},
        {"precio": None},
        {"unidad": "BX", "cantidad": "0.00"},
    ]
    derived = _derived(spark, rows)
    clean, obs = split_clean_quarantine(derived)
    n_clean, n_obs, n_all = clean.count(), obs.count(), derived.count()
    assert n_clean + n_obs == n_all == 5
    assert n_clean == 2  # clean + null-precio rows
    assert "motivo_obs" not in clean.columns
    # obs is fully type-erased to string
    assert all(f.dataType.simpleString() == "string" for f in obs.schema.fields)
    multi = obs.filter(obs.motivo_obs == "ERR_CANT_NO_POSITIVA|ERR_UNIDAD_DESCONOCIDA")
    assert multi.count() == 1


def test_obs_string_formatting(spark):
    """DATE → 'yyyy-MM-dd', DECIMAL → plain string with scale digits."""
    obs = split_clean_quarantine(_derived(spark, [{"cantidad": "-2.50"}]))[1].collect()[0]
    assert obs.fec_proceso == "2025-03-01"
    assert obs.cant_uni_medida == "-2.50"
    assert obs.mto_venta == "100.00"


def test_lineage_columns(spark):
    r = _one(spark)
    assert r.origen_datos == "fixture.csv"
    assert r.fec_actualizacion_registro == FROZEN_TS


def test_quality_classifier_logit_and_conservative_null(spark):
    """Logit = fixed left-fold of literal weights over the features; a
    NULL/empty text must never keep (clf_keep is never NULL)."""
    from etl_global_mobility_spark.operators.quality_rules import (
        CLASSIFIER_WEIGHTS,
        quality_classifier,
    )

    good = "the quick brown fox jumps over the lazy dog " * 30
    df = spark.createDataFrame(
        [(1, good), (2, ""), (3, None), (4, "000 111 222 333 444 999")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in quality_classifier(df).collect()}
    # hand-fold the expected logit for the good doc
    toks = good.lower().split()
    w = CLASSIFIER_WEIGHTS
    f = [
        min(len(toks), 256) / 256.0,
        sum(len(t) for t in toks) / len(toks),
        len(set(toks)) / len(toks),
        0.0,
        0.0,
        1.0,
    ]
    names = [
        "n_words_capped", "mean_word_len", "distinct_ratio",
        "digit_ratio", "symbol_ratio", "has_stopword",
    ]
    expected = w["bias"]
    for name, fi in zip(names, f):
        expected = expected + w[name] * fi
    assert rows[1].quality_logit == expected
    assert rows[1].clf_keep
    # all-digit text: heavy digit penalty ⇒ drop, logit still defined
    assert not rows[4].clf_keep and rows[4].quality_logit < 0
    # NULL text: NULL logit but a definite drop decision
    assert rows[3].quality_logit is None and rows[3].clf_keep is False
    assert rows[2].clf_keep is False


def test_quality_classifier_weight_override_moves_threshold(spark):
    from etl_global_mobility_spark.operators.quality_rules import (
        quality_classifier,
    )

    df = spark.createDataFrame(
        [(1, "the plain sentence with a few ordinary words in it")],
        "doc_id long, text string",
    )
    base = quality_classifier(df).collect()[0]
    loose = quality_classifier(df, weights={"bias": 100.0}).collect()[0]
    strict = quality_classifier(df, weights={"bias": -100.0}).collect()[0]
    assert loose.clf_keep and not strict.clf_keep
    assert loose.quality_logit > base.quality_logit > strict.quality_logit


def test_quality_classifier_rejects_unknown_weight_keys(spark):
    """A misspelled feature name must raise, not silently drop the
    caller's intended weight change (ADVICE r4)."""
    import pytest

    from etl_global_mobility_spark.operators.quality_rules import (
        quality_classifier,
    )

    df = spark.createDataFrame([(1, "text")], "doc_id long, text string")
    with pytest.raises(ValueError, match="unknown classifier weight"):
        quality_classifier(df, weights={"biass": 1.0})


def test_train_quality_classifier_learns_separable_corpus(spark):
    """Train-inference loop closure: MLlib logistic regression fit on
    the inference feature expressions learns a planted separable
    concept (clean prose vs digit/symbol garbage), the returned weights
    live in CLASSIFIER_WEIGHTS key space, and feeding them back into
    quality_classifier (the pure-Catalyst inference path) classifies a
    held-out set correctly."""
    import random

    from etl_global_mobility_spark.operators.quality_rules import (
        CLASSIFIER_WEIGHTS,
        quality_classifier,
        train_quality_classifier,
    )

    rng = random.Random(7)
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
             "and", "runs", "a", "of", "to", "in"]

    def clean():
        return " ".join(rng.choice(words) for _ in range(rng.randint(25, 60)))

    def garbage():
        return " ".join(
            f"{rng.randrange(10**6)}$%#@{rng.randrange(999)}"
            for _ in range(rng.randint(5, 15))
        )

    rows = [(i, clean(), 1) for i in range(120)] + [
        (1000 + i, garbage(), 0) for i in range(120)
    ]
    train = rows[::2] + [(2000, None, 1), (2001, "x", None)]  # NULLs dropped
    held = rows[1::2]
    tdf = spark.createDataFrame(train, "doc_id long, text string, label int")
    w = train_quality_classifier(tdf, label_col="label")
    assert set(w) == set(CLASSIFIER_WEIGHTS)

    hdf = spark.createDataFrame(held, "doc_id long, text string, label int")
    out = quality_classifier(hdf, weights=w).collect()
    acc = sum(1 for r in out if int(r.clf_keep) == r.label) / len(out)
    assert acc >= 0.95, f"held-out accuracy {acc}"


def test_classifier_artifact_roundtrip_is_bit_exact(spark, tmp_path):
    """train → save → load → infer end-to-end: the reloaded model is
    the trained model to the last bit (parquet doubles are lossless),
    so scoring through the artifact equals scoring through the
    in-memory weights row-for-row; manifest tampering is caught."""
    import json
    import random

    import pytest

    from etl_global_mobility_spark.operators.quality_rules import (
        load_classifier_weights,
        quality_classifier,
        save_classifier_weights,
        train_quality_classifier,
    )

    rng = random.Random(11)
    words = ["the", "quick", "brown", "fox", "and", "a", "of", "to", "in"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(30)), 1)
        for i in range(60)
    ] + [
        (100 + i, " ".join(f"{rng.randrange(10**6)}#@!" for _ in range(8)), 0)
        for i in range(60)
    ]
    tdf = spark.createDataFrame(rows, "doc_id long, text string, label int")
    trained = train_quality_classifier(tdf, label_col="label")

    path = str(tmp_path / "clf_model")
    save_classifier_weights(spark, trained, path)
    loaded = load_classifier_weights(spark, path)
    assert loaded == trained  # dict equality on floats = bit equality

    mem = quality_classifier(tdf, weights=trained).select(
        "doc_id", "quality_logit", "clf_keep"
    )
    art = quality_classifier(tdf, weights=loaded).select(
        "doc_id", "quality_logit", "clf_keep"
    )
    assert sorted(map(tuple, mem.collect())) == sorted(map(tuple, art.collect()))

    # a manifest that disagrees with the parquet must refuse to load
    mpath = f"{path}/_clf_manifest.json"
    with open(mpath) as f:
        manifest = json.load(f)
    manifest["keys"] = manifest["keys"][:-1]
    manifest["n_weights"] -= 1
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    with pytest.raises(ValueError, match="disagrees with its manifest"):
        load_classifier_weights(spark, path)
