from __future__ import annotations

import pytest

from etl_global_mobility_spark.config import (
    ConfigError,
    load_config,
    load_yaml,
    validate_config,
)
from tests.fixtures import write_fixture_config

BASE = {
    "paths": {"raw_csv": "/tmp/x.csv", "output_root": "/tmp/out"},
    "params": [
        {"country": "EC", "start_date": "2025-01-01", "end_date": "2025-06-30", "proccess": "NO"}
    ],
    "delivery_types": {"routine": ["ZPRE", "ZVE1"], "bonus": ["Z04", "Z05"]},
    "unit_factors": {"CS": 20, "ST": 1},
}


def _clone(**over):
    import copy

    cfg = copy.deepcopy(BASE)
    cfg.update(over)
    return cfg


def test_valid_config_roundtrip():
    cfg = validate_config(BASE)
    assert cfg.routine == ["ZPRE", "ZVE1"]
    assert cfg.unit_factors == {"CS": 20.0, "ST": 1.0}
    assert cfg.params[0].proccess == "NO"


@pytest.mark.parametrize("section", ["paths", "params", "delivery_types", "unit_factors"])
def test_missing_section(section):
    cfg = _clone()
    del cfg[section]
    with pytest.raises(ConfigError, match=section):
        validate_config(cfg)


def test_bad_proccess_value():
    cfg = _clone()
    cfg["params"][0]["proccess"] = "MAYBE"
    with pytest.raises(ConfigError, match="proccess"):
        validate_config(cfg)


def test_missing_param_field():
    cfg = _clone()
    del cfg["params"][0]["end_date"]
    with pytest.raises(ConfigError, match="end_date"):
        validate_config(cfg)


def test_routine_bonus_overlap():
    cfg = _clone()
    cfg["delivery_types"] = {"routine": ["ZPRE", "z04 "], "bonus": ["Z04"]}
    with pytest.raises(ConfigError, match="overlap"):
        validate_config(cfg)


def test_delivery_type_normalization():
    cfg = _clone()
    cfg["delivery_types"] = {"routine": [" zpre ", "zve1"], "bonus": ["z04"]}
    assert validate_config(cfg).routine == ["ZPRE", "ZVE1"]


@pytest.mark.parametrize("bad", [{}, {"CS": 0}, {"CS": -1}, {"CS": "twenty"}, {"": 20}, {"CS": True}])
def test_bad_unit_factors(bad):
    cfg = _clone(unit_factors=bad)
    with pytest.raises(ConfigError):
        validate_config(cfg)


def test_yaml_loader_parses_reference_shape(tmp_path):
    p = tmp_path / "config.yaml"
    write_fixture_config(str(p), "/tmp/raw.csv", "/tmp/out")
    cfg = load_config(str(p))
    assert [b.country for b in cfg.params] == ["EC", "PE", "CO"]
    assert cfg.params[2].proccess == "YES"
    assert cfg.unit_factors == {"CS": 20.0, "ST": 1.0}
    assert cfg.raw_csv == "/tmp/raw.csv"


def test_mini_yaml_nested(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "a:\n  b: 1\n  c: 'x'\nlst:\n  - k: 1\n    m: 'y'\n  - k: 2\n    m: 'z'\nflow: [A, B]\n"
    )
    d = load_yaml(str(p))
    assert d == {"a": {"b": 1, "c": "x"}, "lst": [{"k": 1, "m": "y"}, {"k": 2, "m": "z"}], "flow": ["A", "B"]}


def test_mini_yaml_parses_verbatim_reference_shape(tmp_path):
    """The reference config puts `- country:` items at the SAME indent as
    the `params:` key (config/config.yaml:4-8) — the fallback parser must
    accept that shape."""
    from etl_global_mobility_spark.config import _mini_yaml_load

    text = (
        "paths:\n"
        "  raw_csv: /data/raw/x.csv\n"
        "  output_root: /data/processed\n"
        "params:\n"
        "- country: EC\n"
        "  start_date: '2025-01-01'\n"
        "  end_date: '2025-06-30'\n"
        "  proccess: 'YES'\n"
        "- country: PE\n"
        "  start_date: '2025-01-01'\n"
        "  end_date: '2025-06-30'\n"
        "  proccess: 'NO'\n"
        "delivery_types:\n"
        "  routine:\n"
        "  - ZPRE\n"
        "  - ZVE1\n"
        "  bonus:\n"
        "  - Z04\n"
        "  - Z05\n"
        "unit_factors:\n"
        "  CS: 20\n"
        "  ST: 1\n"
    )
    cfg = _mini_yaml_load(text)
    assert [p["country"] for p in cfg["params"]] == ["EC", "PE"]
    assert cfg["params"][1]["proccess"] == "NO"
    assert cfg["delivery_types"] == {"routine": ["ZPRE", "ZVE1"], "bonus": ["Z04", "Z05"]}
    assert cfg["unit_factors"] == {"CS": 20, "ST": 1}
