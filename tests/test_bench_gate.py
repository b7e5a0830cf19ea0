"""Pins for bench.py's regression-gate mechanics (pure python — no
Spark): baseline-artifact exemptions must match ONLY the baseline
label they were investigated against (self-expiry at promotion), and
the calibration reader must surface the promoted probe figure."""

from __future__ import annotations

import json

import bench


def _with_baseline(monkeypatch, label: str, queries: dict[str, float]):
    monkeypatch.setattr(bench, "_BASELINE_CACHE", (label, queries))


def test_artifact_exemption_masks_only_its_own_label(monkeypatch, capsys):
    """llm_dedup_components is exempt vs the 'full-latest' baseline it
    was investigated against (round-12 leaked-cache A/B) — a >2x
    sample must NOT fail the bench there..."""
    _with_baseline(monkeypatch, "full-latest", {"llm_dedup_components": 1.76})
    assert bench._check_regressions({"llm_dedup_components": 5.6}, 0.1) is False
    assert "baseline-artifact exempt" in capsys.readouterr().err


def test_artifact_exemption_expires_at_promotion(monkeypatch, capsys):
    """...but once the baseline is re-promoted (labels rotate to
    full-latest@<hash>), the same entry must be back under the full
    gate — a forgotten exemption cannot mask a future regression."""
    _with_baseline(
        monkeypatch, "full-latest@abc1234", {"llm_dedup_components": 6.5}
    )
    assert (
        bench._check_regressions({"llm_dedup_components": 20.0}, 0.1) is True
    )
    assert "REGRESSION" in capsys.readouterr().err


def test_non_bench_sf_never_gates(monkeypatch):
    _with_baseline(monkeypatch, "full-latest", {"q": 1.0})
    assert bench._check_regressions({"q": 100.0}, 0.01) is False


def test_candidate_label_carries_head_hash():
    label = bench._git_head()
    assert label and label != "unknown" and len(label) >= 7


def test_baseline_calibration_reader(tmp_path, monkeypatch):
    """The reader returns the promoted probe figure, or None for
    baselines predating the probe (never raises)."""
    f = tmp_path / "BENCH_FULL_LATEST.json"
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda _p, _d=str(tmp_path): _d
    )
    assert bench._baseline_calibration() is None  # file missing
    f.write_text(json.dumps({"queries": {}, "calibration_sec": 1.62}))
    assert bench._baseline_calibration() == 1.62
    f.write_text(json.dumps({"queries": {}}))  # predates the probe
    assert bench._baseline_calibration() is None


def test_plan_perf_diff_host_factor(tmp_path, monkeypatch):
    """now/prev calibration ratio normalizes candidate seconds; a
    missing probe on either side or an out-of-band factor falls back
    to 1.0 (raw seconds) instead of normalizing by garbage."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "plan_perf_diff_mod",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "plan_perf_diff.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    prev = tmp_path / "prev.json"
    now = tmp_path / "now.json"
    monkeypatch.setattr(mod, "BENCH_PREV", str(prev))
    monkeypatch.setattr(mod, "BENCH_NOW", str(now))

    assert mod._host_factor() == 1.0  # neither file exists
    prev.write_text(json.dumps({"queries": {}, "calibration_sec": 0.5}))
    assert mod._host_factor() == 1.0  # probe missing on the now side
    now.write_text(json.dumps({"queries": {}, "calibration_sec": 0.6}))
    assert abs(mod._host_factor() - 1.2) < 1e-9  # slower host window
    now.write_text(json.dumps({"queries": {}, "calibration_sec": 5.0}))
    assert mod._host_factor() == 1.0  # 10x outside the sanity band
