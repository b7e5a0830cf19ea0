"""Pins for bench.py's regression-gate mechanics (pure python — no
Spark): baseline-artifact exemptions must match ONLY the baseline
label they were investigated against (self-expiry at promotion), and
the calibration reader must surface the promoted probe figure."""

from __future__ import annotations

import json

import bench


def _with_baseline(monkeypatch, label: str, queries: dict[str, float]):
    monkeypatch.setattr(bench, "_BASELINE_CACHE", (label, queries))


def _with_artifact(monkeypatch, name: str, only_vs: str):
    monkeypatch.setattr(
        bench,
        "KNOWN_BASELINE_ARTIFACTS",
        {name: {"only_vs": only_vs, "reason": "injected test entry"}},
    )


def test_artifact_exemption_masks_only_its_own_label(monkeypatch, capsys):
    """An artifact entry is exempt vs exactly the baseline label it
    was investigated against (the round-12 leaked-cache precedent) —
    a >2x sample must NOT fail the bench there... (entries are
    injected: the live dict is empty at round 13, every prior
    exemption having expired at promotion)"""
    _with_baseline(monkeypatch, "full-latest@aaa0000", {"q_leaky": 1.76})
    _with_artifact(monkeypatch, "q_leaky", "full-latest@aaa0000")
    assert bench._check_regressions({"q_leaky": 5.6}, 0.1) is False
    assert "baseline-artifact exempt" in capsys.readouterr().err


def test_artifact_exemption_expires_at_promotion(monkeypatch, capsys):
    """...but once the baseline is re-promoted (labels rotate to
    full-latest@<hash>), the same entry must be back under the full
    gate — a forgotten exemption cannot mask a future regression."""
    _with_baseline(monkeypatch, "full-latest@abc1234", {"q_leaky": 6.5})
    _with_artifact(monkeypatch, "q_leaky", "full-latest@aaa0000")
    assert bench._check_regressions({"q_leaky": 20.0}, 0.1) is True
    assert "REGRESSION" in capsys.readouterr().err


def test_artifact_dict_hygiene_only_live_matchable_labels():
    """Every KNOWN_BASELINE_ARTIFACTS entry must name the CURRENT
    promoted baseline label — an entry whose only_vs can never match
    again (labels rotate to full-latest@<hash> at each promotion) is
    dead weight that erodes the dict's signal and must be pruned, not
    left to accumulate."""
    label, _ = bench._load_baseline()
    stale = {
        name: art["only_vs"]
        for name, art in bench.KNOWN_BASELINE_ARTIFACTS.items()
        if art["only_vs"] != label
    }
    assert not stale, (
        f"expired baseline-artifact exemptions (current label {label!r}): "
        f"{stale} — prune them; the investigations live in git history"
    )


def test_ratchet_host_factor_clamps(monkeypatch):
    """now/baseline probe ratio, clamped to [1.0, 1.3]: a slow host
    window relaxes the gate proportionally, a fast window never
    TIGHTENS it, and a broken probe (missing or wildly off) falls
    back to raw seconds instead of masking real regressions."""
    monkeypatch.setattr(bench, "_baseline_calibration", lambda: 0.5)
    assert bench._ratchet_host_factor(0.6) == 1.2  # measured slow band
    assert bench._ratchet_host_factor(0.4) == 1.0  # fast host: no tighten
    assert bench._ratchet_host_factor(5.0) == 1.3  # 10x: clamped at cap
    assert bench._ratchet_host_factor(None) == 1.0  # probe missing now
    monkeypatch.setattr(bench, "_baseline_calibration", lambda: None)
    assert bench._ratchet_host_factor(0.6) == 1.0  # baseline predates probe


def test_ratchet_verdict_invariant_under_host_band(monkeypatch, capsys):
    """The round-12 close measured a 1.46x host window with zero code
    changes; a 1.9x-raw query must not trip the 2x gate once the
    measured band is divided out — and the SAME sample must still trip
    when the probe says the host is at baseline speed."""
    _with_baseline(monkeypatch, "full-latest@abc1234", {"q": 2.0})
    sample = {"q": 5.6}  # 2.49x raw incl. noise floor, 1.99x under 1.25
    assert bench._check_regressions(sample, 0.1, host_factor=1.25) is False
    assert bench._check_regressions(sample, 0.1, host_factor=1.0) is True
    err = capsys.readouterr().err
    assert "raw" in err and "host-normalized" in err


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
    # non-numeric JSON types must fall back, not raise (ADVICE r12)
    f.write_text(json.dumps({"queries": {}, "calibration_sec": [1.6]}))
    assert bench._baseline_calibration() is None
    f.write_text(json.dumps({"queries": {}, "calibration_sec": "1.6"}))
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


def test_mid_run_flagging_is_raw_final_gate_is_calibrated(monkeypatch):
    """The flag threshold must be the RAW 2x test — a host-calibrated
    flag with a noisy-high start probe suppresses the clearing retries
    and converts noise into RC=1 (observed round 13: start probe 0.681
    vs end 0.493; two noise-hit ~1s queries skipped their retries, then
    tripped the stricter final gate). Pin: the flag expression in
    main() carries no division by a host factor."""
    import inspect

    src = inspect.getsource(bench.main)
    lines = src.splitlines()
    start = next(i for i, l in enumerate(lines) if "flagged = [" in l)
    end = next(i for i in range(start, len(lines)) if lines[i].strip() == "]")
    flag_block = "\n".join(lines[start : end + 1])
    assert "2.0 * baseline[n] + 0.5" in flag_block
    assert "_ratchet_host_factor" not in flag_block
    assert "times[n] /" not in flag_block  # no host division in the flag
    # and the final verdict IS calibrated
    tail = src.split("_check_regressions(")[1].split(")")[0]
    assert "_ratchet_host_factor" in tail
