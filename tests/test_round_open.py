"""scripts/round_open.py — the round-opening artifact commit step."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "round_open.py")


def _git(cwd, *args):
    return subprocess.run(
        ["git", *args], cwd=cwd, check=True, capture_output=True, text=True
    ).stdout


def _run(cwd, *args):
    env = dict(os.environ)
    return subprocess.run(
        [sys.executable, SCRIPT, *args],
        cwd=cwd, capture_output=True, text=True, env=env,
    )


def _scratch_repo(tmp_path):
    repo = tmp_path / "r"
    repo.mkdir()
    _git(repo, "init", "-q")
    _git(repo, "config", "user.email", "t@t")
    _git(repo, "config", "user.name", "t")
    (repo / "keep.txt").write_text("x")
    _git(repo, "add", "keep.txt")
    _git(repo, "commit", "-qm", "init")
    return repo


def test_commits_only_artifacts(tmp_path, monkeypatch):
    repo = _scratch_repo(tmp_path)
    (repo / "BENCH_r07.json").write_text("{}")
    (repo / "CORRECTNESS_r07.json").write_text("{}")
    (repo / "VERDICT.md").write_text("v")
    (repo / "unrelated.py").write_text("x = 1")  # must NOT be staged

    # the script resolves REPO from its own file path; import it as a
    # module and point REPO at the scratch repo instead
    import importlib.util

    spec = importlib.util.spec_from_file_location("round_open", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "REPO", str(repo))

    dirty = mod.dirty_artifacts()
    assert dirty == ["BENCH_r07.json", "CORRECTNESS_r07.json", "VERDICT.md"]

    monkeypatch.setattr(sys, "argv", [SCRIPT])
    assert mod.main() == 0
    # artifacts committed, unrelated file untouched
    assert mod.dirty_artifacts() == []
    status = _git(repo, "status", "--porcelain")
    assert "unrelated.py" in status
    log = _git(repo, "log", "-1", "--format=%s")
    assert "round 7" in log

    # idempotent second run
    assert mod.main() == 0


def test_check_mode_flags_dirty(tmp_path, monkeypatch):
    repo = _scratch_repo(tmp_path)
    import importlib.util

    spec = importlib.util.spec_from_file_location("round_open2", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "REPO", str(repo))

    monkeypatch.setattr(sys, "argv", [SCRIPT, "--check"])
    assert mod.main() == 0  # clean
    (repo / "ADVICE.md").write_text("a")
    assert mod.main() == 1  # dirty, check-only: no commit
    assert mod.dirty_artifacts() == ["ADVICE.md"]
