#!/usr/bin/env python
"""Round-open housekeeping: commit the driver/judge artifacts.

The driver drops BENCH_r{N}.json / CORRECTNESS_r{N}.json (and the
judge rewrites VERDICT.md / ADVICE.md) at round close, AFTER the
round's last commit — so they arrive untracked or dirty. Four
consecutive verdicts flagged the resulting dirty tree; this script is
the round-opening step that clears it:

    python scripts/round_open.py          # stage + commit
    python scripts/round_open.py --check  # exit 1 if artifacts dirty

Idempotent: commits only when one of the artifact paths is untracked
or modified; exits 0 with "clean" otherwise. Deliberately narrow —
only the known artifact filenames are staged, never the worktree.
"""

from __future__ import annotations

import re
import subprocess
import sys

REPO = __file__.rsplit("/", 2)[0]

ARTIFACT_PATTERNS = (
    r"BENCH_r\d+\.json",
    r"CORRECTNESS_r\d+\.json",
    r"BENCH_FULL_CANDIDATE\.json",
    r"BENCH_FULL_LATEST\.json",
    r"VERDICT\.md",
    r"ADVICE\.md",
    r"COPYCHECK\.json",
    r"LEAKCHECK\.json",
    r"PROGRESS\.jsonl",
)
_RX = re.compile("^(" + "|".join(ARTIFACT_PATTERNS) + ")$")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True,
        capture_output=True, text=True,
    ).stdout


def dirty_artifacts() -> list[str]:
    out = _git("status", "--porcelain")
    dirty = []
    for line in out.splitlines():
        path = line[3:].strip()
        if _RX.match(path):
            dirty.append(path)
    return sorted(dirty)


def main() -> int:
    check_only = "--check" in sys.argv[1:]
    dirty = dirty_artifacts()
    if not dirty:
        print("round_open: clean (no round artifacts to commit)")
        return 0
    if check_only:
        print(f"round_open: dirty artifacts: {' '.join(dirty)}")
        return 1
    rounds = [
        int(m.group(1))
        for p in dirty
        if (m := re.match(r"(?:BENCH|CORRECTNESS)_r(\d+)\.json", p))
    ]
    label = f"round {max(rounds)}" if rounds else "round"
    _git("add", "--", *dirty)
    # --only with explicit paths commits JUST the artifact files: a
    # bare `git commit` would sweep anything the user had staged
    # before this script ran into the artifact commit (ADVICE r11),
    # breaking the "only the known artifact filenames are staged,
    # never the worktree" contract above.
    _git("commit", "--only", "-m",
         f"Track {label} driver/judge artifacts: " + " ".join(dirty),
         "--", *dirty)
    print(f"round_open: committed {len(dirty)} artifact(s): "
          + " ".join(dirty))
    return 0


if __name__ == "__main__":
    sys.exit(main())
